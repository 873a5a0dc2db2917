from .quantile import exact_quantile_cuts, quantile_bucket

__all__ = ["exact_quantile_cuts", "quantile_bucket"]
