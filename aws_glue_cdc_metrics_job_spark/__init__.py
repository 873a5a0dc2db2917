"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CDC-metrics pipeline
(jason4king21/AWS-Glue-CDC-Metrics-job), re-expressed Spark-first.

Layout:
  session     SparkSession factory (UTC, AQE, Arrow) with injectable clock
  state       high-watermark control store (reference: scripts/cdc_metrics_job.py:31-39)
  sources/    parquet + jdbc readers/writers, medallion zone layout
  operators/  relational helpers, CDC diff, dedup, similarity, text, multimodal
  functions/  scalar/quantile helpers shared by operators
  plans/      testdata adapters, gold-mart library, graded query catalog, pipeline
  streaming/  Structured Streaming variants of the incremental operators
"""

__version__ = "0.1.0"
