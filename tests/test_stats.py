"""Deterministic Poisson-bootstrap confidence intervals."""

import hashlib
import math

from aws_glue_cdc_metrics_job_spark.operators.stats import (
    bootstrap_mean_ci,
    poisson1_hex_thresholds,
)


def _py_weight(key: int, rep: int, seed: str) -> int:
    u = hashlib.md5(f"{key}|{rep}|{seed}".encode()).hexdigest()[:8]
    for k, thr in enumerate(poisson1_hex_thresholds()):
        if u < thr:
            return k
    return 7


def test_poisson_thresholds_are_the_poisson1_cdf():
    thr = poisson1_hex_thresholds()
    assert len(thr) == 7
    acc = 0.0
    for k, t in enumerate(thr):
        acc += math.exp(-1.0) / math.factorial(k)
        assert int(t, 16) == min(int(acc * 16**8), 16**8 - 1)
    # draws are Poisson-ish: P(0) ~ 1/e
    assert abs(int(thr[0], 16) / 16**8 - math.exp(-1)) < 1e-9


def test_bootstrap_ci_matches_python_replay(spark):
    vals = [float(v) for v in range(1, 41)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, value double"
    )
    b, seed = 50, "t"
    got = bootstrap_mean_ci(df, "value", ["k"], b=b, seed=seed).collect()[0]
    # python replay of the exact same draws -> same replicate means
    means = []
    for rep in range(b):
        ws = [_py_weight(i, rep, seed) for i in range(len(vals))]
        if sum(ws) > 0:
            m = sum(w * v for w, v in zip(ws, vals)) / sum(ws)
            means.append(math.floor(m * 1e6 + 0.5) / 1e6)
    means.sort()

    def q(p):
        idx = p * (len(means) - 1)
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        v = means[lo] + (means[hi] - means[lo]) * (idx - lo)
        return math.floor(v * 1e6 + 0.5) / 1e6

    assert got["N_ROWS"] == 40 and got["MEAN"] == 20.5
    assert got["CI_LO"] == q(0.025) and got["CI_HI"] == q(0.975)
    assert got["CI_LO"] < got["MEAN"] < got["CI_HI"]
    # partitioning-independent: hostile repartition gives the identical row
    again = bootstrap_mean_ci(df.repartition(13), "value", ["k"], b=b, seed=seed).collect()[0]
    assert again == got


def test_bootstrap_ci_grouped(spark):
    rows = [(i, "a", 10.0) for i in range(50)] + [(i, "b", 5.0 + i % 3) for i in range(50, 120)]
    df = spark.createDataFrame(rows, "k long, g string, value double")
    out = {r["g"]: r for r in bootstrap_mean_ci(df, "value", ["k"], ["g"], b=60).collect()}
    # constant group: zero-width interval at the constant
    assert out["a"]["CI_LO"] == out["a"]["CI_HI"] == out["a"]["MEAN"] == 10.0
    assert out["b"]["CI_LO"] <= out["b"]["MEAN"] <= out["b"]["CI_HI"]
    assert out["b"]["CI_LO"] < out["b"]["CI_HI"]
