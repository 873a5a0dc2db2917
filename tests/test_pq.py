"""Product quantization (similarity.pq_*): numpy parity of encoding and
ADC distances, training-loop invariants, and the empty-cell policy.

The graded queries (emb_pq_encode / emb_pq_adc_topk / emb_pq_train_update)
pin DuckDB parity; these tests pin what the oracle can't see -- that the
distributed argmin/sum arithmetic equals an independent numpy replication
bit-for-bit, that training monotonically improves quantization error, and
that retraining is deterministic."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators import similarity as S
from aws_glue_cdc_metrics_job_spark.sources import read_table

M, K, DSUB = 4, 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, "/root/testdata/sf0.001", "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return ids, X


@pytest.fixture(scope="module")
def codebook(spark):
    return S.pq_codebook_df(spark, S.pq_constants(M, K, DSUB))


def _np_sub_dists(X, consts):
    """Rounded per-(row, sub, code) squared L2, sequential add order --
    the numpy image of similarity._pq_sub_dist."""
    n = len(X)
    out = np.zeros((n, M, K))
    for s in range(M):
        for c in range(K):
            acc = None
            for d in range(DSUB):
                t = (X[:, s * DSUB + d] - consts[s][c][d]) ** 2
                acc = t if acc is None else acc + t
            out[:, s, c] = S._rhu_np(acc)
    return out


def _np_encode(X, consts):
    d = _np_sub_dists(X, consts)
    return np.argmin(d, axis=2)  # np.argmin takes the FIRST min -> lowest code


def test_encode_matches_numpy(emb, emb_np, codebook):
    ids, X = emb_np
    codes = _np_encode(X, S.pq_constants(M, K, DSUB))
    got = {
        (r["vec_id"], r["SUB"]): r["CODE"]
        for r in S.pq_encode(emb, codebook).collect()
    }
    assert len(got) == len(ids) * M
    for i, vid in enumerate(ids):
        for s in range(M):
            assert got[(vid, s)] == codes[i, s]


def test_adc_matches_numpy(emb, emb_np, codebook):
    ids, X = emb_np
    consts = S.pq_constants(M, K, DSUB)
    codes = _np_encode(X, consts)
    qmask = ids < 3
    luts = _np_sub_dists(X[qmask], consts)  # (q, sub, code) partials
    got = S.pq_adc_topk(emb, emb.filter(F.col("vec_id") < 3), codebook, k=4).collect()
    assert len(got) == 3 * 4
    # expected ADC: decimal-exact sum of 6dp partials = plain sum (partials
    # have <= 6 fractional digits, exactly representable at this magnitude)
    for r in got:
        qi = int(np.where(ids == r["QUERY_ID"])[0][0])
        ci = int(np.where(ids == r["vec_id"])[0][0])
        exp = round(sum(float(luts[qi if qmask[qi] else 0][s][codes[ci, s]]) for s in range(M)), 6)
        assert r["ADC_DIST"] == pytest.approx(exp, abs=1e-9)
    # ranking: each query's worst returned dist <= best excluded dist
    full = {
        (ids[qi], ids[ci]): round(sum(luts[qi][s][codes[ci, s]] for s in range(M)), 6)
        for qi in range(3)
        for ci in range(len(ids))
    }
    by_q = {}
    for r in got:
        by_q.setdefault(r["QUERY_ID"], []).append((r["ADC_DIST"], r["vec_id"]))
    for q, rows in by_q.items():
        worst = max(d for d, _ in rows)
        kept = {v for _, v in rows}
        best_excl = min(d for (qq, v), d in full.items() if qq == q and v not in kept)
        assert worst <= best_excl


def test_train_reduces_quantization_error(emb, emb_np):
    ids, X = emb_np

    def mse(cb_df):
        rows = cb_df.collect()
        consts = [[[0.0] * DSUB for _ in range(K)] for _ in range(M)]
        for r in rows:
            consts[r["SUB"]][r["CODE"]] = [r[f"C{d}"] for d in range(DSUB)]
        codes = _np_encode(X, consts)
        err = 0.0
        for s in range(M):
            cent = np.array(consts[s])[codes[:, s]]
            err += ((X[:, s * DSUB : (s + 1) * DSUB] - cent) ** 2).sum()
        return err / X.size

    e0 = mse(S.pq_train(emb, m=M, ksub=K, iters=1))
    e2 = mse(S.pq_train(emb, m=M, ksub=K, iters=3))
    assert e2 <= e0 + 1e-12
    # and it beats the untrained deterministic codebook by a wide margin
    from aws_glue_cdc_metrics_job_spark.session import get_spark

    spark = emb.sparkSession
    e_raw = mse(S.pq_codebook_df(spark, S.pq_constants(M, K, DSUB)))
    assert e2 < e_raw


def test_train_deterministic(emb):
    a = sorted(map(tuple, S.pq_train(emb, m=M, ksub=4, iters=2).collect()))
    b = sorted(map(tuple, S.pq_train(emb, m=M, ksub=4, iters=2).collect()))
    assert a == b


def test_train_keeps_empty_codes(spark):
    # 4 identical vectors, ksub=3: at most one code ever has members, but
    # the trained codebook must still carry all m*ksub entries
    rows = [(i, [float(d % 7) for d in range(32)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = S.pq_train(df, m=2, ksub=3, iters=2)
    assert cb.count() == 2 * 3


def test_encode_shape_and_range(emb, codebook):
    enc = S.pq_encode(emb, codebook)
    n = emb.count()
    stats = enc.agg(
        F.count("*").alias("n"),
        F.min("CODE").alias("lo"),
        F.max("CODE").alias("hi"),
        F.countDistinct("SUB").alias("subs"),
    ).first()
    assert stats["n"] == n * M
    assert 0 <= stats["lo"] and stats["hi"] < K
    assert stats["subs"] == M


def test_train_rejects_bad_dims(emb):
    with pytest.raises(ValueError):
        S.pq_train(emb, m=5, ksub=4)  # 64 % 5 != 0
    with pytest.raises(ValueError):
        S.pq_train(emb, m=0, ksub=4)


def test_ivf_pq_equals_adc_on_probed_subset(spark, emb, codebook):
    from pyspark.sql import functions as F

    cents = emb.filter(F.col("vec_id") % 31 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 3)
    got = sorted(
        map(tuple, S.ivf_pq_topk(emb, queries, cents, codebook, k=4, nprobe=2).collect())
    )
    # replicate: for each query, ADC top-k over ONLY the members of its
    # probed cells -- IVF-PQ must match exactly (PQ never drops a
    # candidate inside a probed cell)
    cells = {r["vec_id"]: r["CELL"] for r in S.assign_cells(emb, cents).select("vec_id", "CELL").collect()}
    probed = {}
    for r in S.probe_cells(queries, cents, nprobe=2).select("vec_id", "CELL").collect():
        probed.setdefault(r["vec_id"], set()).add(r["CELL"])
    exp = []
    for q, cset in probed.items():
        members = [v for v, c in cells.items() if c in cset]
        sub = emb.filter(F.col("vec_id").isin(members))
        one_q = emb.filter(F.col("vec_id") == q)
        for r in S.pq_adc_topk(sub, one_q, codebook, k=4).collect():
            exp.append(tuple(r))
    assert got == sorted(exp)


def test_ivf_pq_row_bounds(spark, emb, codebook):
    from pyspark.sql import functions as F

    cents = emb.filter(F.col("vec_id") % 31 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 8)
    rows = S.ivf_pq_topk(emb, queries, cents, codebook, k=5, nprobe=1).collect()
    per_q = {}
    for r in rows:
        per_q[r["QUERY_ID"]] = per_q.get(r["QUERY_ID"], 0) + 1
    assert set(per_q) == set(range(8)) and all(v <= 5 for v in per_q.values())
