"""Similarity search over embedding columns (array<float>).

Two tiers, per the standard ANN playbook:
- brute-force cosine top-k: exact baseline, O(queries x corpus); fine when
  the query set is small enough to broadcast;
- IVF-style cell search: assign every vector to its nearest centroid once
  (one narrow shuffle), then search only within the query's cell --
  the 100TB path, since each lookup touches 1/K of the corpus and cells can
  be written as parquet partitions for pruning.

All math is built-in higher-order functions (zip_with/aggregate) on
double-cast arrays -- JVM-side, no Python in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import rhu
from .relational import top_k_per_group


def dot(a: str, b: str, dim: int | None = None) -> F.Column:
    """Sequential left-to-right dot product (same accumulation order as
    DuckDB's list_dot_product, so oracle values match bit-for-bit).

    With ``dim`` known, the sum is unrolled into a flat codegen'd
    expression ``a[0]*b[0] + a[1]*b[1] + ...`` — bit-identical to the
    HOF form (0.0 + p0 == p0 exactly, then the same left-to-right adds)
    but it stays inside whole-stage codegen, where zip_with/aggregate
    run on Catalyst's interpreted path (~4x slower per pair measured at
    dim=64). Pass dim whenever the embedding width is fixed."""
    if dim is not None:
        ca, cb = F.col(a), F.col(b)
        s = ca[0] * cb[0]
        for i in range(1, dim):
            s = s + ca[i] * cb[i]
        return s
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: str, dim: int | None = None) -> F.Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: str, b: str, dim: int | None = None) -> F.Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def as_double_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query. Excludes self-matches. Deterministic: ranking
    key is (rounded cosine desc, neighbor id asc)."""
    q = as_double_vec(queries, vec_col).select(
        F.col(id_col).alias("QUERY_ID"), F.col(vec_col).alias("__qv")
    )
    c = as_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("NEIGHBOR_ID"), F.col(vec_col).alias("__cv")
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("QUERY_ID") != F.col("NEIGHBOR_ID"))
        .withColumn("COSINE", rhu(cosine("__qv", "__cv", dim), 6))
    )
    return top_k_per_group(
        pairs.select("QUERY_ID", "NEIGHBOR_ID", "COSINE"),
        ["QUERY_ID"],
        [F.col("COSINE").desc(), F.col("NEIGHBOR_ID")],
        k=k,
        rank_col="RANK",
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    dim: int | None = None,
) -> DataFrame:
    """IVF assignment: nearest centroid per vector by cosine (broadcast
    centroids, rank-1 per vector). The output's CELL column is the partition
    key for the ANN index layout."""
    c = as_double_vec(corpus, vec_col).withColumnRenamed(vec_col, "__v")
    cents = as_double_vec(centroids, vec_col).select(
        F.col(centroid_id_col).alias("CELL"), F.col(vec_col).alias("__cent")
    )
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "__sim", rhu(cosine("__v", "__cent", dim), 6)
    )
    best = top_k_per_group(scored, [id_col], [F.col("__sim").desc(), F.col("CELL")], k=1)
    return best.withColumnRenamed("__v", vec_col).drop("__cent", "__sim")


def probe_cells(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    dim: int | None = None,
) -> DataFrame:
    """The ``nprobe`` nearest cells per query vector (one row per
    (query, probed cell)). nprobe=1 reduces to :func:`assign_cells` on the
    query side; larger values are the standard IVF recall lever -- each
    query searches its nprobe most promising cells, multiplying the scanned
    corpus fraction by nprobe/K while recovering neighbors that sit just
    across a cell boundary."""
    q = as_double_vec(queries, vec_col).withColumnRenamed(vec_col, "__v")
    cents = as_double_vec(centroids, vec_col).select(
        F.col(centroid_id_col).alias("CELL"), F.col(vec_col).alias("__cent")
    )
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "__sim", rhu(cosine("__v", "__cent", dim), 6)
    )
    best = top_k_per_group(scored, [id_col], [F.col("__sim").desc(), F.col("CELL")], k=nprobe)
    return best.withColumnRenamed("__v", vec_col).drop("__cent", "__sim")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: the corpus is assigned to cells once, each query
    probes its ``nprobe`` nearest cells, and the exact ranking runs only
    within probed cells (equi-join on CELL instead of a cross join). A
    corpus vector lives in exactly one cell, so (query, neighbor) pairs are
    unique across probes -- no dedup needed. Recall < 1 only for true
    neighbors outside all probed cells; raise ``nprobe`` (cost x nprobe/K)
    or the centroid count to trade cost for recall."""
    corpus_cells = assign_cells(corpus, centroids, id_col, vec_col, dim=dim)
    query_cells = probe_cells(queries, centroids, nprobe, id_col, vec_col, dim=dim)
    c = corpus_cells.select("CELL", F.col(id_col).alias("NEIGHBOR_ID"), F.col(vec_col).alias("__cv"))
    q = query_cells.select("CELL", F.col(id_col).alias("QUERY_ID"), F.col(vec_col).alias("__qv"))
    pairs = (
        c.join(q, "CELL")
        .filter(F.col("QUERY_ID") != F.col("NEIGHBOR_ID"))
        .withColumn("COSINE", rhu(cosine("__qv", "__cv", dim), 6))
    )
    return top_k_per_group(
        pairs.select("QUERY_ID", "NEIGHBOR_ID", "COSINE"),
        ["QUERY_ID"],
        [F.col("COSINE").desc(), F.col("NEIGHBOR_ID")],
        k=k,
        rank_col="RANK",
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: IVF-cell blocking (assign every
    vector to its nearest centroid, one broadcast pass), then the quadratic
    comparison runs only within each cell -- the same blocking discipline as
    the text dedup operators, applied to vectors. Pairs straddling a cell
    boundary are missed (raise centroid count / multi-probe to trade off);
    within-cell results are exact."""
    cells = assign_cells(corpus, centroids, id_col, vec_col, dim=dim)
    a = cells.select("CELL", F.col(id_col).alias("ID_A"), F.col(vec_col).alias("__va"))
    b = cells.select("CELL", F.col(id_col).alias("ID_B"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, "CELL")
        .filter(F.col("ID_A") < F.col("ID_B"))
        .withColumn("COSINE", rhu(cosine("__va", "__vb", dim), 6))
        .filter(F.col("COSINE") >= threshold)
        .select("ID_A", "ID_B", "COSINE")
    )


def brute_force_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy fast path for exact cosine top-k: the query set is
    collected once (it must be broadcast-sized by contract), and each
    corpus partition streams through mapInPandas where numpy does a
    (batch x dim) @ (dim x nq) matmul -- SIMD instead of one interpreted
    expression tree per element. Per-partition local top-k keeps the
    shuffle at k rows per query per partition; a final window rank merges.

    ~10-50x faster than the zip_with/aggregate expression form on wide
    vectors; float summation order differs from the sequential form, so
    this variant is benchmarked, not oracle-hashed (values agree to ~1e-12;
    ranks can differ only at exact ties)."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows])
    qm = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    spark = corpus.sparkSession
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_qm = spark.sparkContext.broadcast(qm)

    def score(batches):
        qids, qmat = b_ids.value, b_qm.value
        for pdf in batches:
            cm = np.array(list(pdf[vec_col]), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qmat.T  # (batch, nq)
            cids = pdf[id_col].to_numpy()
            top = min(k + 1, len(cids))  # +1 to survive self-match removal
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]
            out = {
                "QUERY_ID": np.repeat(qids, top),
                "NEIGHBOR_ID": cids[idx].T.ravel(),
                "COSINE": np.take_along_axis(sims, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, "QUERY_ID long, NEIGHBOR_ID long, COSINE double"
    )
    pairs = partial.filter(F.col("QUERY_ID") != F.col("NEIGHBOR_ID"))
    return top_k_per_group(
        pairs,
        ["QUERY_ID"],
        [F.col("COSINE").desc(), F.col("NEIGHBOR_ID")],
        k=k,
        rank_col="RANK",
    )
