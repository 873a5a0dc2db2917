"""k-means IVF centroid training (similarity.kmeans_update/kmeans_train)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.similarity import kmeans_train, kmeans_update


@pytest.fixture(scope="module")
def two_clusters(spark):
    # two tight clusters around orthogonal axes
    rows = []
    for i in range(20):
        rows.append((i, [1.0 + (i % 5) * 0.01, 0.0, 0.1]))
    for i in range(20, 40):
        rows.append((i, [0.0, 1.0 + (i % 5) * 0.01, 0.1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_update_means_hand_computed(spark):
    rows = [
        (0, [1.0, 0.0]),  # centroid seed (cell 0)
        (1, [0.0, 1.0]),  # centroid seed (cell 1)
        (2, [2.0, 0.0]),  # -> cell 0
        (3, [0.0, 3.0]),  # -> cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    got = {
        (r["CELL"], r["DIM"]): (r["N_MEMBERS"], r["CENTROID_VAL"])
        for r in kmeans_update(df, cents).collect()
    }
    assert got[(0, 0)] == (2, 1.5) and got[(0, 1)] == (2, 0.0)
    assert got[(1, 0)] == (2, 0.0) and got[(1, 1)] == (2, 2.0)


def test_update_deterministic_under_repartition(spark, two_clusters):
    cents = two_clusters.filter(F.col("vec_id").isin(0, 20)).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    a = set(map(tuple, kmeans_update(two_clusters, cents).collect()))
    b = set(map(tuple, kmeans_update(two_clusters.repartition(9), cents).collect()))
    assert a == b


def test_train_separates_clusters(spark, two_clusters):
    cents = kmeans_train(two_clusters, k=2, iters=5).collect()
    assert len(cents) == 2
    vecs = sorted([r["embedding"] for r in cents], key=lambda v: v[0])
    # one centroid near axis 1, the other near axis 0
    assert vecs[0][0] < 0.5 and vecs[0][1] > 0.5
    assert vecs[1][0] > 0.5 and vecs[1][1] < 0.5


def test_train_deterministic(spark, two_clusters):
    a = {r["centroid_id"]: r["embedding"] for r in kmeans_train(two_clusters, k=2, iters=3).collect()}
    b = {
        r["centroid_id"]: r["embedding"]
        for r in kmeans_train(two_clusters.repartition(5), k=2, iters=3).collect()
    }
    assert a == b


def test_train_rejects_bad_params(spark, two_clusters):
    with pytest.raises(ValueError):
        kmeans_train(two_clusters, k=0)


def test_trained_centroids_dont_hurt_ivf_recall(spark):
    """On the driver embeddings, k-means-trained centroids should match or
    beat arbitrary (modulo-seeded) centroids for IVF recall vs exact
    top-k. Runs at sf0.01 -- the sf0.001 fixture has too few vectors per
    cell for training to matter. (Measured: 0.40 -> 0.525 at nprobe=4;
    the slack guards against a future testdata reroll, not
    nondeterminism -- every quantity here is deterministic.)"""
    from pyspark.sql import functions as F

    from aws_glue_cdc_metrics_job_spark.operators import similarity
    from aws_glue_cdc_metrics_job_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["QUERY_ID"], r["NEIGHBOR_ID"])
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(centroids):
        got = similarity.ivf_topk(emb, queries, centroids, k=5, nprobe=4)
        s = {(r["QUERY_ID"], r["NEIGHBOR_ID"]) for r in got.collect()}
        return len(s & exact) / len(exact)

    mod_cents = emb.filter(F.col("vec_id") % 31 == 1).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    trained = similarity.kmeans_train(emb, k=mod_cents.count(), iters=3)
    r_mod, r_trained = recall(mod_cents), recall(trained)
    assert r_trained >= r_mod - 0.05
    assert r_trained > 0
