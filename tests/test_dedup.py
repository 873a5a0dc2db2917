"""Dedup ladder: exact, n-gram Jaccard, MinHash-LSH recall, SimHash."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank every morning"
    near = base.replace("morning", "evening")          # 1-word edit -> high jaccard
    far = "completely different text about spark query engines and columnar storage formats"
    rows = [
        (1, base),
        (2, base),                     # exact duplicate of 1
        (3, "  The  QUICK brown fox jumps over the lazy dog near the river bank every morning  "),  # normalizes to 1
        (4, near),
        (5, far),
        (6, "tiny"),                   # shorter than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fingerprint_normalization(corpus):
    fp = {r["doc_id"]: r["FINGERPRINT"] for r in dedup.fingerprint(corpus).collect()}
    assert fp[1] == fp[2] == fp[3]
    assert fp[1] != fp[4]


def test_exact_dedup_groups(corpus):
    groups = {r["FINGERPRINT"]: (r["KEEP_ID"], r["N_DOCS"]) for r in dedup.exact_dedup_groups(corpus).collect()}
    assert (1, 3) in groups.values()  # min-id survivor of the triple
    assert dedup.exact_dedup(corpus).count() == 4


def test_ngram_jaccard_pairs_exact_values(corpus):
    pairs = {(r["ID_A"], r["ID_B"]): r["JACCARD"] for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.05, allow_cross_join=True).collect()}
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 3)] == 1.0 and pairs[(2, 3)] == 1.0
    assert 0.5 < pairs[(1, 4)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_lsh_finds_near_dups(corpus):
    got = {(r["ID_A"], r["ID_B"]) for r in dedup.minhash_lsh_pairs(corpus, threshold=0.8).collect()}
    assert {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)} == got


def test_minhash_recall_vs_brute_force(spark):
    """Every pair with exact word-3-gram Jaccard >= 0.9 must be recalled by
    the banded LSH (b=32, r=4 -> miss probability < 1e-4 per pair)."""
    words = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(30):
        w = list(words)
        w[d % 40] = f"edit{d}"          # one-word perturbations of a shared doc
        docs.append((d, " ".join(w)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r["ID_A"], r["ID_B"])
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.9, allow_cross_join=True).collect()
    }
    lsh = {(r["ID_A"], r["ID_B"]) for r in dedup.minhash_lsh_pairs(df, threshold=0.9).collect()}
    assert exact, "fixture should contain true near-dup pairs"
    assert exact <= lsh  # no false negatives at the target threshold


def test_minhash_deterministic(corpus):
    a = sorted(dedup.minhash_lsh_pairs(corpus, threshold=0.8).collect())
    b = sorted(dedup.minhash_lsh_pairs(corpus, threshold=0.8).collect())
    assert a == b


def test_simhash_near_dup_small_hamming(corpus):
    sh = {r["doc_id"]: r["SIMHASH"] for r in dedup.simhash(corpus).collect()}
    assert sh[1] == sh[2] == sh[3]
    df = corpus.sparkSession.createDataFrame([(sh[1], sh[4]), (sh[1], sh[5])], "a long, b long")
    d = [r["d"] for r in df.select(dedup.hamming_distance("a", "b").alias("d")).collect()]
    assert d[0] < d[1]  # near-dup closer than unrelated
    assert d[0] <= 8


def test_dup_clusters_components(spark):
    # components: {1,2,3} via chain 1-2, 2-3; {10,11}; singletons 20, 21
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "ID_A long, ID_B long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long")
    got = {
        r["DOC_ID"]: (r["CLUSTER_ID"], r["IS_REPRESENTATIVE"])
        for r in dedup.dup_clusters(pairs, nodes).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (21, True),
    }


def test_dup_clusters_long_chain_converges(spark):
    # a 12-node path graph needs multiple propagation rounds
    pairs = spark.createDataFrame([(i, i + 1) for i in range(11)], "ID_A long, ID_B long")
    nodes = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    rows = dedup.dup_clusters(pairs, nodes).collect()
    assert {r["CLUSTER_ID"] for r in rows} == {0}
    assert sum(r["IS_REPRESENTATIVE"] for r in rows) == 1


def test_simhash_near_pairs_matches_brute_force(corpus):
    """Banded candidate generation must have EXACT recall (pigeonhole:
    hamming <= 3 over 4 bands leaves one band untouched)."""
    from pyspark.sql import functions as F

    got = {
        (r["ID_A"], r["ID_B"]): r["HAMMING"]
        for r in dedup.simhash_near_pairs(corpus, bands=4, max_hamming=3).collect()
    }
    sigs = dedup.simhash(corpus).select("doc_id", "SIMHASH")
    a = sigs.select(F.col("doc_id").alias("ID_A"), F.col("SIMHASH").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("ID_B"), F.col("SIMHASH").alias("sb"))
    brute = {
        (r["ID_A"], r["ID_B"]): r["H"]
        for r in a.crossJoin(b)
        .filter(F.col("ID_A") < F.col("ID_B"))
        .withColumn("H", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long"))
        .filter(F.col("H") <= 3)
        .collect()
    }
    assert got == brute and len(got) > 0


def test_simhash_near_pairs_rejects_lossy_banding():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.simhash_near_pairs(None, bands=4, max_hamming=4)


# --- winnowing fingerprints


def test_winnow_guarantee_shared_substring(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import winnow_fingerprints

    # k=5, w=4: sharing any substring of length >= 8 guarantees a shared
    # fingerprint (winnowing theorem)
    shared = "quantized attention kernels"
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "other text " + shared + " different tail"),
        (3, "completely unrelated words nothing common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, k=5, w=4)
    collected = fp.collect()
    by_doc = {}
    for r in collected:
        by_doc.setdefault(r["doc_id"], set()).add(r["FP_HASH"])
    assert by_doc[1] & by_doc[2], "shared substring must yield a shared fingerprint"
    assert not (by_doc[1] & by_doc[3]) or len(by_doc[1] & by_doc[3]) < len(by_doc[1] & by_doc[2])


def test_winnow_short_and_empty_docs(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import winnow_fingerprints

    rows = [(1, "abcd"), (2, ""), (3, "abcdefgh")]  # 1,2 too short for k=5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(df, k=5, w=4).collect()
    assert {r["doc_id"] for r in got} == {3}
    # doc 3: 4 k-grams -> exactly one full window -> one fingerprint
    assert len(got) == 1


def test_winnow_deterministic_under_repartition(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import winnow_fingerprints

    rows = [(i, f"document number {i} with some shared boilerplate text") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r["doc_id"], r["FP_HASH"]) for r in winnow_fingerprints(df).collect()}
    b = {(r["doc_id"], r["FP_HASH"]) for r in winnow_fingerprints(df.repartition(7)).collect()}
    assert a == b


def test_winnow_non_ascii_no_overflow(spark):
    # Code points up to 0x10FFFF: the unreduced gram * 2654435761 would
    # exceed int64 and raise ARITHMETIC_OVERFLOW under ANSI mode. The
    # mod-2^31 reduction must keep CJK/emoji text working AND match the
    # DuckDB oracle formula bit-for-bit.
    from aws_glue_cdc_metrics_job_spark.operators.dedup import winnow_fingerprints

    shared = "机器学习模型训练数据"
    rows = [
        (1, "前缀文本 " + shared + " 后缀甲"),
        (2, "另一端内容 " + shared + " 不同结尾"),
        (3, "完全无关的文字没有重叠部分啊"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(df, k=5, w=4).collect()  # must not overflow
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["FP_HASH"])
    assert by_doc[1] & by_doc[2], "winnowing guarantee must hold for non-ASCII"

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    oracle = con.execute(
        """
        WITH norm AS (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s FROM d),
        pos AS (
          SELECT doc_id, i,
                 ((((CAST(ascii(s[i+0:i+0]) AS BIGINT) * 923521) % 2147483648
                  + (CAST(ascii(s[i+1:i+1]) AS BIGINT) * 29791) % 2147483648
                  + (CAST(ascii(s[i+2:i+2]) AS BIGINT) * 961) % 2147483648
                  + (CAST(ascii(s[i+3:i+3]) AS BIGINT) * 31) % 2147483648
                  + (CAST(ascii(s[i+4:i+4]) AS BIGINT) * 1) % 2147483648) % 2147483648)
                  * 2654435761) % 4294967296 AS h
          FROM norm, UNNEST(range(1, len(s)-5+2)) AS u(i)
          WHERE len(s) >= 5
        ),
        win AS (
          SELECT doc_id,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
                 COUNT(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS c
          FROM pos
        )
        SELECT DISTINCT doc_id, mh FROM win WHERE c = 4
        """
    ).fetchall()
    assert {(r["doc_id"], r["FP_HASH"]) for r in got} == set(oracle)


def test_winnow_rejects_bad_params(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)


# --- segment-level dedup


def test_segment_dedup_marks_repeated_chunks(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import segment_dedup

    boiler = "one two three four five"  # 5 tokens = one k=5 segment
    df = spark.createDataFrame(
        [
            (1, boiler + " unique tail for doc one x"),
            (2, boiler + " different ending here doc two"),
            (3, "totally fresh words in this doc y"),
        ],
        "doc_id long, text string",
    )
    rows = segment_dedup(df, k=5).collect()
    by = {(r["doc_id"], r["SEG_IDX"]): r for r in rows}
    first, second = by[(1, 0)], by[(2, 0)]
    assert first["SEG_HASH"] == second["SEG_HASH"]
    assert first["KEEP"] == 1 and second["KEEP"] == 0  # first occurrence wins
    assert all(r["KEEP"] == 1 for (d, s), r in by.items() if (d, s) not in [(2, 0)])


def test_segment_dedup_short_doc_and_params(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    rows = segment_dedup(df, k=10).collect()
    assert len(rows) == 1 and rows[0]["SEG_IDX"] == 0 and rows[0]["KEEP"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        segment_dedup(df, k=0)


def test_segment_dedup_deterministic_under_repartition(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import segment_dedup

    rows = [(i, f"shared prefix tokens here now tail {i} words more") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {tuple(r) for r in segment_dedup(df, k=5).collect()}
    b = {tuple(r) for r in segment_dedup(df.repartition(7), k=5).collect()}
    assert a == b


def test_dedup_segments_within_doc(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import dedup_segments_within_doc

    docs = spark.createDataFrame(
        [
            # k=2 segments: "a b"|"c d"|"a b"|"e" -> dup "a b" removed
            (1, "a b c d a b e"),
            (2, "x y x y x y"),   # "x y" three times -> one kept
            (3, "p q r"),          # no repeats
            (4, "   "),            # tokenless -> dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_segments_within_doc(docs, k=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["CLEAN_TEXT"] == "a b c d e"
    assert (out[1]["N_SEGMENTS"], out[1]["N_DUP_SEGMENTS"]) == (4, 1)
    assert out[2]["CLEAN_TEXT"] == "x y"
    assert (out[2]["N_SEGMENTS"], out[2]["N_DUP_SEGMENTS"]) == (3, 2)
    assert out[3]["CLEAN_TEXT"] == "p q r"
    assert out[3]["N_DUP_SEGMENTS"] == 0


def test_exact_dedup_incremental(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import (
        exact_dedup_incremental,
        fingerprint,
    )

    existing = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    index = fingerprint(existing)
    batch = spark.createDataFrame(
        [
            (10, "ALPHA   beta"),  # normalizes to an indexed fingerprint: rejected
            (11, "delta"),         # new: admitted
            (12, "delta"),         # dup within batch: rejected (11 is min id)
            (13, "epsilon"),       # new: admitted
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in exact_dedup_incremental(batch, index).collect()}
    assert got == {11, 13}
    # two successive increments == one combined increment (associativity)
    b1, b2 = batch.filter("doc_id <= 11"), batch.filter("doc_id >= 12")
    a1 = exact_dedup_incremental(b1, index)
    idx2 = index.select("FINGERPRINT").union(a1.select("FINGERPRINT"))
    a2 = exact_dedup_incremental(b2, idx2)
    stepwise = {r["doc_id"] for r in a1.collect()} | {r["doc_id"] for r in a2.collect()}
    assert stepwise == got


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(rows, d):
    return {
        (ia, ib, _lev(ka, kb))
        for ia, ka in rows
        for ib, kb in rows
        if ia < ib and _lev(ka, kb) <= d
    }


def test_fuzzy_key_pairs_matches_brute_force(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import fuzzy_key_pairs

    rows = [
        (1, "kitten"),
        (2, "sitten"),
        (3, "sittin"),
        (4, "abc"),
        (5, "abcd"),
        (6, "xyz"),
        (7, "kitten"),  # exact dup of 1
        (8, ""),
        (9, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    for d in (1, 2):
        got = {
            (r["ID_A"], r["ID_B"], r["DISTANCE"]) for r in fuzzy_key_pairs(df, max_dist=d).collect()
        }
        assert got == _brute_pairs(rows, d), f"mismatch at max_dist={d}"


def test_fuzzy_key_pairs_unicode_codepoints(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import fuzzy_key_pairs

    # é is one character: café->cafe is ONE edit, not the two a byte-based
    # distance (e.g. DuckDB's levenshtein) would report.
    df = spark.createDataFrame(
        [(1, "café"), (2, "cafe"), (3, "caffe")], "doc_id long, key string"
    )
    got = {(r["ID_A"], r["ID_B"], r["DISTANCE"]) for r in fuzzy_key_pairs(df, max_dist=1).collect()}
    assert got == {(1, 2, 1), (2, 3, 1)}


def test_fuzzy_key_pairs_null_keys_ignored(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import fuzzy_key_pairs

    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "abc")], "doc_id long, key string"
    )
    got = {(r["ID_A"], r["ID_B"], r["DISTANCE"]) for r in fuzzy_key_pairs(df, max_dist=1).collect()}
    assert got == {(1, 3, 0)}


def test_minhash_dedup_incremental_invariants(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_index,
        minhash_lsh_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where tall trees grow near the river"
    )
    other = (
        "completely different content about spark partitions shuffles and "
        "broadcast joins in a distributed query engine running at scale"
    )
    indexed = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    ib, ih = minhash_index(indexed)
    batch = spark.createDataFrame(
        [
            (10, base),                      # near-dups indexed doc 1: rejected
            (11, base + " extra token"),     # near-dups indexed doc 1: rejected
            (12, "totally novel text about gardens flowers honey bees and " 
                 "sunny afternoons with lemonade under the old oak tree today"),
            (13, "totally novel text about gardens flowers honey bees and "
                 "sunny afternoons with lemonade under the old oak tree today"),  # dup of 12
        ],
        "doc_id long, text string",
    )
    admitted = minhash_dedup_incremental(batch, ib, ih, threshold=0.7)
    got = sorted(r["doc_id"] for r in admitted.collect())
    assert got == [12]
    # invariants: admitted pairwise non-near-dup, and clean vs the index
    combined = indexed.unionByName(admitted)
    pairs = minhash_lsh_pairs(combined, threshold=0.7).collect()
    admitted_ids = set(got)
    for r in pairs:
        assert not (r["ID_A"] in admitted_ids or r["ID_B"] in admitted_ids)


def test_minhash_dedup_incremental_empty_index(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_index,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    ib, ih = minhash_index(empty)
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in minhash_dedup_incremental(batch, ib, ih, threshold=0.7).collect()
    )
    assert got == [1]  # cold start == plain within-batch dedup, min id kept


class TestSourceOverlap:
    def test_identical_sources_estimate_one(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.dedup import source_overlap_estimate

        docs = [
            (1, "A", "the quick brown fox jumps over the lazy dog tonight"),
            (2, "B", "the quick brown fox jumps over the lazy dog tonight"),
            (3, "C", "completely different content with no shared grams here at all"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, source string, text string")
        got = {
            (r["SOURCE_A"], r["SOURCE_B"]): r["EST_JACCARD"]
            for r in source_overlap_estimate(df).collect()
        }
        assert got[("A", "B")] == 1.0       # identical gram sets
        assert got[("A", "C")] == 0.0       # disjoint gram sets
        assert got[("B", "C")] == 0.0

    def test_estimate_tracks_true_jaccard(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.dedup import source_overlap_estimate
        from aws_glue_cdc_metrics_job_spark.operators.decontam import ngram_hashes
        from aws_glue_cdc_metrics_job_spark.sources import read_table
        from pyspark.sql import functions as F

        docs = read_table(spark, "/root/testdata/sf0.001", "documents")
        est = {
            (r["SOURCE_A"], r["SOURCE_B"]): r["EST_JACCARD"]
            for r in source_overlap_estimate(docs, num_perm=64).collect()
        }
        grams = {
            r["source"]: r["hs"]
            for r in ngram_hashes(docs, 3, id_col="source", distinct=False)
            .groupBy("source")
            .agg(F.collect_set("NGRAM_H").alias("hs"))
            .collect()
        }
        for (a, b), e in est.items():
            sa, sb = set(grams[a]), set(grams[b])
            true_j = len(sa & sb) / len(sa | sb)
            assert abs(e - true_j) <= 3 / (64**0.5)  # standard MinHash error


def test_repeated_segment_share(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import repeated_segment_share

    shared = "a b c d e"  # one 5-token segment shared by docs 1 and 2
    rows = [
        (1, shared + " unique one two xx yy"),   # seg0 shared, seg1 unique
        (2, shared + " other words here zz qq"),
        (3, "totally different text block five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repeated_segment_share(df, k=5).collect()}
    assert got[1]["N_SEGMENTS"] == 2 and got[1]["N_SHARED_SEGMENTS"] == 1
    assert got[1]["SHARED_PPM"] == 500000
    assert got[2]["N_SHARED_SEGMENTS"] == 1
    assert got[3]["N_SHARED_SEGMENTS"] == 0 and got[3]["SHARED_PPM"] == 0


def test_cross_source_dup_matrix(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import cross_source_dup_matrix

    seg = "one two three four five"
    rows = [
        (1, "sa", seg + " aa bb cc dd ee"),
        (2, "sb", seg + " ff gg hh ii jj"),   # shares seg with sa
        (3, "sb", seg + " kk ll mm nn oo"),   # same shared seg: counted ONCE per source
        (4, "sc", "pp qq rr ss tt uu vv ww xx yy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["SOURCE_A"], r["SOURCE_B"]): r["N_SHARED_SEGMENTS"]
        for r in cross_source_dup_matrix(df, k=5).collect()
    }
    assert got == {("sa", "sb"): 1}


def test_winnow_overlap_pairs(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import winnow_overlap_pairs

    core = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, core + " tail one"),
        (2, core + " tail two"),          # long shared substring with 1
        (3, "completely unrelated words xyzzy plugh quux"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["ID_A"], r["ID_B"]): r["N_SHARED"] for r in
           winnow_overlap_pairs(df, min_shared=3, max_doc_freq=10).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 3
    assert all(3 not in pair for pair in got)


def test_winnow_overlap_stoplist_bounds_fanout(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import winnow_overlap_pairs

    # a gram shared by ALL docs is dropped by max_doc_freq, so no pair
    # survives on boilerplate alone
    rows = [(i, f"common boiler plate text here unique{i} word{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_overlap_pairs(df, min_shared=1, max_doc_freq=3).collect()
    assert got == []


def test_scoped_persist_bounded_and_plan_keyed(spark):
    """The persist scope must (a) stay bounded across many DIFFERENT plans
    (the round-1 leak) and (b) NOT evict the shared CacheManager entry when
    the SAME plan is re-persisted (the round-4 self-eviction fix: repeated
    identical calls must stay cached)."""
    from aws_glue_cdc_metrics_job_spark.operators import dedup as D

    jsc = spark.sparkContext._jsc.sc()
    base = spark.range(100).selectExpr("id", "id * 2 AS v")

    # same plan thrice: one scope entry, handle reused, stays cached
    h1 = D._scoped_persist(base.groupBy("v").count())
    h2 = D._scoped_persist(base.groupBy("v").count())
    assert h2 is h1
    assert h1.storageLevel.useMemory

    # many different plans: scope stays bounded at the cap
    for i in range(5):
        D._scoped_persist(base.filter(f"id > {i}").groupBy("v").count())
    assert len(D._PERSIST_SCOPE) <= D._PERSIST_CAP


def test_minhash_portable_estimates_track_true_jaccard(spark, sf_dir):
    """The portable-md5 banded MinHash estimator must (a) emit only
    well-formed A<B pairs with estimates in [0,1], (b) assign N_MATCH=32
    / EST=1.0 exactly to candidate pairs whose true 3-gram sets are
    identical, and (c) track the TRUE gram-set Jaccard within the
    32-permutation sampling error (|err| <= 0.35 ~ 2/sqrt(32)) for every
    banded candidate. True Jaccard is recomputed independently from the
    same md5 gram stream."""
    from aws_glue_cdc_metrics_job_spark.operators import dedup as dd
    from aws_glue_cdc_metrics_job_spark.operators.decontam import ngram_hashes
    from aws_glue_cdc_metrics_job_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    est = {
        (r.ID_A, r.ID_B): (r.N_MATCH, r.EST_JACCARD)
        for r in dd.minhash_jaccard_portable(docs).collect()
    }
    assert est, "banded candidates expected on the fixture corpus"
    grams = {}
    for r in ngram_hashes(docs, 3).collect():
        grams.setdefault(r.doc_id, set()).add(r.NGRAM_H)
    for (a, b), (m, j) in est.items():
        assert a < b and 0 <= m <= 32 and 0.0 <= j <= 1.0
        ga, gb = grams[a], grams[b]
        true_j = len(ga & gb) / len(ga | gb)
        if ga == gb:
            assert (m, j) == (32, 1.0)
        assert abs(j - true_j) <= 0.35, (a, b, j, true_j)


# --- round-6b: exact substring-duplication spans ----------------------------


def test_duplicated_spans_merges_overlaps(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import duplicated_spans

    # 12-token boilerplate shared by docs a and b: with k=4, windows at
    # positions 0..8 are all duplicated and must merge into ONE maximal
    # span [0, 11] in each doc
    boiler = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"
    rows = [
        ("a", boiler + " unique tail for doc a here"),
        ("b", "fresh lead text then " + boiler),
        ("c", "totally different words with no repeats at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["SPAN_START"], r["SPAN_END"], r["N_TOKENS"], r["N_WINDOWS"])
        for r in duplicated_spans(df, k=4).collect()
    }
    assert got["a"] == (0, 11, 12, 9)
    assert got["b"] == (4, 15, 12, 9)  # boilerplate starts after 4 lead tokens
    assert "c" not in got


def test_duplicated_spans_splits_distant_islands(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import duplicated_spans

    # two 4-token duplicated phrases separated by >k unique tokens stay
    # SEPARATE spans
    p1, p2 = "p1a p1b p1c p1d", "p2a p2b p2c p2d"
    gap = "g1 g2 g3 g4 g5 g6 g7 g8"
    rows = [
        ("a", f"{p1} {gap} {p2}"),
        ("b", f"{p1} other words entirely here now {p2}"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    spans_a = sorted(
        (r["SPAN_START"], r["SPAN_END"])
        for r in duplicated_spans(df, k=4).where("doc_id = 'a'").collect()
    )
    assert spans_a == [(0, 3), (12, 15)]


def test_duplicated_spans_intra_doc_repeat_counts(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import duplicated_spans

    # the SAME doc repeating a phrase twice is a duplication too
    rows = [("a", "x1 x2 x3 x4 mid1 mid2 mid3 mid4 mid5 x1 x2 x3 x4")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    spans = sorted(
        (r["SPAN_START"], r["SPAN_END"])
        for r in duplicated_spans(df, k=4).collect()
    )
    assert spans == [(0, 3), (9, 12)]


def test_duplicated_spans_validation(spark):
    import pytest as _pytest

    from aws_glue_cdc_metrics_job_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with _pytest.raises(ValueError):
        duplicated_spans(df, k=0)
    with _pytest.raises(ValueError):
        duplicated_spans(df, min_occurrences=1)


def test_duplicated_spans_incremental_probe_and_batch(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import (
        duplicated_spans_incremental,
        substring_hash_index,
    )

    boiler = "b1 b2 b3 b4"
    corpus = spark.createDataFrame(
        [("old1", f"{boiler} corpus filler words here")],
        "doc_id string, text string",
    )
    ix = substring_hash_index(corpus, k=4)
    # batch doc 'a' repeats the INDEXED phrase; 'b' and 'c' share a phrase
    # only WITHIN the batch; 'd' is clean
    p = "q1 q2 q3 q4"
    batch = spark.createDataFrame(
        [
            ("a", f"lead words then {boiler}"),
            ("b", f"{p} more unique text follows"),
            ("c", f"totally different opening then {p}"),
            ("d", "no duplication anywhere in this one at all"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["SPAN_START"], r["SPAN_END"])
        for r in duplicated_spans_incremental(batch, ix, k=4).collect()
    }
    assert got["a"] == (3, 6)   # the indexed boilerplate, found via the probe
    assert got["b"] == (0, 3)   # batch-internal duplication
    assert got["c"] == (4, 7)
    assert "d" not in got


def test_substring_hash_index_mergeable(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import substring_hash_index

    d1 = spark.createDataFrame([("x", "a b c d e")], "doc_id string, text string")
    d2 = spark.createDataFrame([("y", "c d e f g")], "doc_id string, text string")
    both = d1.unionByName(d2)
    merged = (
        substring_hash_index(d1, k=3)
        .unionByName(substring_hash_index(d2, k=3))
        .distinct()
    )
    direct = substring_hash_index(both, k=3)
    assert sorted(r["WHASH"] for r in merged.collect()) == sorted(
        r["WHASH"] for r in direct.collect()
    )


def test_remove_spans_cuts_and_reassembles(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import (
        duplicated_spans,
        remove_spans,
    )

    boiler = "b1 b2 b3 b4"
    rows = [
        ("a", f"{boiler} keep1 keep2 keep3"),
        ("b", f"keepx {boiler} keepy"),
        ("c", "all unique words stay exactly as they are"),
        ("d", boiler),  # pure duplicate: fully covered, dropped entirely
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    spans = duplicated_spans(df, k=4)
    got = {
        r["doc_id"]: (r["CLEAN_TEXT"], r["N_TOKENS_KEPT"], r["N_TOKENS_DROPPED"])
        for r in remove_spans(df, spans).collect()
    }
    assert got["a"] == ("keep1 keep2 keep3", 3, 4)
    assert got["b"] == ("keepx keepy", 2, 4)
    assert got["c"] == ("all unique words stay exactly as they are", 8, 0)
    assert "d" not in got


def test_substring_novelty_scores(spark):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import (
        substring_hash_index,
        substring_novelty,
    )

    ref = spark.createDataFrame(
        [("r", "a b c d e f")], "doc_id string, text string"
    )
    ix = substring_hash_index(ref, k=3)
    batch = spark.createDataFrame(
        [
            ("x", "a b c d e f"),          # fully seen -> novelty 0
            ("y", "p q r s t"),            # fully novel -> 1e6
            ("z", "a b c d z2 z3 z4"),     # windows: abc,bcd seen; cdz2..z4 novel
            ("w", "a b"),                  # < k tokens: absent
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["N_WINDOWS"], r["N_SEEN"], r["NOVELTY_PPM"])
        for r in substring_novelty(batch, ix, k=3).collect()
    }
    assert got["x"] == (4, 4, 0)
    assert got["y"] == (3, 0, 1_000_000)
    assert got["z"] == (5, 2, 600_000)
    assert "w" not in got


def test_minhash_incremental_exemplar_compaction(spark):
    """VERDICT r7 item 3: C exact copies of a text must contribute ONE
    exemplar to the index and to the batch's pair stage (candidate growth
    linear in C, not C^2), with admission decisions unchanged."""
    from aws_glue_cdc_metrics_job_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_index,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where tall trees grow near the river"
    )
    novel = (
        "totally novel text about gardens flowers honey bees and sunny "
        "afternoons with lemonade under the old oak tree this afternoon"
    )
    # 30 identical copies of base in the index -> ONE exemplar (min id)
    indexed = spark.createDataFrame(
        [(i, base) for i in range(30)], "doc_id long, text string"
    )
    ib, ih = minhash_index(indexed)
    assert ih.count() == 1 and ih.collect()[0]["doc_id"] == 0
    assert ib.select("doc_id").distinct().count() == 1

    # batch: 20 copies of base (all rejected via the one exemplar),
    # 20 copies of novel (19 rejected as non-exemplars, min id admitted)
    batch = spark.createDataFrame(
        [(100 + i, base) for i in range(20)]
        + [(200 + i, novel) for i in range(20)],
        "doc_id long, text string",
    )
    admitted = minhash_dedup_incremental(batch, ib, ih, threshold=0.7)
    assert sorted(r["doc_id"] for r in admitted.collect()) == [200]
