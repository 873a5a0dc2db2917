"""Text analysis operators (token stats, quality, language heuristic)."""

import pytest

from aws_glue_cdc_metrics_job_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The cat sat on the mat"),            # english-ish, 6 tokens, 2x 'the' + 'on'
        (2, "zzz qqq xxx"),                        # no stopwords
        (3, ""),                                   # empty
        (4, "  spaced    out   words  "),          # whitespace collapse
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(docs):
    got = {r["doc_id"]: r for r in text.token_stats(docs).collect()}
    assert got[1]["N_TOKENS"] == 6
    assert got[2]["N_TOKENS"] == 3
    assert got[3]["N_TOKENS"] == 0 and got[3]["AVG_TOKEN_LEN"] is None
    assert got[4]["N_TOKENS"] == 3
    assert got[2]["AVG_TOKEN_LEN"] == 3.0


def test_quality_score_monotone_in_length(spark):
    rows = [(1, "word " * 10), (2, "word " * 300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["QUALITY_SCORE"] for r in text.quality_score(df).collect()}
    assert got[2] > got[1]
    keep = {r["doc_id"]: r["KEEP"] for r in text.quality_score(df).collect()}
    assert keep[2] is True


def test_quality_empty_doc(docs):
    got = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert got[3]["QUALITY_SCORE"] == 0.0 and got[3]["KEEP"] is False


def test_language_guess(docs):
    got = {r["doc_id"]: r["LANG_GUESS"] for r in text.language_guess(docs).collect()}
    assert got[1] == "en"       # 3/6 stopwords
    assert got[2] == "unknown"
    assert got[3] == "unknown"


def test_regex_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! 42 times"), (2, ""), (3, "a1b2")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text.regex_token_stats(df).collect()}
    # Hello , world ! 42 times -> 6 bpe tokens (4 alpha, 1 digit, 2 punct)
    assert got[1]["N_BPE_TOKENS"] == 6
    assert got[1]["N_ALPHA_TOKENS"] == 3  # Hello world times
    assert got[1]["N_DIGIT_TOKENS"] == 1
    assert got[1]["N_PUNCT_TOKENS"] == 2
    assert got[2]["N_BPE_TOKENS"] == 0
    assert got[3]["N_BPE_TOKENS"] == 4  # a 1 b 2


def test_repetition_stats_hand_computed(spark):
    # doc 1: "a b a b a" -> 5 tokens, top 'a' x3; bigrams [a b, b a, a b, b a]
    #   -> 4 grams, 2 distinct, dup ratio 0.5
    # doc 2: all-distinct tokens -> dup ratio 0.0
    # doc 3: empty -> zero counts, ratios 0.0
    # doc 4: single token -> no grams
    rows = [(1, "a b a b a"), (2, "w x y z"), (3, ""), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
    assert got[1]["N_TOKENS"] == 5 and got[1]["TOP_TOKEN_SHARE"] == 0.6
    assert got[1]["N_GRAMS"] == 4 and got[1]["N_DISTINCT_GRAMS"] == 2
    assert got[1]["DUP_GRAM_RATIO"] == 0.5
    assert got[2]["DUP_GRAM_RATIO"] == 0.0 and got[2]["TOP_TOKEN_SHARE"] == 0.25
    assert got[3]["N_TOKENS"] == 0 and got[3]["DUP_GRAM_RATIO"] == 0.0
    assert got[3]["TOP_TOKEN_SHARE"] == 0.0
    assert got[4]["N_GRAMS"] == 0 and got[4]["DUP_GRAM_RATIO"] == 0.0


def test_vocab_stats_hand_computed(spark):
    rows = [
        (1, "a b a"),
        (2, "a c"),
        (3, "c a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["TOKEN"], r["TERM_FREQ"], r["DOC_FREQ"]) for r in text.vocab_stats(df).collect()]
    # doc_freq: a in 3 docs, b in 2, c in 2; term_freq: a=4, b=2, c=2
    assert got == [("a", 4, 3), ("b", 2, 2), ("c", 2, 2)]  # df desc, token asc


def test_vocab_stats_top_k_cutoff(spark):
    rows = [(i, "w%d common" % (i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = text.vocab_stats(df, top_k=3).collect()
    assert len(got) == 3
    assert got[0]["TOKEN"] == "common" and got[0]["DOC_FREQ"] == 40


def test_quality_top_fraction(spark):
    rows = [
        (1, "en", "the a of and to in is on for it extra words here now"),  # high stopword ratio
        (2, "en", "zz yy xx"),
        (3, "en", "aa bb cc dd ee ff gg hh"),
        (4, "de", "und der das"),
        (5, "de", "qq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = {r["doc_id"] for r in text.quality_top_fraction(df, fraction=0.5).collect()}
    # en: ceil(3*0.5)=2 kept; de: ceil(2*0.5)=1 kept
    assert len([d for d in kept if d in (1, 2, 3)]) == 2
    assert len([d for d in kept if d in (4, 5)]) == 1
    assert 1 in kept  # highest-scoring en doc must survive


def test_quality_top_fraction_full_keep(spark):
    rows = [(i, "en", "some words here") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    assert text.quality_top_fraction(df, fraction=1.0).count() == 4
    with pytest.raises(ValueError):
        text.quality_top_fraction(df, fraction=0.0)


def test_bm25_ranks_term_rich_docs_first(spark):
    rows = [
        (1, "table scan fast table scan"),     # all three terms, repeats
        (2, "table and other words here"),     # one term
        (3, "nothing relevant at all"),        # no terms
        (4, "fast scan"),                      # two terms, short doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = text.bm25_topk(df, ["table", "scan", "fast"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 3 not in ids  # zero-hit docs never appear
    assert ids[0] in (1, 4)  # term-dense docs outrank the one-term doc
    assert ids.index(2) == len(ids) - 1
    scores = [r["SCORE"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_bm25_deterministic_and_k_bound(spark):
    rows = [(i, "table word%d scan" % i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [(r["doc_id"], r["SCORE"]) for r in text.bm25_topk(df, ["table", "scan"], k=7).collect()]
    b = [(r["doc_id"], r["SCORE"]) for r in text.bm25_topk(df.repartition(5), ["table", "scan"], k=7).collect()]
    assert a == b and len(a) == 7

    import pytest as _pytest

    with _pytest.raises(ValueError):
        text.bm25_topk(df, [])


def test_encode_token_ids_hand_computed(spark):
    rows = [(1, "b a c"), (2, ""), (3, "a zzz a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 0), ("b", 1), ("c", 2)], "TOKEN string, TOKEN_ID long")
    got = {r["doc_id"]: r for r in text.encode_token_ids(df, vocab).collect()}
    assert got[1]["TOKEN_IDS"] == [1, 0, 2]  # position order preserved
    assert got[2]["TOKEN_IDS"] == [] and got[2]["N_TOKENS"] == 0
    assert got[3]["TOKEN_IDS"] == [0, -1, 0]  # OOV -> -1, duplicates kept


def test_encode_token_ids_deterministic(spark):
    rows = [(i, "a b c d e f g"[: (i % 7) * 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = spark.createDataFrame(
        [(t, i) for i, t in enumerate("abcdefg")], "TOKEN string, TOKEN_ID long"
    )
    a = {r["doc_id"]: r["TOKEN_IDS"] for r in text.encode_token_ids(df, vocab).collect()}
    b = {r["doc_id"]: r["TOKEN_IDS"] for r in text.encode_token_ids(df.repartition(11), vocab).collect()}
    assert a == b


# --- PII scrubbing


def test_scrub_pii_all_types_and_multiples(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at bob.smith+spam@corp.example.co or alice@ex.io thanks"),
            (2, "server 192.168.10.7 and 10.0.0.1 up"),
            (3, "call +1 555-0199 202 or 555 123 4567 now"),
            (4, "nothing sensitive here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["SCRUBBED"] for r in text.scrub_pii(df).collect()}
    assert got[1] == "reach me at <EMAIL> or <EMAIL> thanks"
    assert got[2] == "server <IPV4> and <IPV4> up"
    assert "<PHONE>" in got[3] and "555" not in got[3]
    assert got[4] == "nothing sensitive here at all"


def test_scrub_pii_order_ip_before_phone(spark):
    # dotted quads must become <IPV4>, not be half-eaten by the phone rule
    df = spark.createDataFrame([(1, "tel +1 555-0142 ip 10.0.3.7 end")], "doc_id long, text string")
    got = text.scrub_pii(df).collect()[0]["SCRUBBED"]
    assert got == "tel <PHONE> ip <IPV4> end"


class TestBpe:
    @staticmethod
    def _ref_bpe(word_counts, n_merges, min_pair_count=2):
        """Independent reference BPE (pure Python, standard algorithm):
        per round count adjacent pairs over (distinct word, multiplicity),
        merge the max (ties: lexicographically smallest pair), repeat."""
        syms = {w: [c for c in w] for w in word_counts}
        merges = []
        for _ in range(n_merges):
            counts = {}
            for w, n in word_counts.items():
                s = syms[w]
                for a, b in zip(s, s[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + n
            counts = {p: c for p, c in counts.items() if c >= min_pair_count}
            if not counts:
                break
            best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
            merges.append(best)
            for w in syms:
                s, out, i = syms[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                        out.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        return merges

    def test_train_matches_reference(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import bpe_train

        corpus = (
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        )
        docs = spark.createDataFrame(
            [(i, w) for i, w in enumerate(corpus)], "doc_id long, text string"
        )
        wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        got = bpe_train(docs, n_merges=6)
        want = self._ref_bpe(wc, 6)
        assert got == want
        # the classic outcome: 'es','est' merges driven by newest+widest
        assert ("e", "s") == got[0] and ("es", "t") == got[1]

    def test_pair_counts(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import (
            bpe_pair_counts,
            bpe_word_counts,
        )

        docs = spark.createDataFrame([(0, "ab ab abc")], "doc_id long, text string")
        wc = bpe_word_counts(docs)
        got = {
            (r["LEFT_SYM"], r["RIGHT_SYM"]): r["N_PAIRS"]
            for r in bpe_pair_counts(wc).collect()
        }
        # distinct words: ab x2, abc x1 -> (a,b): 2+1, (b,c): 1
        assert got == {("a", "b"): 3, ("b", "c"): 1}

    def test_early_stop(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import bpe_train

        docs = spark.createDataFrame([(0, "xy")], "doc_id long, text string")
        # single occurrence < min_pair_count=2 -> no merges at all
        assert bpe_train(docs, n_merges=3) == []


def test_unigram_logprob_ranks_rare_docs(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import unigram_logprob

    docs = spark.createDataFrame(
        [
            (0, "the the the the"),        # all common
            (1, "zzz qqq"),               # all rare
            (2, "the zzz"),               # mixed
            (3, "   "),                   # tokenless: dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["N_TOKENS"] == 4
    assert out[0]["AVG_NEG_LOGPROB"] < out[2]["AVG_NEG_LOGPROB"] < out[1]["AVG_NEG_LOGPROB"]


# --- heavy hitters: exact threshold + mergeable Misra-Gries summary


def test_heavy_hitters_exact(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import heavy_hitters

    # 'hot' is 6 of 20 tokens (30%); 'warm' 4/20 (20%); everything else 1/20
    docs = spark.createDataFrame(
        [
            (1, "hot hot hot warm warm a b c"),
            (2, "hot hot hot warm warm d e f"),
            (3, "g h i j"),
        ],
        "doc_id long, text string",
    )
    got = {r["TOKEN"]: (r["N"], r["SHARE"]) for r in heavy_hitters(docs, denom=5).collect()}
    # threshold 1/5 = 4 of 20 occurrences
    assert set(got) == {"hot", "warm"}
    assert got["hot"] == (6, 0.3) and got["warm"] == (4, 0.2)


def test_mg_summary_guarantee_and_merge(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import mg_merge, mg_token_summary

    # stream of n=400 tokens: 'hh' 30%, 'mid' 10%, 280 distinct singletons
    rows = []
    for i in range(40):
        rows.append((i, "hh hh hh mid " + " ".join(f"u{i}_{j}" for j in range(6))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = 400
    k = 20
    summaries = mg_token_summary(docs, k=k, shards=4)
    merged = {r["TOKEN"]: r["C"] for r in mg_merge(summaries, k=k).collect()}
    # any token with true freq > n/(k+1) must survive, undercount <= n/(k+1)
    assert "hh" in merged and "mid" in merged
    assert merged["hh"] <= 120 and 120 - merged["hh"] <= n / (k + 1)
    assert merged["mid"] <= 40 and 40 - merged["mid"] <= n / (k + 1)
    assert len(merged) <= k
    # summary is deterministic (fixed stream order within shard)
    again = {r["TOKEN"]: r["C"] for r in mg_merge(mg_token_summary(docs, k=k, shards=4), k=k).collect()}
    assert again == merged
    # merging shard summaries in two stages obeys the same bound
    s01 = mg_merge(summaries.filter("SHARD < 2").select("TOKEN", "C"), k=k)
    s23 = mg_merge(summaries.filter("SHARD >= 2").select("TOKEN", "C"), k=k)
    two_stage = {
        r["TOKEN"]: r["C"]
        for r in mg_merge(s01.unionByName(s23), k=k).collect()
    }
    assert "hh" in two_stage and 120 - two_stage["hh"] <= n / (k + 1)


def test_mg_merge_under_k_counters_is_exact(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import mg_merge, mg_token_summary

    docs = spark.createDataFrame([(1, "x x y z")], "doc_id long, text string")
    got = {r["TOKEN"]: r["C"] for r in mg_merge(mg_token_summary(docs, k=10, shards=2), k=10).collect()}
    # fewer distinct tokens than k: MG degenerates to exact counts
    assert got == {"x": 2, "y": 1, "z": 1}


class TestChunkDocuments:
    def test_coverage_and_overlap(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import chunk_documents

        txt = " ".join(f"w{i}" for i in range(150))
        df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, chunk_tokens=64, stride=48).collect(),
            key=lambda r: r["CHUNK_IDX"],
        )
        # starts 0, 48, 96; start 144 is dropped (its 6-token runt is a
        # pure suffix-duplicate of the start-96 chunk's coverage)
        assert [r["CHUNK_IDX"] for r in rows] == [0, 1, 2]
        assert [r["N_TOKENS"] for r in rows] == [64, 64, 54]
        # every token appears in at least one chunk, in order
        toks = [t for r in rows for t in r["CHUNK_TEXT"].split(" ")]
        assert set(toks) == {f"w{i}" for i in range(150)}
        # consecutive chunks share exactly chunk - stride = 16 tokens
        a, b = rows[0]["CHUNK_TEXT"].split(" "), rows[1]["CHUNK_TEXT"].split(" ")
        assert a[-16:] == b[:16]

    def test_short_and_empty_docs(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import chunk_documents

        df = spark.createDataFrame(
            [(1, "only three tokens"), (2, "   "), (3, None)],
            "doc_id long, text string",
        )
        rows = chunk_documents(df, chunk_tokens=8, stride=4).collect()
        assert len(rows) == 1
        assert rows[0]["doc_id"] == 1 and rows[0]["N_TOKENS"] == 3

    def test_validation(self, spark):
        import pytest

        from aws_glue_cdc_metrics_job_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, stride=8)  # would drop tokens
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=0)


class TestSegmentLanguageProfile:
    def test_mixed_doc_profile(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import segment_language_profile

        en_seg = "the of and to in is on for it a " * 4  # 40 stopword tokens
        xx_seg = "zzz qqq www rrr ttt yyy uuu iii ooo ppp " * 4
        mixed = en_seg * 2 + xx_seg  # segments: en, en, xx ((40*3)/32 -> 4 w/ runt)
        df = spark.createDataFrame(
            [(1, mixed), (2, xx_seg), (3, en_seg)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in segment_language_profile(df, segment_tokens=40).collect()}
        assert got[1]["N_SEGMENTS"] == 3 and got[1]["N_EN_SEGMENTS"] == 2
        assert got[1]["DOC_LANG_GUESS"] == "en"
        assert got[2]["DOC_LANG_GUESS"] == "unknown" and got[2]["N_EN_SEGMENTS"] == 0
        assert got[3]["DOC_LANG_GUESS"] == "en" and got[3]["EN_SEGMENT_RATIO"] == 1.0


class TestCollocationLift:
    def test_lift_math_and_min_count(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import collocation_lift

        # "new york" always adjacent (5x); fillers keep totals known
        doc = "new york a b new york c d new york e f new york g h new york"
        df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
        rows = {(r["TOKEN_A"], r["TOKEN_B"]): r for r in collocation_lift(df, min_count=5).collect()}
        assert set(rows) == {("new", "york")}
        r = rows[("new", "york")]
        n_total = len(doc.split())
        assert r["N_AB"] == 5 and r["N_A"] == 5 and r["N_B"] == 5
        assert r["LIFT"] == round(5 * n_total / (5 * 5) + 1e-12, 6) or abs(
            r["LIFT"] - 5 * n_total / 25
        ) < 1e-6

    def test_no_cross_document_pairs(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import collocation_lift

        df = spark.createDataFrame(
            [(i, "alpha") for i in range(10)], "doc_id long, text string"
        )
        # each doc has ONE token: no adjacency anywhere
        assert collocation_lift(df, min_count=1).count() == 0


class TestSourceDatasheet:
    def test_datasheet_math(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.text import source_datasheet

        docs = [
            (1, "A", "the quick brown fox"),
            (2, "A", "the  quick  brown  fox"),   # duplicate content of 1
            (3, "A", "something else entirely"),
            (4, "B", "solo document here"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, source string, text string")
        got = {r["source"]: r for r in source_datasheet(df).collect()}
        a = got["A"]
        assert a["N_DOCS"] == 3 and a["N_TOKENS"] == 11 and a["MAX_TOKENS"] == 4
        assert a["N_DISTINCT_TEXTS"] == 2
        assert abs(a["DUP_RATIO"] - (1 - 2 / 3)) < 1e-6
        b = got["B"]
        assert b["N_DOCS"] == 1 and b["DUP_RATIO"] == 0.0


def test_df_table(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import df_table

    rows = [
        (1, "apple banana apple"),      # apple counted once for this doc
        (2, "apple cherry"),
        (3, "banana cherry date"),
        (4, "apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["TOKEN"]: (r["DOC_FREQ"], r["DF_PPM"]) for r in df_table(df, top=10).collect()}
    assert got["apple"] == (3, 750000)
    assert got["banana"] == (2, 500000)
    assert got["date"] == (1, 250000)


def test_df_table_top_cut_deterministic(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import df_table

    rows = [(i, "aa bb cc dd") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # all four tokens tie at DOC_FREQ 3: the top-2 cut picks by TOKEN asc
    got = [r["TOKEN"] for r in df_table(df, top=2).collect()]
    assert got == ["aa", "bb"]


def test_gopher_rules_report(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import gopher_rules_report

    rows = [
        (1, "short text only"),                       # too few tokens
        (2, " ".join(["word"] * 60)),                 # clean
        (3, " ".join(["supercalifragilistic"] * 60)), # mean len > 10
        (4, " ".join(["a"] * 60)),                    # mean len < 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["RULE"]: (r["N_VIOLATIONS"], r["SHARE_PPM"]) for r in
           gopher_rules_report(df, min_tokens=50, max_tokens=2500).collect()}
    assert got["too_few_tokens"] == (1, 250000)
    assert got["mean_token_len_gt10"] == (1, 250000)
    assert got["mean_token_len_lt3"] == (1, 250000)
    assert got["too_many_tokens"] == (0, 0)
    # doc 4 is all 'a' (an EN stopword); docs 1-3 carry none -> 3 violate
    assert got["no_stopword"] == (3, 750000)


# --- word bigrams / bigram LM / DSIR ---------------------------------------


def test_word_bigrams_shape(spark):
    import pyspark.sql.functions as F

    rows = [(1, "a b c"), (2, "solo"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bg"]
        for r in df.select("doc_id", F.col("text"), text.word_bigrams().alias("bg")).collect()
    }
    assert [(p["w1"], p["w2"]) for p in got[1]] == [("a", "b"), ("b", "c")]
    assert got[2] == [] and got[3] == []


def test_bigram_logprob_known_corpus(spark):
    # corpus: doc1 "a b a b", doc2 "a c". bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    # tokens: a:3 b:2 c:1, N=6. starts: a->3, b->1.
    import math

    rows = [(1, "a b a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.bigram_logprob(df, lam=0.75).collect()}
    assert got[1]["N_BIGRAMS"] == 3 and got[2]["N_BIGRAMS"] == 1

    def srp(c12, c1s, c2, n=6):
        p = 0.75 * (c12 / c1s) + 0.25 * (c2 / n)
        x = -math.log(p)
        return math.floor(x * 1e9 + 0.5) / 1e9

    exp1 = (srp(2, 3, 2) + srp(1, 1, 3) + srp(2, 3, 2)) / 3
    assert got[1]["AVG_NEG_LOGPROB"] == pytest.approx(
        math.floor(exp1 * 1e6 + 0.5) / 1e6, abs=1e-9
    )


def test_dsir_weights_favor_target_like_docs(spark):
    import pyspark.sql.functions as F

    # target slice repeats "good data"; raw noise repeats "bad junk".
    rows = [(i, "good data " * 10, "t") for i in range(10)]
    rows += [(100 + i, "bad junk " * 10, "r") for i in range(10)]
    rows += [(200, "good data good data", "?"), (201, "bad junk bad junk", "?")]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {
        r["doc_id"]: r["LOG_WEIGHT"]
        for r in text.dsir_weights(df, target=F.col("grp") == "t").collect()
    }
    # a target-looking doc must outscore a raw-looking doc
    assert out[200] > out[201]
    # docs with no bigrams are absent
    assert all(r is not None for r in out.values())


def test_dsir_short_docs_dropped(spark):
    import pyspark.sql.functions as F

    rows = [(1, "one"), (2, ""), (3, "two words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.dsir_weights(df, target=F.lit(True)).collect()
    assert {r["doc_id"] for r in out} == {3}


def test_dsir_fast_path_same_invariants(spark):
    import pyspark.sql.functions as F

    rows = [(i, "good data " * 10, "t") for i in range(10)]
    rows += [(100 + i, "bad junk " * 10, "r") for i in range(10)]
    rows += [(200, "good data good data", "?"), (201, "bad junk bad junk", "?")]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {
        r["doc_id"]: r
        for r in text.dsir_weights(df, target=F.col("grp") == "t", portable=False).collect()
    }
    # same direction as the md5 path; feature counts are hash-independent
    assert out[200]["LOG_WEIGHT"] > out[201]["LOG_WEIGHT"]
    assert out[200]["N_FEATURES"] == 3 and out[201]["N_FEATURES"] == 3


def test_bpe_encode_round_trip_and_reference(spark):
    rows = [(1, "low lower lowest"), (2, "low low newer")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = text.bpe_train(df, n_merges=3, min_pair_count=2)
    assert merges  # corpus has repeated pairs

    # pure-Python reference: same merge loop over each word
    def ref_encode(word):
        syms = list(word)
        for l, r in merges:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r["doc_id"]: r for r in text.bpe_encode(df, merges).collect()}
    for doc_id, txt in rows:
        words = txt.split()
        exp_pieces = [ref_encode(w) for w in words]
        assert got[doc_id]["N_WORDS"] == len(words)
        assert got[doc_id]["N_PIECES"] == sum(len(p) for p in exp_pieces)
        assert got[doc_id]["ENCODED"] == " | ".join(" ".join(p) for p in exp_pieces)

    # concatenating a word's pieces reconstructs the word (lossless)
    for seg in got[1]["ENCODED"].split(" | "):
        assert seg.replace(" ", "") in {"low", "lower", "lowest"}


def test_dsir_model_score_split_matches_fused(spark):
    import pyspark.sql.functions as F

    rows = [(i, f"alpha beta gamma delta w{i % 5} x{i % 3}", "t" if i % 2 == 0 else "r")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    fused = {
        (r["doc_id"]): (r["N_FEATURES"], r["LOG_WEIGHT"])
        for r in text.dsir_weights(df, target=F.col("grp") == "t").collect()
    }
    model = text.dsir_model(df, target=F.col("grp") == "t")
    split = {
        (r["doc_id"]): (r["N_FEATURES"], r["LOG_WEIGHT"])
        for r in text.dsir_score(df, model).collect()
    }
    assert split == fused
    # scoring a batch with unseen-bucket bigrams neither fails nor counts them
    new = spark.createDataFrame([(99, "zzzz qqqq pppp")], "doc_id long, text string")
    out = text.dsir_score(new, model.filter(F.lit(False))).collect()
    assert out == []


def test_bigram_lm_split_matches_fused_on_training_corpus(spark):
    rows = [(1, "a b a b c"), (2, "a c a b"), (3, "b c b a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fused = {r["doc_id"]: (r["N_BIGRAMS"], r["AVG_NEG_LOGPROB"])
             for r in text.bigram_logprob(df).collect()}
    pairs, unigrams = text.bigram_lm_model(df)
    split = {r["doc_id"]: (r["N_BIGRAMS"], r["AVG_NEG_LOGPROB"])
             for r in text.bigram_lm_score(df, pairs, unigrams).collect()}
    assert split == fused  # no OOV on the training corpus itself


def test_bigram_lm_score_oov_finite(spark):
    import math

    train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    pairs, unigrams = text.bigram_lm_model(train)
    # "z q" is fully out of vocabulary; "b a" has seen words, unseen pair
    batch = spark.createDataFrame([(9, "z q b a")], "doc_id long, text string")
    got = text.bigram_lm_score(batch, pairs, unigrams).collect()[0]
    assert got["N_BIGRAMS"] == 3
    assert math.isfinite(got["AVG_NEG_LOGPROB"]) and got["AVG_NEG_LOGPROB"] > 0


def test_head_vocab_drift_ranks_shifted_source(spark):
    """A source drawn from the corpus-typical distribution scores low; a
    source of out-of-head tokens scores near the 2e6 ppm ceiling; results
    are partitioning-invariant."""
    from aws_glue_cdc_metrics_job_spark.operators.text import head_vocab_drift

    typical = [("s_typical", "the cat sat on the mat " * 5)] * 8
    shifted = [("s_shifted", "zzq qqz zqq xyzzy plugh " * 5)] * 2
    df = spark.createDataFrame(typical + shifted, "source string, text string")
    got = {r["SOURCE"]: r["HEAD_DRIFT_PPM"] for r in head_vocab_drift(df, top_k=6).collect()}
    assert got["s_shifted"] > got["s_typical"]
    # shifted source: 0 observed mass on the head (its tokens are the tail)
    # -> drift == the head's full corpus ppm mass as seen from that source
    a = sorted(map(tuple, head_vocab_drift(df.coalesce(1), top_k=6).collect()))
    b = sorted(map(tuple, head_vocab_drift(df.repartition(7), top_k=6).collect()))
    assert a == b


# --- round 7: encoding-quality (mojibake) screen -----------------------------


def test_mojibake_report_counts_and_flags(spark):
    from aws_glue_cdc_metrics_job_spark.operators.text import (
        MOJIBAKE_PATTERNS,
        _latin1_ghost,
        mojibake_report,
    )

    ghost_quote = _latin1_ghost("’")   # 3-char ghost of a curly quote
    ghost_e = _latin1_ghost("é")       # 2-char ghost of e-acute
    assert ghost_e == "Ã©" and ghost_quote in MOJIBAKE_PATTERNS
    rows = [
        (1, "clean ascii text"),
        (2, f"caf{ghost_e} und caf{ghost_e}"),          # 2 mojibake hits
        (3, "lost � chars �� here"),      # 3 replacement chars
        (4, "ctrl\x01\x02 junk\x1f"),                    # 3 control chars
        (5, f"don{ghost_quote}t"),                       # 1 three-char ghost
        (6, ""),                                         # empty: all zero, not suspect
        (7, "tab\tand\nnewline\rare fine"),              # whitelisted controls
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in mojibake_report(df, threshold_ppm=100000).collect()}
    assert got[1]["N_MOJIBAKE"] == got[1]["N_REPLACEMENT"] == got[1]["N_CONTROL"] == 0
    assert not got[1]["SUSPECT"]
    assert got[2]["N_MOJIBAKE"] == 2 and got[2]["SUSPECT"]
    assert got[3]["N_REPLACEMENT"] == 3 and got[3]["SUSPECT"]
    assert got[4]["N_CONTROL"] == 3 and got[4]["SUSPECT"]
    assert got[5]["N_MOJIBAKE"] == 1
    assert got[6]["N_CHARS"] == 0 and got[6]["BAD_PPM"] == 0 and not got[6]["SUSPECT"]
    assert got[7]["N_CONTROL"] == 0 and not got[7]["SUSPECT"]
    # BAD_PPM floor arithmetic: doc 2 has 2 bad of 17 chars
    assert got[2]["BAD_PPM"] == 2 * 10**6 // got[2]["N_CHARS"]


def test_mojibake_report_matches_duckdb_twin(spark):
    """The generated oracle SQL computes identical rows on hostile text --
    including the C1-control-bearing ghost literals inside SQL strings."""
    import duckdb

    from aws_glue_cdc_metrics_job_spark.operators.text import (
        _latin1_ghost,
        mojibake_report,
        mojibake_sql,
    )

    rows = [
        (1, f"a{_latin1_ghost(chr(0x2019))}b � c\x01"),
        (2, f"caf{_latin1_ghost(chr(0xE9))} normal"),
        (3, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, mojibake_report(df).collect()))
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(mojibake_sql()).fetchall()))
    assert got == want
