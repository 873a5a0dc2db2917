"""Property-based invariants for the substring-dedup family, via
hypothesis: arbitrary small corpora over a TINY vocabulary (forcing window
collisions) are compared against a brute-force pure-Python replay of the
whole pipeline -- windows, duplication flags, island merge, removal.

Spark jobs are slow per-example, so examples are few but each is a whole
corpus; the deterministic unit tests in test_dedup.py cover the targeted
edge cases (overlap merge, adjacency, pure duplicates, empty docs)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_glue_cdc_metrics_job_spark.operators.dedup import (
    duplicated_spans,
    remove_spans,
    substring_novelty,
)

# tiny vocab + short docs: near-guaranteed repeated windows per corpus
TOKEN = st.sampled_from(["aa", "bb", "cc"])
DOC = st.lists(TOKEN, min_size=0, max_size=12)
CORPUS = st.dictionaries(
    st.sampled_from(["d1", "d2", "d3", "d4"]), DOC, min_size=1, max_size=4
)


def _brute_spans(corpus: dict, k: int):
    """Pure-Python replay: window -> count -> flag -> gaps-and-islands."""
    from collections import Counter

    wins = {}
    counts = Counter()
    for d, toks in corpus.items():
        ws = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        wins[d] = ws
        counts.update(ws)
    spans = {}
    for d, ws in wins.items():
        flagged = [i for i, w in enumerate(ws) if counts[w] >= 2]
        out = []
        for p in flagged:
            if out and p - out[-1][1] <= k:
                out[-1] = (out[-1][0], p, out[-1][2] + 1)
            else:
                out.append((p, p, 1))
        spans[d] = [(s, e + k - 1, n) for s, e, n in out]
    return spans


def _df(spark, corpus):
    rows = [(d, " ".join(toks)) for d, toks in corpus.items()]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=CORPUS, k=st.integers(min_value=2, max_value=3))
def test_duplicated_spans_matches_brute_force(spark, corpus, k):
    df = _df(spark, corpus)
    got = {}
    for r in duplicated_spans(df, k=k).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["SPAN_START"], r["SPAN_END"], r["N_WINDOWS"])
        )
    want = {d: s for d, s in _brute_spans(corpus, k).items() if s}
    assert {d: sorted(v) for d, v in got.items()} == {
        d: sorted(v) for d, v in want.items()
    }

    # removal invariants: kept + dropped == doc tokens; every reported
    # span's tokens are gone; untouched docs keep their exact text
    spans = duplicated_spans(df, k=k)
    clean = {r["doc_id"]: r for r in remove_spans(df, spans).collect()}
    for d, toks in corpus.items():
        covered = set()
        for s, e, _ in want.get(d, []):
            covered.update(range(s, e + 1))
        expect_kept = [t for i, t in enumerate(toks) if i not in covered]
        if not toks or not expect_kept:
            assert d not in clean  # no-token or fully-covered docs drop
        else:
            assert clean[d]["CLEAN_TEXT"] == " ".join(expect_kept)
            assert clean[d]["N_TOKENS_KEPT"] == len(expect_kept)
            assert clean[d]["N_TOKENS_DROPPED"] == len(covered)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ref=CORPUS, batch=CORPUS, k=st.integers(min_value=2, max_value=3))
def test_substring_novelty_matches_brute_force(spark, ref, batch, k):
    from aws_glue_cdc_metrics_job_spark.operators.dedup import substring_hash_index

    ref = {f"r_{d}": t for d, t in ref.items()}  # disjoint id spaces
    ix = substring_hash_index(_df(spark, ref), k=k)
    got = {
        r["doc_id"]: (r["N_WINDOWS"], r["N_SEEN"], r["NOVELTY_PPM"])
        for r in substring_novelty(_df(spark, batch), ix, k=k).collect()
    }
    ref_wins = {
        tuple(toks[i : i + k])
        for toks in ref.values()
        for i in range(len(toks) - k + 1)
    }
    for d, toks in batch.items():
        ws = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if not ws:
            assert d not in got
            continue
        seen = sum(1 for w in ws if w in ref_wins)
        assert got[d] == (
            len(ws),
            seen,
            (len(ws) - seen) * 1_000_000 // len(ws),
        )
