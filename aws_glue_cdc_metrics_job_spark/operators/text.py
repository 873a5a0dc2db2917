"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, fingerprinting.

All pure SQL expressions (codegen'd, no UDFs): at 100TB these run inside the
parquet scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import rhu
from .dedup import normalized_text

# Small English function-word set for the stopword-ratio features. The point
# is determinism + cheapness, not linguistic accuracy.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")


def tokens(text_col: str = "text") -> F.Column:
    """Whitespace tokens of normalized text (empty string -> empty array)."""
    return F.filter(F.split(normalized_text(text_col), " "), lambda t: t != "")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char lengths, average token length."""
    t = tokens(text_col)
    return (
        df.withColumn("__t", t)
        .withColumn("N_TOKENS", F.size("__t").cast("long"))
        .withColumn("N_CHARS_RAW", F.length(F.col(text_col)).cast("long"))
        .withColumn(
            "AVG_TOKEN_LEN",
            rhu(
                F.when(
                    F.col("N_TOKENS") > 0,
                    F.aggregate("__t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
                    / F.col("N_TOKENS"),
                ),
                6,
            ),
        )
        .drop("__t")
    )


def stopword_ratio(text_col: str = "text", stopwords: tuple[str, ...] = EN_STOPWORDS) -> F.Column:
    t = tokens(text_col)
    n = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    return F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length score (saturating at 200
    tokens), stopword ratio, their blend, and a keep/drop flag. The shape
    (not the constants) is what a real corpus filter looks like."""
    t = tokens(text_col)
    n = F.size(t)
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    stop = stopword_ratio(text_col)
    score = rhu(0.7 * len_score + 0.3 * stop, 6)
    return (
        df.withColumn("N_TOKENS", n.cast("long"))
        .withColumn("STOPWORD_RATIO", rhu(stop, 6))
        .withColumn("QUALITY_SCORE", score)
        .withColumn("KEEP", score >= 0.1)
    )


def language_guess(df: DataFrame, text_col: str = "text", threshold: float = 0.08) -> DataFrame:
    """N-gram-free stopword-ratio language ID: tag 'en' when the English
    function-word ratio clears the threshold. (The test corpus is synthetic
    with a shared vocabulary, so accuracy is incidental; the operator shape
    -- cheap, deterministic, scan-stage -- is the point.)"""
    stop = stopword_ratio(text_col)
    return df.withColumn("EN_STOP_RATIO", rhu(stop, 6)).withColumn(
        "LANG_GUESS", F.when(stop >= threshold, "en").otherwise("unknown")
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Within-document repetition profile -- the standard corpus-quality
    signals for detecting boilerplate/templated text (the shape of the
    MassiveText/Gopher repetition filters):

    - ``DUP_GRAM_RATIO``: fraction of word ``n``-grams that are repeats of
      an earlier n-gram in the same document (1 - distinct/total).
    - ``TOP_TOKEN_SHARE``: share of all tokens taken by the single most
      frequent token.

    One narrow explode of the token stream feeds both aggregations; grams
    are carried as strings so the DuckDB oracle reproduces the distinct
    count exactly (at 100TB swap the gram string for xxhash64 -- same plan,
    8-byte shuffle keys). Everything stays whole-stage codegen; the only
    shuffles are the two per-document aggregations."""
    ex = df.select(
        F.col(id_col), F.posexplode(F.split(normalized_text(text_col), " ")).alias("__pos", "__tok")
    ).filter(F.col("__tok") != "")
    tok_counts = (
        ex.groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.sum("__c").alias("N_TOKENS"), F.max("__c").alias("__top"))
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    grams = [F.col("__tok")] + [F.lead("__tok", i).over(w) for i in range(1, n)]
    gram_stats = (
        ex.select(F.col(id_col), F.concat_ws(" ", *grams).alias("__g"), grams[-1].alias("__last"))
        .filter(F.col("__last").isNotNull())
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("N_GRAMS"), F.countDistinct("__g").alias("N_DISTINCT_GRAMS"))
    )
    share = F.when(
        F.col("N_TOKENS") > 0, F.col("__top").cast("double") / F.col("N_TOKENS")
    ).otherwise(F.lit(0.0))
    dup = F.when(
        F.col("N_GRAMS") > 0,
        1.0 - F.col("N_DISTINCT_GRAMS").cast("double") / F.col("N_GRAMS"),
    ).otherwise(F.lit(0.0))
    return (
        df.join(tok_counts, id_col, "left")
        .join(gram_stats, id_col, "left")
        .na.fill({"N_TOKENS": 0, "N_GRAMS": 0, "N_DISTINCT_GRAMS": 0})
        .withColumn("TOP_TOKEN_SHARE", rhu(share, 6))
        .withColumn("DUP_GRAM_RATIO", rhu(dup, 6))
        .drop("__top")
    )


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
# marks -- the shape (not the vocab) of a GPT-2-style pre-tokenizer split.
# ASCII classes only so the Java (Spark) and RE2 (DuckDB) regex dialects
# agree exactly.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


# PII patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): char classes, bounded repetition, \d, \b.
# No lookaround (RE2 lacks it), no backrefs. Order matters: emails first
# (their local parts contain digits a later pattern could eat), then IPs
# (dotted quads; the dot keeps them out of the phone class), then phones.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+?\d[\d\- ]{7,}\d"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "SCRUBBED",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Replace PII spans (emails, IPv4 addresses, phone-shaped digit runs)
    with typed placeholder tokens ``<EMAIL>``/``<IPV4>``/``<PHONE>`` -- the
    standard pre-training redaction pass. A chain of regexp_replace
    projections: pure codegen in the scan stage, no shuffle, linear in
    corpus bytes; at 100 TB this runs at parquet-scan speed alongside the
    other per-document profiling expressions."""
    col = F.col(text_col)
    for name, pat in patterns:
        col = F.regexp_replace(col, pat, f"<{name}>")
    return df.withColumn(out_col, col)


def regex_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting with a BPE-ish regex: total pre-tokens plus
    alpha/digit/punctuation breakdowns, each a codegen'd
    regexp_extract_all at scan stage.

    The three classes partition BPE_ISH_PATTERN's alternation (a run can
    only match one class, and classes can't merge across runs), so the
    total is their sum -- three regex passes over the text, not four.
    Regex cost is per-char and dominates this operator at scale (bench:
    near-linear in corpus size once past fixed overhead)."""
    def n(pattern: str) -> F.Column:
        return F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))).cast("long")

    return (
        df.withColumn("N_ALPHA_TOKENS", n(r"[A-Za-z]+"))
        .withColumn("N_DIGIT_TOKENS", n(r"[0-9]+"))
        .withColumn("N_PUNCT_TOKENS", n(r"[^A-Za-z0-9\s]"))
        .withColumn(
            "N_BPE_TOKENS",
            (F.col("N_ALPHA_TOKENS") + F.col("N_DIGIT_TOKENS") + F.col("N_PUNCT_TOKENS")).cast("long"),
        )
    )


def vocab_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", top_k: int = 50) -> DataFrame:
    """Corpus vocabulary statistics: for the ``top_k`` tokens by document
    frequency, the term frequency (total occurrences) and document frequency
    (docs containing it). The first step of vocabulary construction /
    BPE-corpus profiling.

    Two-level aggregation: explode once, collapse to per-(doc, token) counts
    (partial aggregation runs map-side inside the scan stage), then a single
    shuffle on token for the corpus rollup -- the exploded token stream is
    never shuffled. Tiebreak on the unique token string keeps top-k
    deterministic across engines."""
    per_doc = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("TOKEN"))
        .groupBy(id_col, "TOKEN")
        .agg(F.count("*").alias("__tf"))
    )
    return (
        per_doc.groupBy("TOKEN")
        .agg(
            F.sum("__tf").cast("long").alias("TERM_FREQ"),
            F.count("*").cast("long").alias("DOC_FREQ"),
        )
        .orderBy(F.col("DOC_FREQ").desc(), F.col("TOKEN"))
        .limit(top_k)
    )


def heavy_hitters(df: DataFrame, text_col: str = "text", denom: int = 200) -> DataFrame:
    """Exact corpus heavy hitters: tokens accounting for at least ``1/denom``
    of all token occurrences. One hash aggregation over the exploded token
    stream (map-side partial combine collapses repeats inside the scan
    stage), then a broadcast of the single-row total -- the threshold
    compare is exact integer arithmetic (``n * denom >= total``), no float
    boundary flake. Output cardinality is bounded by ``denom`` rows by
    construction. For streams/shards where even one exact pass is too
    expensive, the mergeable summary form is :func:`mg_token_summary`."""
    counts = (
        df.select(F.explode(tokens(text_col)).alias("TOKEN"))
        .groupBy("TOKEN")
        .agg(F.count(F.lit(1)).cast("long").alias("N"))
    )
    total = counts.agg(F.sum("N").alias("__TOT"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("N") * denom >= F.col("__TOT"))
        .select("TOKEN", "N", rhu(F.col("N") / F.col("__TOT"), 6).alias("SHARE"))
    )


def mg_token_summary(
    df: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 32,
) -> DataFrame:
    """Mergeable Misra-Gries heavy-hitter summary: per shard, the classic
    k-counter one-pass MG sketch; summaries from different shards (or
    different batch deliveries) merge by summing counters and re-pruning
    (:func:`mg_merge`), preserving the deterministic guarantee that any
    token with true frequency > N/(k+1) survives with undercount at most
    N/(k+1) (Agarwal et al., "Mergeable Summaries", PODS 2012).

    The token stream never shuffles: sharding is by ``id_col`` hash, so
    each shard's MG pass runs where the docs already sit (one exchange of
    doc-sized rows at worst), and only shards x k counter rows leave the
    Arrow stage. Stream order within a shard is fixed to (doc, position),
    making the summary -- not just its guarantee -- reproducible.

    Returns (SHARD int, TOKEN string, C long)."""
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(text_col)).alias("__pos", "TOKEN"),
    ).withColumn("SHARD", F.pmod(F.xxhash64(F.col("__id")), F.lit(shards)).cast("int"))

    def mg(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__id", "__pos"])
        counters: dict[str, int] = {}
        for t in pdf["TOKEN"]:
            if t in counters:
                counters[t] += 1
            elif len(counters) < k:
                counters[t] = 1
            else:
                for key in list(counters):
                    counters[key] -= 1
                    if counters[key] == 0:
                        del counters[key]
        shard = int(pdf["SHARD"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {"SHARD": shard, "TOKEN": list(counters), "C": list(counters.values())}
        )

    return tok.groupBy("SHARD").applyInPandas(mg, "SHARD int, TOKEN string, C long")


def mg_merge(summaries: DataFrame, k: int = 100) -> DataFrame:
    """Merge MG summaries (any number of shards/batches): sum counters per
    token, then subtract the (k+1)-th largest merged count and drop
    non-positive counters -- the PODS'12 merge that keeps the summary at k
    counters with the error bounds of a single pass over the concatenated
    stream. Runs entirely on summary-sized data (<= shards*k rows; the one
    global window is bounded by that contract). Returns (TOKEN, C)."""
    merged = summaries.groupBy("TOKEN").agg(F.sum("C").alias("C"))
    w = Window.orderBy(F.col("C").desc(), F.col("TOKEN"))
    ranked = merged.withColumn("__rn", F.row_number().over(w))
    # one-row threshold frame even when there is no (k+1)-th counter
    thr = (
        ranked.filter(F.col("__rn") == k + 1)
        .agg(F.coalesce(F.max("C"), F.lit(0)).alias("__thr"))
    )
    return (
        ranked.crossJoin(F.broadcast(thr))
        .withColumn("C", F.col("C") - F.col("__thr"))
        .filter((F.col("C") > 0) & (F.col("__rn") <= k))
        .select("TOKEN", "C")
    )


def quality_top_fraction(
    df: DataFrame,
    fraction: float = 0.5,
    id_col: str = "doc_id",
    partition_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
) -> DataFrame:
    """Keep the top ``fraction`` of documents per group by quality score --
    the rank-based corpus filter ("top half of each language"). Rank-based
    (row_number over score desc, id asc) rather than a percentile threshold:
    integer comparisons have no interpolation ulp at the cut boundary, so
    the kept set is deterministic and engine-portable. One shuffle on the
    group key; both window functions share it."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    scored = quality_score(df, text_col)
    w = Window.partitionBy(*partition_cols).orderBy(
        F.col("QUALITY_SCORE").desc(), F.col(id_col)
    )
    grp = Window.partitionBy(*partition_cols)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count("*").over(grp))
        .filter(F.col("__rn") <= F.ceil(F.col("__cnt") * F.lit(fraction)))
        .drop("__rn", "__cnt")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a bag of query terms.

    Classic Robertson/Sparck-Jones BM25 with the +1 idf smoothing
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5))). Shape: ONE token explode
    feeds both the per-doc query-term tf (filtered to the query bag before
    any shuffle) and nothing else -- doc lengths ride along from size();
    per-term document frequencies and the global (N, avgdl) row are
    dimension-sized and broadcast, so the corpus never shuffles more than
    its per-doc query-term hits. Ranking uses the 6-dp-rounded score with
    an id tiebreak so the top-k set is engine-portable.

    The per-doc score sums its per-term contributions in FIXED query-term
    order (conditional aggs over singleton (doc, term) groups, then a
    left-to-right add) -- a plain SUM over the term rows would accumulate
    in partition order and drift in the last ulp between engines.

    Returns (id_col, SCORE) rows, highest first."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    query_terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__t")).select(
        F.col(id_col), F.size("__t").cast("double").alias("__dl"), F.col("__t")
    )
    hits = (
        base.select(F.col(id_col), F.col("__dl"), F.explode("__t").alias("TERM"))
        .filter(F.col("TERM").isin(*query_terms))
        .groupBy(id_col, "__dl", "TERM")
        .agg(F.count("*").cast("double").alias("__tf"))
    )
    stats = base.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    dfreq = hits.groupBy("TERM").agg(F.countDistinct(id_col).cast("double").alias("__df"))
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    per_term = (
        hits.join(F.broadcast(dfreq), "TERM")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__s",
            idf
            * (F.col("__tf") * (k1 + 1))
            / (F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))),
        )
    )
    per_term_cols = [
        F.sum(F.when(F.col("TERM") == t, F.col("__s"))).alias(f"__s{i}")
        for i, t in enumerate(query_terms)
    ]
    total = F.coalesce(F.col("__s0"), F.lit(0.0))
    for i in range(1, len(query_terms)):
        total = total + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    scored = (
        per_term.groupBy(id_col)
        .agg(*per_term_cols)
        .select(F.col(id_col), rhu(total, 6).alias("SCORE"))
    )
    return scored.orderBy(F.col("SCORE").desc(), F.col(id_col)).limit(k)


def encode_token_ids(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "TOKEN",
    vocab_id_col: str = "TOKEN_ID",
    oov_id: int = -1,
) -> DataFrame:
    """Encode each document's token stream to an ``array<bigint>`` of ids
    using a vocabulary frame -- the step between tokenization and sequence
    packing. Out-of-vocabulary tokens map to ``oov_id`` (a real encoder
    swaps in a subword fallback; the plumbing is identical).

    Shape: posexplode keeps every token's position, the vocabulary is
    dimension-sized by definition and broadcasts (left join, no corpus
    shuffle for the lookup), and the array reassembles with
    array_sort(collect_list(struct(pos, id))) -- order restored by the
    struct's leading pos field, so the result is deterministic at any
    partitioning even though collect_list itself is not.

    Returns (id_col, TOKEN_IDS, N_TOKENS); empty docs yield empty arrays
    (preserved via the left join back to the input keys)."""
    pos = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__pos", token_col)
    )
    looked = (
        pos.join(F.broadcast(vocab.select(token_col, vocab_id_col)), token_col, "left")
        .select(
            F.col(id_col),
            F.col("__pos"),
            F.coalesce(F.col(vocab_id_col), F.lit(oov_id)).cast("long").alias("__tid"),
        )
    )
    encoded = looked.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__tid"))), lambda s: s["__tid"]
        ).alias("TOKEN_IDS")
    )
    return (
        df.select(id_col)
        .join(encoded, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("TOKEN_IDS"), F.array().cast("array<bigint>")).alias("TOKEN_IDS"),
        )
        .withColumn("N_TOKENS", F.size("TOKEN_IDS").cast("long"))
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model surprisal per document -- the CCNet-style
    "perplexity" quality signal, with the LM trained on the corpus itself:
    a document whose tokens are globally rare scores high (junk, noise,
    wrong language); formulaic text scores low.

    score(doc) = mean over token occurrences of -ln(count(tok) / total)

    Shape: one token explode feeding BOTH the corpus frequency table (hash
    agg with map-side partial collapse -- vocab-sized result, typically
    broadcastable back) and the per-doc stream; one join on the token, one
    per-doc aggregation. No driver state, no UDFs.

    Determinism: each token's surprisal is rounded half-up to 9 places and
    summed as an exact decimal, so the per-doc mean is independent of
    partition/accumulation order in any engine (functions/numeric.py
    rationale); the mean is reported at 6 places.

    Returns (id_col, N_TOKENS, AVG_NEG_LOGPROB); token-less docs are
    dropped (no occurrences to average)."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    total = freq.agg(F.sum("__cnt").alias("__total"))
    srp = rhu(F.log(F.col("__total")) - F.log(F.col("__cnt")), 9)
    scored = (
        toks.join(freq, "__tok")
        .join(F.broadcast(total))
        .withColumn("__srp", srp.cast("decimal(28,9)"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("N_TOKENS"),
        rhu(
            (F.sum("__srp").cast("double")) / F.count(F.lit(1)), 6
        ).alias("AVG_NEG_LOGPROB"),
    )


# --- byte-pair-encoding: distributed pair counting + iterative merge
# training. The symbol tables live in DataFrames; only the single winning
# pair per round crosses to the driver (a scalar, like the k-means
# convergence witness).


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct normalized words with corpus multiplicities -- BPE's
    working set. All downstream per-round work is proportional to the
    DISTINCT vocabulary, not the corpus (the classic BPE trick)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("WORD"))
        .groupBy("WORD")
        .agg(F.count(F.lit(1)).alias("N"))
    )


def bpe_pair_counts(word_counts: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies over the initial character
    alphabet, weighted by word multiplicity. One index explode over
    distinct words + one hash agg.

    Returns (LEFT_SYM, RIGHT_SYM, N_PAIRS)."""
    w = F.col("WORD")
    idx = F.explode(F.sequence(F.lit(1), F.length(w) - 1)).alias("__i")
    pairs = word_counts.filter(F.length(w) >= 2).select(
        w, F.col("N"), idx
    )
    return (
        pairs.select(
            w.substr(F.col("__i"), F.lit(1)).alias("LEFT_SYM"),
            w.substr(F.col("__i") + 1, F.lit(1)).alias("RIGHT_SYM"),
            F.col("N"),
        )
        .groupBy("LEFT_SYM", "RIGHT_SYM")
        .agg(F.sum("N").cast("long").alias("N_PAIRS"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on the corpus. Each round: count
    adjacent symbol pairs over the (distinct-word, multiplicity) table,
    pick the most frequent (ties broken lexicographically for determinism),
    and apply the merge left-to-right non-overlapping within every word --
    standard BPE semantics (Sennrich et al. 2016, public algorithm).

    Distribution: the symbol table stays a DataFrame throughout; the merge
    application is an Arrow ``mapInPandas`` over symbol arrays (per-row
    Python on DISTINCT WORDS only, the working set BPE is designed to keep
    small); each round localCheckpoints to truncate lineage like the
    k-means/clustering loops. Only the argmax pair (one row) is collected
    per round. Stops early when no pair reaches ``min_pair_count``."""
    import pandas as pd

    spark = df.sparkSession
    words = bpe_word_counts(df, text_col).filter(F.length("WORD") >= 2)
    # split keeps a trailing empty match (Spark split uses limit -1); drop it
    syms = words.select(
        "N",
        F.filter(F.split(F.col("WORD"), "(?!^)"), lambda s: s != "").alias("SYMS"),
    ).localCheckpoint()

    out_schema = "N long, SYMS array<string>"
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = (
            syms.select(
                "N",
                F.explode(
                    F.expr(
                        "transform(slice(SYMS, 1, size(SYMS) - 1),"
                        " (s, i) -> struct(s as l, SYMS[i + 1] as r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("N").alias("c"))
            .filter(F.col("c") >= min_pair_count)
        )
        top = pair_counts.orderBy(F.desc("c"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))

        def apply_merge(batches, _l=left, _r=right):
            for pdf in batches:
                merged_col = []
                for syms_arr in pdf["SYMS"]:
                    out, i, n = [], 0, len(syms_arr)
                    while i < n:
                        if i + 1 < n and syms_arr[i] == _l and syms_arr[i + 1] == _r:
                            out.append(_l + _r)
                            i += 2
                        else:
                            out.append(syms_arr[i])
                            i += 1
                    merged_col.append(out)
                yield pd.DataFrame({"N": pdf["N"], "SYMS": merged_col})

        syms = syms.mapInPandas(apply_merge, schema=out_schema).localCheckpoint()
    return merges


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking -- the retrieval/embedding prep
    step (RAG corpora, context-window packing feeds): window w covers
    normalized-whitespace tokens [w*stride, w*stride + chunk_tokens), so
    consecutive chunks share chunk_tokens - stride tokens of overlap and
    every token lands in at least one chunk. The final window may be a
    runt; token-free docs produce no rows.

    One posexplode of the per-doc start list (output-proportional: the
    token array is sliced per window, never re-tokenized), all codegen,
    no shuffle -- chunking runs inside the scan stage however large the
    corpus, and the output inherits the input's partitioning.

    A trailing start whose window would add NO tokens beyond the previous
    chunk's coverage (possible when the runt is shorter than the overlap)
    is dropped: such a chunk is a pure suffix-duplicate of its
    predecessor, and duplicate retrieval units mean duplicate embeddings
    and duplicate hits. Kept starts are s == 0 or
    s < n - (chunk_tokens - stride).

    Returns (id_col, CHUNK_IDX int, N_TOKENS long, CHUNK_TEXT)."""
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(f"chunk_tokens and stride must be >= 1, got {chunk_tokens}/{stride}")
    if stride > chunk_tokens:
        raise ValueError(f"stride {stride} > chunk_tokens {chunk_tokens} would drop tokens")
    overlap = chunk_tokens - stride
    t = (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .withColumn("__n", F.size("__t"))
        .filter(F.col("__n") > 0)
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride)),
        lambda s: (s == 0) | (s < F.col("__n") - overlap),
    )
    ex = t.select(
        F.col(id_col),
        "__t",
        F.posexplode(starts).alias("CHUNK_IDX", "__start"),
    )
    sl = F.slice("__t", F.col("__start") + 1, chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("CHUNK_IDX"),
        F.size(sl).cast("long").alias("N_TOKENS"),
        F.concat_ws(" ", sl).alias("CHUNK_TEXT"),
    )


def segment_language_profile(
    df: DataFrame,
    segment_tokens: int = 32,
    threshold: float = 0.08,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment-level language profile for MIXED-language documents: split
    each doc into non-overlapping token windows (chunk_documents with
    stride == chunk), run the scan-stage language heuristic per segment,
    and roll up a per-doc profile -- a doc-level tag alone misclassifies
    half-and-half documents, and per-segment ratios are what a curation
    filter thresholds ("drop docs under 70% primary-language segments").

    Same shape economics as chunking itself: one posexplode + one keyed
    aggregation; segments never leave their doc's partition path.

    Returns (id_col, N_SEGMENTS, N_EN_SEGMENTS, EN_SEGMENT_RATIO,
    DOC_LANG_GUESS) -- majority tag, 'en' when >= half the segments
    clear the stopword threshold."""
    segs = chunk_documents(
        df, chunk_tokens=segment_tokens, stride=segment_tokens, id_col=id_col, text_col=text_col
    )
    tagged = language_guess(
        segs.withColumnRenamed("CHUNK_TEXT", "__seg"), text_col="__seg", threshold=threshold
    )
    en = F.sum(F.when(F.col("LANG_GUESS") == "en", 1).otherwise(0)).cast("long")
    n = F.count(F.lit(1)).cast("long")
    out = tagged.groupBy(id_col).agg(
        n.alias("N_SEGMENTS"),
        en.alias("N_EN_SEGMENTS"),
    )
    ratio = F.col("N_EN_SEGMENTS") / F.col("N_SEGMENTS")
    return out.select(
        F.col(id_col),
        "N_SEGMENTS",
        "N_EN_SEGMENTS",
        rhu(ratio, 6).alias("EN_SEGMENT_RATIO"),
        F.when(ratio >= 0.5, "en").otherwise("unknown").alias("DOC_LANG_GUESS"),
    )


def collocation_lift(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Adjacent-bigram collocation mining: for every token pair (a, b)
    occurring consecutively at least ``min_count`` times, the observed/
    expected ratio ``lift = N_ab * N / (N_a * N_b)`` -- the integer-
    arithmetic monotone transform of PMI (PMI = ln(lift)), kept log-free
    so the score is pure exact-count arithmetic and bit-identical in
    every engine (ln is not correctly-rounded-guaranteed across libms).

    Adjacent pairs only, so the stream is LINEAR in corpus tokens (never
    a within-doc cross product): one posexplode + a doc-keyed lead()
    window (the winnowing/repetition shuffle shape), then vocab-sized
    count aggregations and two equi-joins of the bigram table against
    unigram counts. The min_count filter prunes the bigram table BEFORE
    the joins.

    Returns (TOKEN_A, TOKEN_B, N_AB, N_A, N_B, LIFT) with LIFT the ratio
    rounded half-up to 6 dp."""
    ex = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__pos", "__tok")
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    pairs = ex.withColumn("__next", F.lead("__tok").over(w)).filter(
        F.col("__next").isNotNull()
    )
    uni = ex.groupBy(F.col("__tok").alias("TOKEN")).agg(F.count(F.lit(1)).alias("N_TOK"))
    total = ex.agg(F.count(F.lit(1)).cast("double").alias("__N"))
    big = (
        pairs.groupBy(
            F.col("__tok").alias("TOKEN_A"), F.col("__next").alias("TOKEN_B")
        )
        .agg(F.count(F.lit(1)).alias("N_AB"))
        .filter(F.col("N_AB") >= min_count)
    )
    ua = uni.select(F.col("TOKEN").alias("TOKEN_A"), F.col("N_TOK").alias("N_A"))
    ub = uni.select(F.col("TOKEN").alias("TOKEN_B"), F.col("N_TOK").alias("N_B"))
    joined = big.join(ua, "TOKEN_A").join(ub, "TOKEN_B").crossJoin(F.broadcast(total))
    lift = (F.col("N_AB").cast("double") * F.col("__N")) / (
        F.col("N_A").cast("double") * F.col("N_B").cast("double")
    )
    return joined.select(
        "TOKEN_A",
        "TOKEN_B",
        "N_AB",
        "N_A",
        "N_B",
        rhu(lift, 6).alias("LIFT"),
    )


def source_datasheet(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus datasheet -- the one-pass summary a dataset card
    reports per subset: document and token volume, length distribution
    anchors, quality/language means, and the exact content-duplication
    rate (1 - distinct fingerprints / docs).

    ONE aggregation over per-document scan-stage expressions (quality
    and fingerprint reuse the exact operators the pipeline filters with,
    so the datasheet can never disagree with curation), plus the
    fingerprint distinct inside the same groupBy via count_distinct --
    per-source rows however large the corpus. All means on the decimal
    convention; the duplication ratio is exact-count arithmetic.

    Returns (group_col, N_DOCS, N_TOKENS, AVG_TOKENS, MAX_TOKENS,
    AVG_QUALITY, EN_SHARE, N_DISTINCT_TEXTS, DUP_RATIO)."""
    scored = language_guess(quality_score(df, text_col), text_col)
    from .dedup import fingerprint

    base = fingerprint(scored, text_col)
    n = F.count(F.lit(1)).cast("long")
    toks = F.sum("N_TOKENS").cast("long")
    distinct_texts = F.count_distinct("FINGERPRINT").cast("long")
    return (
        base.groupBy(group_col)
        .agg(
            n.alias("N_DOCS"),
            toks.alias("N_TOKENS"),
            rhu(F.sum("N_TOKENS") / F.count(F.lit(1)), 6).alias("AVG_TOKENS"),
            F.max("N_TOKENS").cast("long").alias("MAX_TOKENS"),
            rhu(
                F.sum(F.col("QUALITY_SCORE").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("AVG_QUALITY"),
            rhu(
                F.sum(F.when(F.col("LANG_GUESS") == "en", 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("EN_SHARE"),
            distinct_texts.alias("N_DISTINCT_TEXTS"),
        )
        .withColumn(
            "DUP_RATIO",
            rhu(1 - F.col("N_DISTINCT_TEXTS") / F.col("N_DOCS").cast("double"), 6),
        )
    )


def df_table(
    df: DataFrame,
    top: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus document-frequency table: for each token, the number of
    documents containing it and its exact ppm document rate -- the IDF
    side of TF-IDF as reusable state (BM25 here recomputes it inline;
    this materializes it for ad-hoc term weighting and stoplist mining).
    Rates are exact integers (ppm), so the table is engine-portable with
    no log() in sight; consumers apply their own idf transform.

    Shape: per-doc array_distinct BEFORE the explode (each doc emits each
    token once, bounding the stream at sum of per-doc vocabularies), one
    token-keyed count, one broadcast scalar for N, TakeOrdered top-k.

    Returns (TOKEN, DOC_FREQ, DF_PPM) for the ``top`` most common tokens
    (DOC_FREQ desc, TOKEN asc -- deterministic)."""
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
    ex = df.select(F.explode(F.array_distinct(tokens(text_col))).alias("TOKEN"))
    return (
        ex.groupBy("TOKEN")
        .agg(F.count(F.lit(1)).alias("DOC_FREQ"))
        # 1-row broadcast total (the skew_report pattern) -- an eager
        # df.count() here would scan the corpus a second time at plan
        # CONSTRUCTION and make the operator non-composable
        .join(n_docs)
        .withColumn("DF_PPM", F.expr("(DOC_FREQ * 1000000) div __n").cast("long"))
        .drop("__n")
        .orderBy(F.col("DOC_FREQ").desc(), "TOKEN")
        .limit(top)
    )


#: Rule names for gopher_rules_report (their violation predicates live
#: inline in that function) -- Gopher/C4-style quality gates kept as
#: exact integer arithmetic (no ratios, so no cross-engine float
#: rounding): mean token length bounds compare sum_len against
#: bound*count.
GOPHER_RULES = (
    "too_few_tokens",
    "too_many_tokens",
    "mean_token_len_lt3",
    "mean_token_len_gt10",
    "no_stopword",
)


def gopher_rules_report(
    df: DataFrame,
    min_tokens: int = 50,
    max_tokens: int = 2500,
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style corpus quality report: how many documents violate each
    hard filter rule (Rae et al. 2021 'Scaling Language Models', app. A:
    word-count bounds, mean-word-length bounds, stopword presence), as
    counts and exact ppm shares -- the pre-filter audit a curation run
    prints before dropping anything. One scan computes every rule's
    per-doc flag (conditional sums over the same token array), one
    1-row aggregate, unpivoted to long form driver-side constants (no
    second scan).

    Returns (RULE, N_VIOLATIONS, SHARE_PPM) ordered by RULE."""
    t = tokens(text_col)
    n = F.size(t)
    sum_len = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    n_stop = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    flags = df.select(
        (n < min_tokens).cast("long").alias("too_few_tokens"),
        (n > max_tokens).cast("long").alias("too_many_tokens"),
        ((n > 0) & (sum_len < 3 * n)).cast("long").alias("mean_token_len_lt3"),
        ((n > 0) & (sum_len > 10 * n)).cast("long").alias("mean_token_len_gt10"),
        (n_stop == 0).cast("long").alias("no_stopword"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(r).alias(r) for r in GOPHER_RULES],
    )
    long = agg.unpivot(["__n"], list(GOPHER_RULES), "RULE", "N_VIOLATIONS")
    return (
        long.select(
            "RULE",
            F.col("N_VIOLATIONS").cast("long").alias("N_VIOLATIONS"),
            F.expr("(N_VIOLATIONS * 1000000) div __n").cast("long").alias("SHARE_PPM"),
        )
        .orderBy("RULE")
    )


# --- corpus-level language modeling & data selection -----------------------


def word_bigrams(text_col: str = "text") -> F.Column:
    """Adjacent-token bigram structs (w1, w2) of the normalized token
    stream, built shuffle-free from the token array itself: zip the array
    with its 1-shifted slice (zip_with pads the shorter side with NULL;
    the padded tail row is dropped by the w2 filter). Pure collection
    expressions -- codegen'd, no explode until the caller asks."""
    return _bigrams_of(tokens(text_col))


def _bigrams_of(t: F.Column) -> F.Column:
    """word_bigrams over an ALREADY-TOKENIZED array expression -- the
    tokenize-once entry point for pipelines that materialize the token
    arrays and feed several models from the same pass."""
    shifted = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    pairs = F.zip_with(t, shifted, lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    return F.filter(pairs, lambda p: p["w2"].isNotNull())


def dsir_weights(
    df: DataFrame,
    target: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    seed: str = "dsir0",
    portable: bool = True,
    tokens_col: str | None = None,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023) log
    importance weights over hashed word-bigram features: docs whose hashed
    n-gram profile looks like the ``target`` subcorpus (e.g. a trusted
    high-quality slice) get high LOG_WEIGHT; out-of-distribution docs go
    negative. The standard cheap data-selection signal for pretraining
    mixes -- resample the corpus with probability proportional to
    exp(LOG_WEIGHT) (or keep the top fraction).

    log w(doc) = sum over bigram occurrences b of
                 ln p_target(bucket(b)) - ln p_raw(bucket(b))
    with Laplace-smoothed bucket unigram models (alpha=1).

    Shape: ONE bigram explode feeds both models via conditional
    aggregation (raw count + target count in the same hash-agg pass); the
    ``buckets``-row ratio table broadcasts back onto the occurrence
    stream, so the whole operator is explode -> 2 broadcast joins -> one
    per-doc aggregation, no vocabulary-sized shuffle. Determinism: md5
    bucket hashing (engine-portable), per-occurrence log-ratio rounded
    half-up to 9 places and summed as DECIMAL(28,9) -- partition-order
    independent (functions/numeric.py rationale); LOG_WEIGHT reported at
    6 places.

    Returns (id_col, N_FEATURES, LOG_WEIGHT); docs with no bigram (< 2
    tokens) are dropped -- they carry no evidence either way."""
    # portable=True: md5 + hex parse, cross-engine-replayable bucketing
    # (the oracle recomputes identical buckets in DuckDB). portable=False:
    # one JVM xxhash64 per bigram -- same model semantics under a
    # different (still deterministic) feature hash, NOT oracle-replayable;
    # the 100TB default, same convention as sketches._cm_col.
    # tokens_col: consume a PRE-TOKENIZED array column instead of
    # re-normalizing/splitting text -- the tokenize-once contract for
    # composite pipelines (bigrams of the array are expression-identical
    # to bigrams of the text, so results cannot differ)
    bg = (
        _bigrams_of(F.col(tokens_col)) if tokens_col else word_bigrams(text_col)
    )
    bk = _dsir_bucket(seed, buckets, portable)
    occ = df.select(
        F.col(id_col),
        target.cast("boolean").alias("__is_t"),
        F.explode(bg).alias("__p"),
    ).select(id_col, "__is_t", bk.alias("__b"))
    # collapse the occurrence stream to (doc, bucket, multiplicity) BEFORE
    # any join: the log-ratio is constant per bucket, so sum(cnt * lr) ==
    # sum-over-occurrences(lr) exactly (decimal arithmetic), and the join
    # input shrinks from occurrence count to <= min(occurrences, buckets)
    # rows per doc.
    docbk = occ.groupBy(id_col, "__b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__nt"),
    )
    counts = docbk.groupBy("__b").agg(
        F.sum("__n").alias("__cr"),
        F.sum("__nt").alias("__ct"),
    )
    tot = counts.agg(F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt"))
    lr = rhu(
        F.log((F.col("__ct") + 1) / (F.col("__tt") + buckets))
        - F.log((F.col("__cr") + 1) / (F.col("__tr") + buckets)),
        9,
    )
    ratio = counts.join(F.broadcast(tot)).select("__b", lr.cast("decimal(28,9)").alias("__lr"))
    return (
        docbk.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__n").cast("long").alias("N_FEATURES"),
            # decimal(9,0) multiplicity keeps the product inside
            # DECIMAL(38,9) -- a bigint operand would trigger Spark's
            # precision-loss scale reduction and drift off the lattice
            rhu(
                F.sum(F.col("__n").cast("decimal(9,0)") * F.col("__lr")).cast("double"), 6
            ).alias("LOG_WEIGHT"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    tokens_col: str | None = None,
) -> DataFrame:
    """Interpolated bigram language-model surprisal per document -- the
    next step up from :func:`unigram_logprob` as a perplexity-style
    quality filter (KenLM-shaped, order 2): repeated formulaic word
    SEQUENCES score low even when each word is individually common.

    score(doc) = mean over bigram occurrences (w1, w2) of
                 -ln( lam * c(w1 w2)/c(w1 .)  +  (1-lam) * c(w2)/N )

    where c(w1 .) is the bigram-start count of w1, c(w2) the corpus
    occurrence count, N total tokens -- Jelinek-Mercer interpolation, so
    unseen-in-context words back off to the unigram model instead of -inf.

    Shape: one bigram explode + one token explode; the pair, start and
    unigram count tables are all vocabulary-bounded hash-aggs joined back
    onto the occurrence stream on their natural keys (at 100 TB these are
    shuffle hash joins on word keys; the occurrence stream never moves
    twice). Same decimal-lattice determinism as unigram_logprob.

    Returns (id_col, N_BIGRAMS, AVG_NEG_LOGPROB); docs with < 2 tokens
    are dropped."""
    # tokens_col: see dsir_weights -- the tokenize-once entry point
    bg = (
        _bigrams_of(F.col(tokens_col)) if tokens_col else word_bigrams(text_col)
    )
    occ = df.select(F.col(id_col), F.explode(bg).alias("__p")).select(
        id_col, F.col("__p.w1").alias("__w1"), F.col("__p.w2").alias("__w2")
    )
    # collapse to per-doc distinct bigrams with multiplicities before the
    # three model-table joins: the surprisal is constant per (w1, w2), so
    # sum(cnt * srp) over distinct triples equals the per-occurrence sum
    # exactly (decimal arithmetic) while the join input shrinks from
    # occurrence count to per-doc distinct-bigram count.
    docpair = occ.groupBy(id_col, "__w1", "__w2").agg(F.count(F.lit(1)).alias("__k"))
    pair = docpair.groupBy("__w1", "__w2").agg(F.sum("__k").alias("__c12"))
    starts = pair.groupBy("__w1").agg(F.sum("__c12").alias("__c1s"))
    toks = df.select(
        F.explode(F.col(tokens_col) if tokens_col else tokens(text_col)).alias("__w2")
    )
    uni = toks.groupBy("__w2").agg(F.count(F.lit(1)).alias("__c2"))
    n_tot = toks.agg(F.count(F.lit(1)).alias("__n"))
    p = F.lit(lam) * (F.col("__c12") / F.col("__c1s")) + F.lit(1.0 - lam) * (
        F.col("__c2") / F.col("__n")
    )
    scored = (
        docpair.join(pair, ["__w1", "__w2"])
        .join(starts, "__w1")
        .join(uni, "__w2")
        .join(F.broadcast(n_tot))
        .withColumn("__srp", rhu(-F.log(p), 9).cast("decimal(28,9)"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("__k").cast("long").alias("N_BIGRAMS"),
        # decimal(9,0) multiplicity: see dsir_weights precision note
        rhu(
            F.sum(F.col("__k").cast("decimal(9,0)") * F.col("__srp")).cast("double")
            / F.sum("__k"),
            6,
        ).alias("AVG_NEG_LOGPROB"),
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus with trained BPE merges (the apply side of
    :func:`bpe_train`): each word becomes its merged symbol sequence,
    applying the merge list in training order, each merge left-to-right
    non-overlapping -- exactly the loop bpe_train itself uses, so
    encode(train(corpus)) round-trips.

    Distribution: the Arrow kernel encodes each DISTINCT word once (the
    same vocabulary-bounded working set the trainer uses -- per-word cost
    is O(len * n_merges) however large the corpus), and the word ->
    pieces map joins back onto the token stream on the word key. The
    per-doc reassembly keeps token order via posexplode + array_sort
    (collect_list order is not deterministic under retries; sorted
    structs are).

    Returns (id_col, N_WORDS, N_PIECES, ENCODED): ENCODED joins pieces
    with spaces and words with ' | '. Not SQL-replayable (the iterative
    merge loop) -> rows-only driver check; exactness is pinned against a
    pure-Python reference in tests/test_text.py."""
    import pandas as pd

    def encode_words(batches):
        for pdf in batches:
            out = []
            for w in pdf["WORD"]:
                syms = list(w)
                for left, right in merges:
                    i, n, merged = 0, len(syms), []
                    while i < n:
                        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    syms = merged
                out.append(" ".join(syms))
            yield pd.DataFrame({"WORD": pdf["WORD"], "PIECES": out})

    vocab = df.select(F.explode(tokens(text_col)).alias("WORD")).distinct()
    pieces = vocab.mapInPandas(encode_words, schema="WORD string, PIECES string")
    toks = df.select(F.col(id_col), F.posexplode(tokens(text_col)).alias("__pos", "WORD"))
    return (
        toks.join(pieces, "WORD")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("N_WORDS"),
            F.sum(F.size(F.split(F.col("PIECES"), " "))).cast("long").alias("N_PIECES"),
            F.concat_ws(
                " | ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "PIECES"))),
                    lambda s: s["PIECES"],
                ),
            ).alias("ENCODED"),
        )
    )


def _dsir_bucket(seed: str, buckets: int, portable: bool) -> F.Column:
    """Bucket expression over an exploded bigram struct column ``__p``
    (shared by the fused scorer, the model builder and the online
    scorer, so all three land bigrams in identical buckets)."""
    if portable:
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("__p.w1"), F.col("__p.w2"), F.lit(seed))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(buckets),
        )
    return F.pmod(F.xxhash64("__p.w1", "__p.w2", F.lit(seed)), F.lit(buckets))


def dsir_model(
    df: DataFrame,
    target: F.Column,
    text_col: str = "text",
    buckets: int = 1024,
    seed: str = "dsir0",
    portable: bool = True,
) -> DataFrame:
    """The persistable DSIR state: the ``buckets``-row log-ratio table
    (BUCKET, LOG_RATIO) trained offline on a reference corpus -- the
    production split where the model is built once and every future
    delivery is scored against it (:func:`dsir_score`), e.g. inside a
    streaming foreachBatch. Same bucketing/smoothing/lattice as the
    fused :func:`dsir_weights`, so score-against-model reproduces the
    fused weights exactly on the training corpus (pinned in tests)."""
    occ = df.select(
        target.cast("boolean").alias("__is_t"),
        F.explode(word_bigrams(text_col)).alias("__p"),
    ).select("__is_t", _dsir_bucket(seed, buckets, portable).alias("__b"))
    counts = occ.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__ct"),
    )
    tot = counts.agg(F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt"))
    lr = rhu(
        F.log((F.col("__ct") + 1) / (F.col("__tt") + buckets))
        - F.log((F.col("__cr") + 1) / (F.col("__tr") + buckets)),
        9,
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            F.col("__b").alias("BUCKET"), lr.cast("decimal(28,9)").alias("LOG_RATIO")
        )
    )


def dsir_score(
    batch: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    seed: str = "dsir0",
    portable: bool = True,
) -> DataFrame:
    """Score a delivery against a trained :func:`dsir_model`: bucket the
    batch's bigrams (same seed/buckets/hash as training -- caller
    contract), broadcast-join the bucket-bounded model, sum per doc on
    the decimal lattice. O(batch) with no model rebuild; buckets absent
    from the model (possible when scoring unseen data against a stored
    table) contribute nothing rather than failing."""
    occ = batch.select(
        F.col(id_col), F.explode(word_bigrams(text_col)).alias("__p")
    ).select(id_col, _dsir_bucket(seed, buckets, portable).alias("__b"))
    docbk = occ.groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__n"))
    return (
        docbk.join(
            F.broadcast(model.select(F.col("BUCKET").alias("__b"), "LOG_RATIO")), "__b"
        )
        .groupBy(id_col)
        .agg(
            F.sum("__n").cast("long").alias("N_FEATURES"),
            rhu(
                F.sum(F.col("__n").cast("decimal(9,0)") * F.col("LOG_RATIO")).cast(
                    "double"
                ),
                6,
            ).alias("LOG_WEIGHT"),
        )
    )


def bigram_lm_model(
    df: DataFrame,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The persistable interpolated-bigram-LM state (the CCNet setup:
    train on a TRUSTED reference corpus once, score every delivery):
    ``(pairs, unigrams)`` -- (W1, W2, C12, C1S) pair counts with their
    start totals denormalized in, and (W, C, N) unigram counts with the
    corpus token total denormalized in. Both vocabulary-bounded, both
    plain parquet-writable."""
    occ = df.select(F.explode(word_bigrams(text_col)).alias("__p")).select(
        F.col("__p.w1").alias("W1"), F.col("__p.w2").alias("W2")
    )
    pair = occ.groupBy("W1", "W2").agg(F.count(F.lit(1)).alias("C12"))
    starts = pair.groupBy("W1").agg(F.sum("C12").alias("C1S"))
    pairs = pair.join(starts, "W1").select("W1", "W2", "C12", "C1S")
    toks = df.select(F.explode(tokens(text_col)).alias("W"))
    uni = toks.groupBy("W").agg(F.count(F.lit(1)).alias("C"))
    n_tot = uni.agg(F.sum("C").alias("N"))
    unigrams = uni.join(F.broadcast(n_tot)).select("W", "C", "N")
    return pairs, unigrams


def bigram_lm_score(
    batch: DataFrame,
    pairs: DataFrame,
    unigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Score a delivery against a trained :func:`bigram_lm_model` with
    out-of-vocabulary backoff: unseen (w1, w2) pairs contribute only the
    interpolated unigram term, and unseen w2 falls back to a half-count
    (0.5/N, the add-half unseen convention), so every surprisal is
    finite --

        p = lam * (C12/C1S | 0)  +  (1-lam) * ((C2 | 0.5) / N)

    Same per-occurrence 9-place lattice + decimal sums as
    :func:`bigram_logprob`; on the training corpus itself (no OOV hits)
    score-against-model reproduces the fused operator exactly (pinned in
    tests). O(batch) joins against the vocabulary-bounded model tables;
    the corpus never re-trains online."""
    occ = batch.select(F.col(id_col), F.explode(word_bigrams(text_col)).alias("__p")).select(
        id_col, F.col("__p.w1").alias("W1"), F.col("__p.w2").alias("W2")
    )
    docpair = occ.groupBy(id_col, "W1", "W2").agg(F.count(F.lit(1)).alias("__k"))
    # 1-row broadcast attach (counted in the plan-guard whitelist; a
    # literal-keyed equi-join folds back to the same nested-loop shape)
    n_row = F.broadcast(unigrams.select("N").limit(1))
    scored = (
        docpair.join(pairs, ["W1", "W2"], "left")
        .join(unigrams.select(F.col("W").alias("W2"), "C"), "W2", "left")
        .join(n_row)
        .withColumn(
            "__p_hat",
            F.lit(lam)
            * F.when(F.col("C1S").isNotNull(), F.coalesce(F.col("C12"), F.lit(0)) / F.col("C1S")).otherwise(F.lit(0.0))
            + F.lit(1.0 - lam) * (F.coalesce(F.col("C"), F.lit(0.5)) / F.col("N")),
        )
        .withColumn("__srp", rhu(-F.log("__p_hat"), 9).cast("decimal(28,9)"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("__k").cast("long").alias("N_BIGRAMS"),
        rhu(
            F.sum(F.col("__k").cast("decimal(9,0)") * F.col("__srp")).cast("double")
            / F.sum("__k"),
            6,
        ).alias("AVG_NEG_LOGPROB"),
    )


def head_vocab_drift(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_k: int = 300,
) -> DataFrame:
    """Per-source mixture-drift monitor: total-variation distance (ppm)
    between each source's token distribution and the corpus distribution,
    over the corpus's ``top_k`` HEAD vocabulary -- the signal that a
    source's content shifted under you (scraper drift, a crawl picking up
    a new site template, a mislabeled dump) before it skews a training
    mix. Log-free by design, like the collocation miner: every term is an
    integer ppm (count*1e6 div total), so the report is value-hash exact
    cross-engine.

    Scale shape: ONE token explode feeds all four aggregations -- the
    exploded frame is localCheckpoint(eager=False)'d because four
    independent aggregation subtrees reference it, and without the cut
    Spark re-scans and re-tokenizes the corpus once per subtree (the
    multi-reference re-expansion hazard triangle_counts documents); the
    head vocabulary is a TakeOrdered top-k (deterministic (count, token)
    tie-break), so the per-source grid is sources x k via a broadcast of
    a BOUNDED k-row frame (never vocab-sized), absent head tokens count
    as observed 0, and the final rollup is one small keyed aggregation.
    Returns (SOURCE, N_TOKENS, HEAD_DRIFT_PPM)."""
    tok = df.select(
        F.col(source_col).alias("SOURCE"), F.explode(tokens(text_col)).alias("W")
    ).localCheckpoint(eager=False)
    csw = tok.groupBy("SOURCE", "W").agg(F.count(F.lit(1)).cast("long").alias("N_SW"))
    cw = tok.groupBy("W").agg(F.count(F.lit(1)).cast("long").alias("N_W"))
    top = cw.orderBy(F.col("N_W").desc(), "W").limit(int(top_k))
    tot = tok.groupBy("SOURCE").agg(F.count(F.lit(1)).cast("long").alias("N_S"))
    c_total = tok.agg(F.count(F.lit(1)).cast("long").alias("N_C"))
    grid = tot.crossJoin(F.broadcast(top.crossJoin(F.broadcast(c_total))))
    obs = grid.join(csw, ["SOURCE", "W"], "left").withColumn(
        "N_SW", F.coalesce(F.col("N_SW"), F.lit(0).cast("long"))
    )
    diff = F.expr("abs((N_SW * 1000000) div N_S - (N_W * 1000000) div N_C)")
    return (
        obs.groupBy("SOURCE")
        .agg(
            F.max("N_S").alias("N_TOKENS"),
            F.sum(diff).cast("long").alias("HEAD_DRIFT_PPM"),
        )
    )


def _latin1_ghost(ch: str) -> str:
    """What ``ch`` becomes after the classic double-encode accident:
    its UTF-8 bytes re-decoded as Latin-1 (built at runtime because the
    multi-byte ghosts contain C1 control characters that do not belong
    in source text)."""
    return ch.encode("utf-8").decode("latin-1")


# UTF-8-decoded-as-Latin-1 digraph signatures for the most common
# non-ASCII characters in web text: accented Latin letters, the curly
# quotes/dashes Word emits, and the non-breaking space. Literal
# substrings, NOT regex: counting is pure length arithmetic, so the
# screen replays identically in any engine.
MOJIBAKE_PATTERNS: list[str] = [
    _latin1_ghost(c) for c in ["é", "è", "á", "ä", "ö", "ü", "ñ", "’", "“", "–", " "]
]

_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"


def mojibake_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[str] | None = None,
    threshold_ppm: int = 1000,
) -> DataFrame:
    """Encoding-quality screen over a text corpus: per document, count the
    three classic decode-damage signals --

    * ``N_REPLACEMENT``: U+FFFD replacement characters (a decoder already
      gave up once);
    * ``N_MOJIBAKE``: UTF-8-bytes-decoded-as-Latin-1 ghost sequences
      (:data:`MOJIBAKE_PATTERNS`), counted by pure length arithmetic
      ``(len(text) - len(replace(text, pat, ''))) / len(pat)`` -- no
      regex, so every count replays bit-identically cross-engine;
    * ``N_CONTROL``: C0 control characters other than tab/newline/CR
      (binary junk pasted into "text").

    ``BAD_PPM`` is their ppm share of the character count (floor
    division, 0 for empty text) and ``SUSPECT`` flags documents at or
    above ``threshold_ppm`` -- the deterministic re-encode/quarantine
    work-list a corpus ingest runs BEFORE tokenization (the damage is
    invisible after BPE splits the ghost digraphs). Pure scan-stage
    column arithmetic: no shuffle, no UDF, output-proportional -- the
    mojibake sibling of the langid/quality/Gopher screens.

    Returns (id_col, N_CHARS, N_REPLACEMENT, N_MOJIBAKE, N_CONTROL,
    BAD_PPM -- all BIGINT -- and SUSPECT boolean)."""
    pats = MOJIBAKE_PATTERNS if patterns is None else patterns
    t = F.col(text_col)
    n = F.length(t)
    repl = n - F.length(F.replace(t, F.lit("�"), F.lit("")))
    moji = None
    for p in pats:
        # exact integer count: each removal drops len(p) chars, so the
        # double division is an exact multiple (counts << 2^52)
        c = ((n - F.length(F.replace(t, F.lit(p), F.lit("")))) / F.lit(len(p))).cast(
            "long"
        )
        moji = c if moji is None else moji + c
    ctrl = n - F.length(F.regexp_replace(t, _CONTROL_CLASS, ""))
    mid = df.select(
        F.col(id_col),
        n.cast("long").alias("N_CHARS"),
        repl.cast("long").alias("N_REPLACEMENT"),
        moji.cast("long").alias("N_MOJIBAKE"),
        ctrl.cast("long").alias("N_CONTROL"),
    ).withColumn("__bad", F.expr("N_REPLACEMENT + N_MOJIBAKE + N_CONTROL"))
    return mid.select(
        F.col(id_col),
        "N_CHARS",
        "N_REPLACEMENT",
        "N_MOJIBAKE",
        "N_CONTROL",
        F.when(F.col("N_CHARS") > 0, F.expr("(__bad * 1000000) div N_CHARS"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("BAD_PPM"),
        # integer-exact threshold: floor(bad*1e6/n) >= thr  <=>  bad*1e6 >= thr*n
        (
            (F.col("N_CHARS") > 0)
            & (F.col("__bad") * 1000000 >= F.lit(int(threshold_ppm)) * F.col("N_CHARS"))
        ).alias("SUSPECT"),
    )


def mojibake_sql(
    text_col: str = "text",
    patterns: list[str] | None = None,
    threshold_ppm: int = 1000,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """The oracle twin of :func:`mojibake_report`: one SELECT over
    ``table`` computing the identical counts with the identical literals
    (DuckDB ``//`` floor division; same integer threshold compare)."""
    pats = MOJIBAKE_PATTERNS if patterns is None else patterns

    def cnt(pat: str) -> str:
        esc = pat.replace("'", "''")
        return f"(length({text_col}) - length(replace({text_col}, '{esc}', '')))"

    moji = " + ".join(f"({cnt(p)} // {len(p)})" for p in pats)
    ctrl = (
        f"(length({text_col}) - length(regexp_replace({text_col}, "
        f"'{_CONTROL_CLASS}', '', 'g')))"
    )
    return f"""
WITH m AS (
  SELECT {id_col},
         CAST(length({text_col}) AS BIGINT) AS N_CHARS,
         CAST({cnt(chr(0xFFFD))} AS BIGINT) AS N_REPLACEMENT,
         CAST({moji} AS BIGINT) AS N_MOJIBAKE,
         CAST({ctrl} AS BIGINT) AS N_CONTROL
  FROM {table}
)
SELECT {id_col}, N_CHARS, N_REPLACEMENT, N_MOJIBAKE, N_CONTROL,
       CAST(CASE WHEN N_CHARS > 0
                 THEN ((N_REPLACEMENT + N_MOJIBAKE + N_CONTROL) * 1000000) // N_CHARS
                 ELSE 0 END AS BIGINT) AS BAD_PPM,
       (N_CHARS > 0 AND
        (N_REPLACEMENT + N_MOJIBAKE + N_CONTROL) * 1000000 >= {int(threshold_ppm)} * N_CHARS)
         AS SUSPECT
FROM m"""
