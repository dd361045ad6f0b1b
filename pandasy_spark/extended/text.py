"""Text analysis operators for large-scale corpus pipelines.

No counterpart in the reference (it has no scalar string library —
/root/repo/SURVEY.md §2.9); these are the Spark-first extension surface
for training-data work: token counting, quality scoring, language-ID
heuristics, and document fingerprinting.

Everything here is built from JVM-side ``pyspark.sql.functions``
(regexp/ hash built-ins inside whole-stage codegen) — no Python UDFs in
the hot path, so the operators scale linearly with input splits and
never serialize rows to Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import qround

__all__ = [
    "ngram_novelty",
    "gopher_quality_flags",
    "c4_clean",
    "token_count",
    "avg_token_len",
    "punct_ratio",
    "alpha_ratio",
    "quality_score",
    "lang_score",
    "lang_id",
    "fingerprint",
    "bpe_token_count",
    "rolling_fingerprint",
    "with_text_stats",
    "tokens",
    "word_ngrams",
    "repetition_stats",
    "redact_pii",
    "quality_percentile_filter",
    "quality_quantile_threshold",
    "bpe_pair_counts",
    "bigram_lm_score",
    "bpe_learn",
    "tficf_top_terms",
    "chunk_documents",
    "collocations",
    "tokenize_bpe",
    "build_inverted_index",
    "search_index",
    "canonicalize_url",
    "quality_logistic",
    "quality_train",
    "hash_features",
    "rake_keywords",
    "RAKE_STOPWORDS",
    "PII_PATTERNS",
    "TRACKING_PARAMS",
    "readability",
    "phrase_search",
    "vocab_growth",
    "boilerplate_strip",
    "oov_rate",
]

#: query parameters stripped by URL canonicalization — the standard
#: analytics/click-tracking junk that makes byte-identical pages look
#: like distinct crawl URLs.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "fbclid", "gclid", "msclkid", "ref",
)

# tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language ID (deterministic, SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    return F.regexp_count(col, F.lit(r"\S+")).cast("long")


def avg_token_len(col: Column) -> Column:
    """Average token length; NULL when there are no tokens."""
    n = token_count(col)
    chars = F.length(F.regexp_replace(col, r"\s", ""))
    return F.when(n > 0, chars.cast("double") / n.cast("double"))


def punct_ratio(col: Column) -> Column:
    """Fraction of non-word, non-space characters."""
    total = F.length(col)
    punct = F.regexp_count(col, F.lit(r"[^\w\s]")).cast("double")
    return F.when(total > 0, punct / total.cast("double")).otherwise(F.lit(0.0))


def alpha_ratio(col: Column) -> Column:
    total = F.length(col)
    alpha = F.regexp_count(col, F.lit(r"[A-Za-z]")).cast("double")
    return F.when(total > 0, alpha / total.cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic combining token count,
    average token length, and punctuation density — the standard
    pre-training filter shape (length/punct/stopword ratios)."""
    n = token_count(col).cast("double")
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    atl = F.coalesce(avg_token_len(col), F.lit(0.0))
    shape_term = F.when((atl >= 2.0) & (atl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return qround(0.4 * len_term + 0.3 * shape_term + 0.3 * punct_term, 4)


def lang_score(col: Column, lang: str) -> Column:
    """Stopword-marker hit count for one language."""
    markers = LANG_MARKERS[lang]
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pattern)).cast("long")


def lang_id(col: Column) -> Column:
    """Argmax language by marker score, ties broken by the fixed order
    en > de > fr > es; 'und' (undetermined) when no marker hits."""
    scores = {lang: lang_score(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in ["en", "de", "fr", "es"]:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text.  Stable across engines (md5 is
    bit-identical everywhere), usable as an exact-dedup key."""
    normalized = F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))
    return F.md5(normalized)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "avg_token_len": qround(F.coalesce(avg_token_len(c), F.lit(0.0)), 4),
            "punct_ratio": qround(punct_ratio(c), 4),
            "alpha_ratio": qround(alpha_ratio(c), 4),
            "quality": quality_score(c),
            "fingerprint": fingerprint(c),
        }
    )


# GPT-2-style pre-tokenizer approximation, restricted to the regex
# subset where Java (Spark) and RE2 (DuckDB oracle) agree: contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
_BPE_ISH = r"'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n]+"

_ROLL_BASE = 257
_ROLL_MOD = 9_007_199_254_740_992  # 2^53: (acc*257 + code) stays in int64


def bpe_token_count(col: Column) -> Column:
    """Subword-ish token count via a BPE pre-tokenizer regex — a much
    better LLM-token estimate than whitespace splitting (which
    undercounts punctuation-heavy and digit-heavy text).  Pure
    regexp_count: JVM-side, codegen, no Python."""
    return F.regexp_count(col, F.lit(_BPE_ISH)).cast("long")


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive Karp-Rabin rolling hash of the character
    stream: ``h = (h * 257 + code(c)) mod 2^53``.

    Unlike the md5 ``fingerprint`` (content identity), the polynomial
    form extends to windowed/shingle fingerprinting (subtract the
    leading term, multiply, add) — the primitive under winnowing-style
    near-dup detection.  Computed with a higher-order ``aggregate``
    over the char array: JVM-side, no UDF, and exactly reproducible in
    any engine with the same integer ops."""
    chars = F.filter(F.split(col, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(_ROLL_BASE) + F.ascii(c)) % F.lit(_ROLL_MOD),
    )


def tokens(col: Column) -> Column:
    """Whitespace token array (empty strings filtered)."""
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


def word_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty if fewer than n
    tokens).  The unit of benchmark-decontamination overlap checks.

    Guarded: ``sequence(1, 0)`` in Spark counts DOWN ([1, 0]), so the
    index range is only built when at least one n-gram exists."""
    toks = tokens(col)
    cnt = F.size(toks) - (n - 1)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals: the fraction
    of duplicate word 2-grams / 3-grams and the highest single-token
    share.  Repetitive machine-generated text scores high and gets
    filtered before training.  All array/aggregate built-ins — one
    narrow pass, no shuffle, no Python.

    The token array is materialized ONCE in a temp column and every
    signal reads it: re-deriving it per signal re-runs the regex split
    inside each (interpreted) higher-order expression and measured ~6x
    slower end-to-end at bench scale."""
    c = F.col(text_col)
    df = df.withColumn("__toks", tokens(c))
    toks = F.col("__toks")

    def ngrams_from_toks(n: int) -> Column:
        cnt = F.size(toks) - (n - 1)
        return F.when(
            cnt > 0,
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def dup_frac(n: int) -> Column:
        grams = ngrams_from_toks(n)
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        return F.when(
            total > 0, (total - distinct).cast("double") / total
        ).otherwise(F.lit(0.0))

    # Share of the most frequent token among all tokens.  Computed as
    # the longest equal-run in the SORTED token array — one aggregate
    # pass, O(T log T) per document.  (The naive per-distinct-token
    # rescan is O(T^2) in interpreted higher-order lambdas and was the
    # dominant cost of the whole pretraining pipeline at bench scale.)
    sorted_toks = F.array_sort(toks)
    run_best = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_share = F.when(
        F.size(toks) > 0,
        run_best.cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))
    from ..functions.kernels import qround

    return df.withColumns(
        {
            "dup_2gram_frac": qround(dup_frac(2), 4),
            "dup_3gram_frac": qround(dup_frac(3), 4),
            "top_token_share": qround(top_share, 4),
        }
    ).drop("__toks")


#: PII patterns: conservative, high-precision classes.  Redaction is
#: regexp_replace chains — JVM codegen, linear scans, no Python.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Replace PII spans with typed placeholders ('[EMAIL]', ...) and
    count matches per class.  Order matters: ssn/ipv4 run before the
    generic phone pattern so overlapping digit shapes get the most
    specific tag.  At 100 TB this is the cheapest possible shape — one
    narrow projection, a few regex automata per row."""
    c = F.col(text_col)
    counts = {
        f"n_{name}": F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    red = c
    for name in ["email", "ssn", "ipv4", "phone"]:
        red = F.regexp_replace(red, PII_PATTERNS[name], f"[{name.upper()}]")
    return df.withColumns({**counts, out_col: red})


def quality_percentile_filter(
    df: DataFrame,
    keep_frac: float = 0.75,
    by: tuple[str, ...] = ("lang",),
    quality_col: str = "quality",
    id_col: str = "doc_id",
    out_col: str = "q_pr",
) -> DataFrame:
    """Adaptive quality threshold: keep the top ``keep_frac`` of rows
    per group by quality score, instead of a fixed global cutoff (a
    fixed threshold over- or under-prunes whole languages/domains whose
    score distributions differ).

    Exact path: ``percent_rank`` over (quality DESC, id) per group —
    deterministic because the id tie-break makes the ordering total.
    This needs a per-group sort (one shuffle on ``by``); groups are
    whole languages, so at 100 TB prefer
    :func:`quality_quantile_threshold`, which replaces the sort with a
    map-combinable quantile sketch + broadcast join.  Keep THIS path
    for bounded groups and as the oracle-checkable reference.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*by).orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    pr = qround(F.percent_rank().over(w), 4)
    return df.withColumn(out_col, pr).filter(F.col(out_col) <= F.lit(keep_frac))


def quality_quantile_threshold(
    df: DataFrame,
    keep_frac: float = 0.75,
    by: tuple[str, ...] = ("lang",),
    quality_col: str = "quality",
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale twin of :func:`quality_percentile_filter`: per-group
    approximate quantile threshold instead of a per-group total sort.

    Plan shape at 100 TB: one map-combinable ``approx_percentile``
    aggregate (groups = languages/domains, so the threshold table is
    tiny), broadcast back, then a narrow filter — no giant per-group
    sort, no skew exposure.  The cutoff is approximate (rank error
    ~1/accuracy), which is the accepted trade for corpus curation.
    """
    thr = df.groupBy(*list(by)).agg(
        F.expr(
            f"approx_percentile({quality_col}, {1.0 - keep_frac}, {accuracy})"
        ).alias("__q_thr")
    )
    joined = df.join(F.broadcast(thr), on=list(by), how="inner")
    return joined.filter(F.col(quality_col) >= F.col("__q_thr")).drop("__q_thr")


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """One merge step of byte-pair-encoding tokenizer training
    (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
    with Subword Units"): corpus-wide frequencies of adjacent symbol
    pairs, weighted by word-type frequency.

    Distributed shape — the part that matters at 100 TB:

    1. word-type frequencies: one hash aggregate over exploded words
       (map-side combine collapses each partition to its distinct
       words before the shuffle);
    2. pair explosion runs over word TYPES, not word occurrences —
       the corpus may hold 10^12 running words but only ~10^7
       distinct types, so the second stage's input is tiny;
    3. pair counts: hash aggregate over a key space of ~|alphabet|^2;
    4. deterministic top-N via (count DESC, pair) rank — ties broken
       lexicographically, so a re-run (or another engine) picks the
       SAME merge, which is what makes tokenizer training
       reproducible.

    Returns (pair, cnt, rk) — the argmax row (rk=1) is the merge a
    BPE trainer would apply next; iterating merges re-runs this with
    the learned vocabulary applied, each round over word types only.
    """
    words = df.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word")
    ).filter(F.length("word") >= 2)
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    pairs = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring("word", i, 2),
            )
        ).alias("pair"),
        "wc",
    )
    from pyspark.sql.window import Window

    agg = pairs.groupBy("pair").agg(F.sum("wc").alias("cnt"))
    # TakeOrderedAndProject the top_n FIRST (per-partition top-n +
    # driver merge, no global sort), then rank the <= top_n survivors
    # — a bare global ranking window would single-partition the whole
    # pair table (~|vocab| symbols squared at web scale)
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair"))
    return (
        agg.orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(top_n)
        .withColumn("rk", F.row_number().over(w))
        .select("pair", "cnt", "rk")
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """KenLM-style corpus-fit quality score from a word-bigram language
    model trained on the corpus itself: documents whose bigrams are
    rare under the corpus distribution (boilerplate mangling, shuffled
    text, OCR noise) score low and get filtered.

    The per-bigram probability is add-``alpha`` smoothed
    ``(c(w1,w2) + a) / (c(w1) + a*V)``; the document score is the MEAN
    bigram probability, accumulated on a fixed ``1/scale`` integer grid
    so the aggregation is order-independent and bit-identical across
    engines (see workload.exact_sum for the pattern; log-space scoring
    would make cross-engine hashes depend on libm rounding).

    Scale shape: model estimation is two hash aggregates over exploded
    bigrams (map-side combined, uniform keys); scoring is one equi-join
    of doc-bigrams against the model — bigram keys follow a Zipf
    distribution, but the model side is small (|V|^2 bound) so AQE
    broadcasts it at any realistic vocabulary.
    """
    toks = tokens(F.col(text_col))
    grams = df.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("bigram"),
    ).select(
        F.col(id_col),
        "bigram",
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
    )
    big_counts = grams.groupBy("bigram", "w1").agg(
        F.count(F.lit(1)).alias("c12")
    )
    uni_counts = big_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = df.select(
        F.explode(toks).alias("w")
    ).agg(F.count_distinct("w").alias("v"))
    model = (
        big_counts.join(uni_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            (
                (F.col("c12") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("p"),
        )
    )
    scored = grams.join(model, "bigram").select(
        F.col(id_col),
        F.floor(F.col("p") * F.lit(float(scale)) + F.lit(0.5))
        .cast("long")
        .alias("p_scaled"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        # floor, not cast: DuckDB's double->BIGINT cast rounds while
        # Spark's truncates; floor agrees everywhere
        F.floor(F.sum("p_scaled") / F.count(F.lit(1)))
        .cast("long")
        .alias("score_scaled"),
    )


def tficf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf x (N/df) —
    the tf-idf ranking with the raw inverse-frequency ratio instead of
    its log.  ``ln`` is monotone, so the selected terms and their order
    are identical to classic tf-idf, while every score stays a single
    correctly-rounded IEEE division — deterministic across engines,
    where libm ``ln`` is not.

    Scale shape: term counts are one hash aggregate on (doc, term);
    document frequencies one on term; the join back is term-keyed with
    a |vocab|-row side (broadcastable).  Top-k per doc is a ranking
    window over the doc's own terms — partition key = doc id, no skew.
    """
    from pyspark.sql.window import Window

    tf = (
        df.select(
            F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            (
                F.col("tf").cast("double")
                * (F.col("n") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", qround(F.col("score"), 4).alias("score"), "rk")
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_word_len: int = 2,
    local_types_threshold: int = 100_000,
    merge_batch: int | str = "adaptive",
    stats: dict | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus (the iterative
    tokenizer-training loop; ``bpe_pair_counts`` is its single step).

    Returns ``[(rank, left, right, merged, pair_count), ...]`` in merge
    order.  Classic BPE (Sennrich et al. 2016): repeatedly take the
    most frequent adjacent symbol pair over word TYPES weighted by
    type frequency, merge it everywhere, recount.

    Scale shape: the corpus-sized work is the one word-frequency hash
    aggregate up front; everything after operates on the word-TYPE
    table (~10^7 rows for web-scale corpora even at 10^12 running
    words).  Below ``local_types_threshold`` distinct types, the merge
    loop runs on the collected type table in-process — this is how
    production tokenizer trainers work (the type table after the
    distributed count is small by construction) and avoids paying
    several scheduled Spark jobs per merge.  Above the threshold (or
    with threshold=0), a fully distributed loop runs, BATCHED: per
    distributed pass, one map-side-combined pair-count aggregate
    collects the top candidate pairs, of which up to ``merge_batch``
    symbol-DISJOINT pairs (no symbol of one appears in, or equals the
    merged token of, another) are applied together in one narrow fold
    projection + localCheckpoint — cutting driver round-trips and
    scheduled jobs ~``merge_batch``× vs one job chain per merge.

    Disjointness makes the batch exact in the common case: merging a
    pair cannot create, destroy, or recount occurrences of a
    symbol-disjoint pair, so the stale counts ARE the sequential
    counts for every pair in the batch.  The only possible deviation
    from sequential BPE is a pair *created* by an earlier batch member
    (one involving its merged token) out-counting a later batch member
    — this is REAL at depth (observed as a created-pair count TIE
    ~90 merges into the test corpus, flipping one tie-break), the
    standard accepted trade of production batched trainers; the
    ``text_bpe_learn`` driver gate and tests/test_extended.py pin
    batched == sequential at gate depth, so any NEW deviation class
    surfaces as a red row, not silence.  ``merge_batch=1`` recovers the strict
    one-merge-per-pass loop; an integer fixes the batch size; the
    default ``"adaptive"`` grows the batch geometrically (x2, capped
    at 256) while the greedy disjoint prefix keeps FILLING it and
    halves it on a conflict — vocabulary merges are mostly disjoint
    (distinct letters dominate early, distinct stems later), so a
    50k-merge training converges to a few hundred distributed passes
    instead of ~6k at a fixed batch of 8.  All schedules are
    deterministic with ties on (count DESC, left, right) and select
    the identical merge table — the prefix rule, not the batch size,
    decides what is applied.
    """
    words = df.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word")
    ).filter(F.length("word") >= min_word_len)
    type_counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))

    if local_types_threshold > 0 and type_counts.count() <= local_types_threshold:
        wf = {r["word"]: r["wc"] for r in type_counts.toLocalIterator()}
        local_stats = stats
        syms = {w: list(w) for w in wf}
        merges_local: list[tuple[int, str, str, str, int]] = []
        for rank in range(num_merges):
            pc: dict[tuple[str, str], int] = {}
            for w, c in wf.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
            if not pc:
                break
            (left, right), cnt = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merged = left + right
            merges_local.append((rank, left, right, merged, int(cnt)))
            for w in syms:
                s = syms[w]
                out: list[str] = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        if local_stats is not None:
            local_stats.update(
                {
                    "passes": len(merges_local),
                    "merges": len(merges_local),
                    "final_batch": 1,
                }
            )
        return merges_local

    # EXPLICIT repartition: the type table is tiny in BYTES (AQE
    # coalesces its shuffle to one partition) but every fold pass is
    # CPU-heavy per ROW — one partition serializes the whole merge
    # loop onto a single core.  A fixed-width repartition survives AQE
    # and is preserved by the narrow per-pass selects.
    par = df.sparkSession.sparkContext.defaultParallelism
    types = (
        type_counts.withColumn("syms", F.split(F.col("word"), ""))
        .select("syms", "wc")
        .repartition(par)
        .localCheckpoint(eager=True)
    )

    merges: list[tuple[int, str, str, str, int]] = []
    empty = F.array().cast("array<string>")
    adaptive = merge_batch == "adaptive"
    batch_m = 8 if adaptive else max(1, int(merge_batch))
    passes = 0
    while len(merges) < num_merges:
        passes += 1
        if passes % 10 == 0:
            # the superseded localCheckpoint blocks are only released
            # when the driver's ContextCleaner sees their Python/py4j
            # references collected — at hundreds of passes the lazy GC
            # lets dead type-table copies pile up in block storage and
            # the JVM tips into GC thrash; an explicit collect keeps
            # exactly one live checkpoint
            import gc

            gc.collect()
        want = num_merges - len(merges)
        # One distributed pass: full pair count, top candidates to the
        # driver (a few dozen rows — the over-fetch gives the greedy
        # disjointness filter room to fill the batch).
        pairs = (
            types.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("l"),
                                F.element_at("syms", i + 1).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                ).alias("p"),
                "wc",
            )
            .groupBy("p")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.l"), F.col("p.r"))
            .limit(max(32, 2 * batch_m))
            .collect()
        )
        if not pairs:
            break
        # Greedy prefix selection: take candidates in sequential-BPE
        # order while their symbol closures {l, r, l+r} stay pairwise
        # disjoint.  Stop at the FIRST conflicting candidate (rather
        # than skipping it) — a skipped pair's count could legally
        # change once an overlapping earlier merge applies, so only a
        # conflict-free PREFIX preserves sequential selection order.
        batch: list[tuple[str, str, str, int]] = []
        used: set[str] = set()
        cap = min(batch_m, want)
        conflicted = False
        for row in pairs:
            left, right, cnt = row["p"]["l"], row["p"]["r"], row["cnt"]
            merged = left + right
            closure = {left, right, merged}
            if used & closure:
                conflicted = True
                break
            batch.append((left, right, merged, int(cnt)))
            used |= closure
            if len(batch) >= cap:
                break
        if adaptive:
            # geometric schedule: a filled batch means the candidate
            # stream is still conflict-free at this width — try twice
            # the width next pass; a conflict means the width
            # overshot — halve it.  (A batch short of cap WITHOUT a
            # conflict just means the over-fetch ran out; keep width.)
            if conflicted:
                batch_m = max(1, batch_m // 2)
            elif len(batch) >= cap:
                batch_m = min(256, batch_m * 2)
        for left, right, merged, cnt in batch:
            merges.append((len(merges), left, right, merged, cnt))
        # One fold applies the whole batch left-to-right.  Disjointness
        # means at most one batch pair can match at any position, and a
        # merged token can never re-participate (it is in no pair's
        # symbol set, and is strictly longer than its own left symbol)
        # — exactly BPE's greedy application of each merge.  The batch
        # is applied through a MAP LITERAL lookup ((last, next) key ->
        # merged token), so the fold expression is CONSTANT-size: a
        # chain of per-pair WHENs makes Catalyst analysis superlinear
        # in batch width and stalls the adaptive schedule exactly when
        # it succeeds in growing the batch.
        def make_fold(fold_batch):
            kv: list = []
            for left, right, merged, _ in fold_batch:
                kv += [F.lit(left + "\x00" + right), F.lit(merged)]
            pair_map = F.create_map(*kv)

            def batch_fold(acc, s):
                # F.get is null-on-out-of-bounds (ANSI-safe on the
                # empty accumulator); the \x00 delimiter cannot occur
                # in [a-z]+ symbols, so a bare-symbol key never
                # false-matches a map entry
                last = F.get(acc, F.size(acc) - 1)
                rep = F.try_element_at(
                    pair_map, F.concat_ws("\x00", last, s)
                )
                return F.when(
                    (F.size(acc) > 0) & rep.isNotNull(),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(rep)
                    ),
                ).otherwise(F.concat(acc, F.array(s)))

            return batch_fold

        fold = F.aggregate(F.col("syms"), empty, make_fold(batch))
        types = types.select(fold.alias("syms"), "wc").localCheckpoint(eager=True)
    if stats is not None:
        # telemetry for the adaptive-batching convergence claim: a
        # 50k-merge training should report O(hundreds) of passes
        stats.update(
            {"passes": passes, "merges": len(merges), "final_batch": batch_m}
        )
    return merges


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split documents into overlapping character windows — the RAG /
    context-window chunking primitive.

    Chunk k starts at character ``1 + k*(size-overlap)``; starts are
    generated while ``start <= max(len - overlap, 1)``, so every chunk
    except possibly the last has ``size`` characters, consecutive
    chunks share ``overlap`` characters, the full text is covered, and
    every document emits at least one chunk (an empty text yields one
    empty chunk rather than disappearing).

    Output: (id, chunk_idx, start, chunk_text, chunk_len).

    Scale shape: one narrow projection + explode — no shuffle, no UDF;
    the sequence/substring arithmetic stays in whole-stage codegen, so
    chunking 100 TB is a pure map over input splits.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step))
    out = df.select(
        F.col(id_col),
        F.explode(starts).alias("start"),
        F.col(text_col).alias("__t"),
    )
    return out.select(
        id_col,
        ((F.col("start") - 1) / step).cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        F.substring(F.col("__t"), F.col("start"), F.lit(size)).alias("chunk_text"),
        F.length(F.substring(F.col("__t"), F.col("start"), F.lit(size)))
        .cast("int")
        .alias("chunk_len"),
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    round_decimals: int = 4,
) -> DataFrame:
    """Corpus-level collocation mining: adjacent word pairs ranked by
    pointwise mutual information ``log(P(xy) / (P(x)P(y)))``.

    Output: (w1, w2, pair_ct, ct1, ct2, pmi) for pairs seen at least
    ``min_count`` times, PMI rounded to ``round_decimals`` (the
    rounding makes the float SQL-oracle-stable; ranking consumers
    sort on it downstream).

    Scale shape: two map-side-combined hash aggregates (bigram counts,
    unigram counts) + two joins of the pair table against the unigram
    table.  The unigram table is vocabulary-sized (≪ corpus) and
    usually broadcastable; the bigram table shuffles on the pair key
    once.  PMI normalizers (total tokens / total bigrams) ride along
    via scalar subquery-style cross joins of 1-row aggregates — no
    driver collect.
    """
    toks = df.select(tokens(F.col(text_col)).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    big = (
        toks.select(
            F.explode(
                F.when(
                    F.size("toks") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - 1),
                        lambda i: F.struct(
                            F.element_at("toks", i).alias("w1"),
                            F.element_at("toks", i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_ct"))
        .filter(F.col("pair_ct") >= min_count)
    )
    n_tok = uni.agg(F.sum("ct").alias("n_tok"))
    n_big = toks.select(
        F.greatest(F.size("toks") - 1, F.lit(0)).alias("nb")
    ).agg(F.sum("nb").alias("n_big"))
    joined = (
        big.join(F.broadcast(uni.withColumnRenamed("w", "w1")
                             .withColumnRenamed("ct", "ct1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("ct", "ct2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
    )
    pmi = F.log(
        (F.col("pair_ct") / F.col("n_big"))
        / ((F.col("ct1") / F.col("n_tok")) * (F.col("ct2") / F.col("n_tok")))
    )
    return joined.select(
        "w1",
        "w2",
        F.col("pair_ct").cast("long").alias("pair_ct"),
        F.col("ct1").cast("long").alias("ct1"),
        F.col("ct2").cast("long").alias("ct2"),
        qround(pmi, round_decimals).alias("pmi"),
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], tuple[int, str]]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair (Sennrich et al. 2016 inference)."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r[0] < best_rank):
                best_rank = r[0]
                best_i = i
        if best_i < 0:
            break
        merged = ranks[(syms[best_i], syms[best_i + 1])][1]
        syms[best_i : best_i + 2] = [merged]
    return syms


def tokenize_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_word_tokens: bool = False,
) -> DataFrame:
    """Apply a learned BPE merge table (``bpe_learn`` output) to the
    corpus — the tokenizer-inference half of the train/apply pair.

    Output: one row per document with (id, n_words, n_tokens, tokens
    [array<string> in word order]); with ``keep_word_tokens`` also
    ``word_tokens`` (array<array<string>>, one inner array per word —
    the shape boundary-sensitive checks need, since BPE never merges
    across words).

    Scale shape: encoding cost is paid once per word TYPE, not per
    running word: a distinct-word hash aggregate feeds an Arrow-batched
    ``mapInPandas`` encoder over the (small, vocabulary-sized) type
    table, and the result joins back to the exploded corpus on the
    word key.  The type table is broadcastable for real vocabularies,
    so the corpus-side join is shuffle-free; the final per-document
    regroup is the one corpus-sized shuffle.  The merge table itself
    travels in the UDF closure (tokenizer merge tables are ≤ a few
    hundred thousand entries — broadcast-variable scale).
    """
    ranks = {(l, r): (rank, m) for rank, l, r, m, _ in merges}

    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    types = words.select("word").distinct()

    def _enc(batches):
        import pandas as pd  # noqa: F811

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": [_encode_word(w, ranks) for w in pdf["word"]],
                }
            )

    encoded = types.mapInPandas(_enc, schema="word string, toks array<string>")
    joined = words.join(F.broadcast(encoded), "word")
    per_word = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("toks")))
    ).getField("toks")
    out_cols = [
        F.col(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.col("tokens"),
    ]
    if keep_word_tokens:
        out_cols.append(F.col("word_tokens"))
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            per_word.alias("word_tokens"),
        )
        .withColumn("tokens", F.flatten(F.col("word_tokens")))
        .select(*out_cols)
    )


def build_inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted index as a DataFrame: one row per (token, doc, term
    frequency).  Materialize it with ``write_bucketed`` on ``token``
    and conjunctive search becomes a bucket-pruned scan — the classic
    search-engine layout expressed as a table.

    Build is one narrow explode + one hash aggregate on (token, doc)
    — map-side combined, scales as a pure corpus pass."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("token", id_col, F.col("tf").cast("long").alias("tf"))
    )


def search_index(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Conjunctive (AND) term search against an inverted index: docs
    containing EVERY term, with total term-frequency as the score.

    The term filter is a pushdown-able IN over the index's token
    column (partition/bucket pruning when the index is written
    bucketed on token); the only shuffle aggregates the ≤|terms|
    surviving posting lists by document."""
    if not terms:
        raise ValueError("search needs at least one term")
    hits = index.filter(F.col("token").isin(list(terms)))
    return (
        hits.groupBy(id_col)
        .agg(
            F.count_distinct("token").alias("n_terms"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("n_terms") == len(set(terms)))
        .select(id_col, F.col("score").cast("long").alias("score"))
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column — the first dedup step of every
    web-crawl pipeline (duplicate PAGES hide behind case-varied hosts,
    default ports, fragments, tracking parameters, parameter order and
    trailing slashes).

    Rules: lowercase scheme and authority; drop the fragment; drop
    default ports (http:80, https:443); drop tracking query
    parameters — ANY parameter whose name starts with ``utm_``
    (prefix rule: utm_source/utm_id/utm_anything) plus the
    ``TRACKING_PARAMS`` click-id names; sort the remaining
    parameters; collapse the empty path to ``/`` and strip a
    trailing slash from non-root paths.

    Pure codegen (regexp + split/filter/sort/join builtins) — no UDF,
    no shuffle: canonicalizing 100 TB of URLs is a narrow map, and the
    downstream dedup is a plain groupBy on the canonical key.
    """
    u = F.regexp_replace(url, "#.*$", "")  # fragment
    pat = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]*)([^?]*)(\?(.*))?$"
    scheme = F.lower(F.regexp_extract(u, pat, 1))
    auth = F.lower(F.regexp_extract(u, pat, 2))
    path = F.regexp_extract(u, pat, 3)
    query = F.regexp_extract(u, pat, 5)
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.regexp_replace(auth, ":80$", ""),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.regexp_replace(auth, ":443$", ""),
    ).otherwise(auth)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, "(.+)/$", "$1")
    )
    def keep(x: Column) -> Column:
        # the utm_ family is open-ended (utm_id, utm_reader, ...):
        # drop by PREFIX, exactly the rule the dedup_url oracle states
        # (LIKE 'utm\_%'); click-ids are fixed names, matched exactly
        c = (x != "") & ~x.startswith("utm_")
        for p in TRACKING_PARAMS:
            if p.startswith("utm_"):
                continue
            c = c & ~x.startswith(p + "=") & (x != p)
        return c

    params = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), keep)), "&"
    )
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
    )


#: fixed logistic-regression weights for the classifier-style quality
#: filter: (feature expression, weight).  Trained-model stand-in with
#: the shape real pipelines use (fastText/LR over cheap features); the
#: arithmetic below is the deployment surface that matters at 100 TB.
QUALITY_LR_BIAS = -1.0


def quality_logistic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Classifier-based quality filtering: a fixed-weight logistic
    regression over the cheap text features (token count, average
    token length, punctuation and alpha ratios) — the "model-based
    filter" stage of pre-training pipelines, reduced to its deployment
    shape: a pure codegen dot product + sigmoid, no UDF, no shuffle.

    Emits ``quality_logit`` (rounded, pure arithmetic — engine-exact),
    ``quality_prob`` (sigmoid, rounded to 4: exp() is libm-dependent
    in the last ulp, so the rounded value is the portable contract)
    and ``keep`` (logit > 0 — the decision does NOT depend on exp).
    """
    c = F.col(text_col)
    n = token_count(c).cast("double")
    f1 = F.least(n / F.lit(100.0), F.lit(1.0))
    f2 = F.least(F.coalesce(avg_token_len(c), F.lit(0.0)) / F.lit(10.0), F.lit(1.0))
    f3 = punct_ratio(c)
    f4 = alpha_ratio(c)
    logit = (
        F.lit(QUALITY_LR_BIAS)
        + F.lit(2.0) * f1
        + F.lit(1.5) * f2
        + F.lit(-3.0) * f3
        + F.lit(2.5) * f4
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return df.select(
        "*",
        qround(logit, 6).alias("quality_logit"),
        qround(prob, 4).alias("quality_prob"),
        (logit > 0).alias("keep"),
    )


def quality_train(
    df: DataFrame,
    text_col: str = "text",
    iters: int = 2,
    lr_num: int = 1,
    lr_den: int = 2,
    grid: int = 1_000_000,
) -> DataFrame:
    """TRAIN a linear quality probe on the corpus — the distributed,
    grid-exact upgrade of :func:`quality_logistic`'s fixed weights:
    ``iters`` full-batch gradient-descent steps on squared loss, every
    number a BIGINT on the ``grid`` (1e-6) lattice with EXACT integer
    floor division (pmod identity), so the learned weights are
    bit-identical across engines, partitionings and reruns, and a SQL
    oracle can state the unrolled steps (``text_quality_train`` gate).

    Setup: features x = (1, len_term, atl_term, punct_ratio,
    alpha_ratio) quantized to the grid; label y = grid * [fixed-weight
    logit > 0] (the probe distills the deployed heuristic — swap any
    0/grid label column in for human labels).  Squared loss keeps the
    gradient POLYNOMIAL (no exp/libm anywhere): per step one
    map-combined aggregate computes the 5 gradient sums, and the
    weight update rides a 1-row broadcast — k steps = k aggregates,
    the corpus is never shuffled.

    Output (one row): ``w_bias w_len w_atl w_punct w_alpha`` (final
    grid weights), ``n_docs``, ``sum_abs_err`` (Σ|residual| on the
    grid after the final step).  Overflow audit: per-doc dot terms ≤
    5·grid²·|w|/grid ≈ 5e13 at |w|≈10, per-doc gradient contributions
    are floor-divided back to grid scale BEFORE the sum, so the
    aggregate stays < 2^63 to ~1e9 docs; Σ|r| ≤ 5·grid·n — document
    the 1e9-doc bound rather than silently rounding in double.
    """
    if iters < 0 or lr_num < 1 or lr_den < 1 or grid < 1:
        raise ValueError("iters >= 0, lr_num/lr_den/grid >= 1 required")
    c = F.col(text_col)
    n_tok = token_count(c).cast("double")
    f1 = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    f2 = F.least(
        F.coalesce(avg_token_len(c), F.lit(0.0)) / F.lit(10.0), F.lit(1.0)
    )
    f3 = punct_ratio(c)
    f4 = alpha_ratio(c)
    logit = (
        F.lit(QUALITY_LR_BIAS)
        + F.lit(2.0) * f1
        + F.lit(1.5) * f2
        + F.lit(-3.0) * f3
        + F.lit(2.5) * f4
    )

    def q(col: Column) -> Column:
        return F.floor(col * grid + F.lit(0.5)).cast("long")

    names = ["bias", "len", "atl", "punct", "alpha"]
    docs = df.select(
        F.lit(int(grid)).cast("long").alias("qx_bias"),
        q(f1).alias("qx_len"),
        q(f2).alias("qx_atl"),
        q(f3).alias("qx_punct"),
        q(f4).alias("qx_alpha"),
        F.when(logit > 0, F.lit(int(grid)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )
    spark = df.sparkSession

    def fd(a: str, b) -> str:
        # exact floor division for any-sign numerators: Spark `div`
        # truncates, but (a - pmod(a, b)) is divisible by b
        return f"((({a}) - pmod(({a}), {b})) div {b})"

    dot = " + ".join(f"qx_{n} * w_{n}" for n in names)
    resid = f"({fd(dot, grid)} - y)"
    w = spark.range(1).select(
        *[F.lit(0).cast("long").alias(f"w_{n}") for n in names]
    )
    for _ in range(iters):
        sums = (
            docs.crossJoin(F.broadcast(w))
            .selectExpr(
                *[f"{fd(f'qx_{n} * {resid}', grid)} AS c_{n}" for n in names]
            )
            .agg(
                *[F.sum(f"c_{n}").alias(f"g_{n}") for n in names],
                F.count(F.lit(1)).alias("n_docs"),
            )
        )
        updates = []
        for n in names:
            gmean = fd(f"g_{n}", "n_docs")
            step = fd(f"{lr_num} * {gmean}", lr_den)
            updates.append(f"w_{n} - {step} AS w_{n}")
        w = w.crossJoin(F.broadcast(sums)).selectExpr(*updates)
    return (
        docs.crossJoin(F.broadcast(w))
        .selectExpr(
            *[f"w_{n}" for n in names],
            f"abs({resid}) AS abs_r",
        )
        .groupBy(*[f"w_{n}" for n in names])
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("abs_r").alias("sum_abs_err"),
        )
    )


def hash_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Hashing-trick term-frequency vectorizer: each lowercase word is
    hashed to one of ``num_buckets`` buckets with the engine-portable
    char-fold hash, and per-(doc, bucket) counts form the sparse
    feature vector — the fixed-dimension featurizer that needs no
    vocabulary pass (hence no global state) at 100 TB.

    Output: (id, bucket, tf) sparse triples.  Scale: explode + one
    map-combined groupBy on (id, bucket) — no vocabulary broadcast, no
    second scan, and the hash is straight-line codegen arithmetic.
    """
    from .dedup import char_poly_hash

    words = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("w"),
    )
    return (
        words.select(
            id_col, (char_poly_hash(F.col("w")) % num_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


#: boundary stopwords for RAKE candidate-phrase splitting (fixed,
#: deterministic — the method's quality comes from the degree/freq
#: statistics, not stopword completeness)
RAKE_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "on", "for", "with",
)


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 4,
    top_k: int = 50,
    grid: int = 10_000,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword/punctuation-free word runs
    (1..``max_words`` words); each word scores degree/freq where
    freq counts its phrase-occurrence instances and degree adds the
    containing phrase's length per instance; a phrase scores the sum
    of its member word scores (with multiplicity).

    All scores live on an integer ``grid`` (word score =
    ``degree*grid div freq`` — positive operands, so truncating and
    floor division agree in every engine), so the ranking is
    BIT-exact and a SQL oracle can restate it.  Output: top ``top_k``
    ``(phrase, score, n_occurrences)`` by (score DESC, phrase).

    Scale shape: phrase extraction is a narrow regexp map + explode;
    word statistics are ONE map-combined aggregate over word
    instances; the phrase score joins word scores back on the word
    key (shuffle equi-join, skew-bounded because stopword splitting
    caps phrase length); top-k is TakeOrderedAndProject — no global
    sort.
    """
    if max_words < 1 or top_k < 1 or grid < 1:
        raise ValueError("max_words/top_k/grid must be >= 1")
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"[^a-z\s]", "|")
    stop_pat = r"\b(" + "|".join(RAKE_STOPWORDS) + r")\b"
    t = F.regexp_replace(t, stop_pat, "|")
    phrases = df.select(
        F.explode(
            F.filter(
                F.transform(
                    F.split(t, r"\|"),
                    lambda x: F.trim(F.regexp_replace(x, r"\s+", " ")),
                ),
                lambda x: F.length(x) > 0,
            )
        ).alias("phrase")
    ).filter(F.size(F.split(F.col("phrase"), " ")) <= max_words)
    occurrences = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    inst = phrases.select(
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    )
    wstats = inst.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"),
    )
    wscore = wstats.selectExpr(
        "word", f"(degree * {grid}) div freq AS wscore"
    )
    # per phrase TYPE: member-word multiplicities once, then the join
    per_type = (
        occurrences.select(
            "phrase",
            F.explode(F.split(F.col("phrase"), " ")).alias("word"),
        )
        .groupBy("phrase", "word")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    scored = (
        per_type.join(wscore, "word")
        .groupBy("phrase")
        .agg(F.sum(F.col("mult") * F.col("wscore")).alias("score"))
        .join(occurrences, "phrase")
    )
    return (
        scored.select(
            "phrase",
            F.col("score").cast("long").alias("score"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
        .orderBy(F.col("score").desc(), F.col("phrase"))
        .limit(top_k)
    )


def bm25_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    grid: int = 10_000,
) -> DataFrame:
    """Disjunctive BM25-ranked retrieval (Robertson-Sparck Jones) over
    an in-plan inverted index, with the whole score kept EXACT until
    one final division.

    With ``k1 = 6/5`` and ``b = 3/4`` as exact rationals and the idf
    log replaced by its raw odds ratio ``(N - df + ½)/(df + ½)`` (the
    same monotone ranking — the tficf trade), each term's score

        ``idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``

    reduces to the integer ratio
    ``22·T·tf·(2N-2df+1) / ((2df+1)·(10·T·tf + 3·T + 9·dl·N))``
    (T = corpus token count, N = doc count, dl = doc length).  Each
    term contributes ``floor(ratio · grid)`` — a BIGINT floor
    division — summed exactly per doc; only the displayed score pays
    one double division by ``grid``.  Two engines therefore agree
    bit-for-bit; no float accumulates across terms.

    int64 headroom: the numerator is ``22·T·tf·(2N+1)·grid`` —
    safe through ~10⁵ docs × 10⁷ tokens at the default grid; at
    larger corpora drop ``grid`` (each factor of 10 buys one order)
    or switch the scoring to plain doubles and give up value-hash
    determinism (ranking is unaffected at realistic magnitudes).

    Scale shape: index build is a corpus pass (explode + map-combined
    (token, doc) aggregate); the query touches only |terms| posting
    lists (token filter pushes to a bucketed index's scan); N/T and
    per-term df are 1-row / |terms|-row broadcasts; the only
    data-sized shuffle keys on the doc id.

    Output: ``(id, n_terms, score)`` for docs matching ANY term.
    """
    if not terms:
        raise ValueError("search needs at least one term")
    idx = build_inverted_index(df, text_col, id_col)
    dl = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("t_tokens"),
    )
    hits = idx.filter(F.col("token").isin(list(terms)))
    dfreq = hits.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    # integer floor division of the exact numerator/denominator (both
    # positive BIGINT products)
    term_grid = F.expr(
        "CAST(22 AS BIGINT) * t_tokens * tf * (2*n_docs - 2*df + 1) * "
        f"{grid} div ((2*df + 1) * (10 * t_tokens * tf + 3 * t_tokens"
        " + 9 * dl * n_docs))"
    )
    return (
        scored.select(F.col(id_col), term_grid.cast("long").alias("sg"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("sg").cast("long").alias("score_grid"),
        )
        .select(
            id_col,
            "n_terms",
            (F.col("score_grid").cast("double") / F.lit(float(grid))).alias(
                "score"
            ),
        )
    )


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode-script mix per document — the companion to stopword
    language ID for corpora where the SCRIPT itself is the router
    (Latin vs Cyrillic vs CJK vs Greek): per-script character counts
    and the dominant script under a fixed precedence tie-break
    (latin > cyrillic > cjk > greek > other).

    Counting is ``length(text) - length(regexp_replace(text, class,
    ''))`` with EXPLICIT code-point ranges (U+0400-04FF Cyrillic,
    U+4E00-9FFF CJK unified, U+0370-03FF Greek) so Java regex and RE2
    state the identical class — no \\p{Script} name-table drift
    between engines.  Pure codegen narrow map: profiling 100 TB of
    text fuses into the scan, and the only aggregate downstream is
    whatever the caller groups by.
    """

    def n_of(cls: str):
        return (
            F.length(text_col)
            - F.length(F.regexp_replace(F.col(text_col), cls, ""))
        ).cast("long")

    n_latin = n_of("[A-Za-z]")
    n_cyr = n_of("[Ѐ-ӿ]")
    n_cjk = n_of("[一-鿿]")
    n_greek = n_of("[Ͱ-Ͽ]")
    n_digit = n_of("[0-9]")
    dom = (
        F.when(
            (n_latin >= n_cyr) & (n_latin >= n_cjk) & (n_latin >= n_greek)
            & (n_latin > 0),
            "latin",
        )
        .when((n_cyr >= n_cjk) & (n_cyr >= n_greek) & (n_cyr > 0), "cyrillic")
        .when((n_cjk >= n_greek) & (n_cjk > 0), "cjk")
        .when(n_greek > 0, "greek")
        .otherwise("other")
    )
    return df.select(
        F.col(id_col),
        n_latin.alias("n_latin"),
        n_cyr.alias("n_cyrillic"),
        n_cjk.alias("n_cjk"),
        n_greek.alias("n_greek"),
        n_digit.alias("n_digit"),
        dom.alias("dominant"),
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Canonical text normalization — the first pass of every corpus
    pipeline, so exact dedup catches typographic variants of the same
    document: lowercase; curly quotes/apostrophes -> straight; en/em
    dashes and minus -> hyphen; ellipsis char -> three dots;
    zero-width characters and BOM removed; unicode spaces (NBSP,
    en/em/thin space) and control characters collapsed to single
    spaces; trimmed.

    Pure codegen (translate + regexp_replace + lower) — a narrow map
    that fuses into the scan; normalizing 100 TB costs one corpus
    pass, no shuffle, no UDF.  Every mapping is an explicit
    code-point list, so any engine states the identical rules.
    """
    c = F.col(text_col)
    # typographic map: curly double/single quotes, dashes, minus
    c = F.translate(
        c,
        "\u201c\u201d\u201e\u2018\u2019\u201a\u2013\u2014\u2212",
        chr(34) * 3 + chr(39) * 3 + chr(45) * 3,
    )
    # ellipsis expands (1 -> 3 chars): regexp, not translate
    c = F.regexp_replace(c, "\u2026", "...")
    # drop zero-width chars and BOM
    c = F.regexp_replace(c, "[\u200b\u200c\u200d\ufeff]", "")
    # unicode spaces + control chars -> space
    c = F.regexp_replace(
        c, "[\u00a0\u2000-\u200a\u202f\u205f\u3000\x00-\x1f\x7f]", " "
    )
    c = F.regexp_replace(c, "  +", " ")
    return df.withColumn(out_col, F.lower(F.trim(c)))


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade-level scores from
    pure-regexp counts — the corpus-difficulty profile a curriculum /
    quality pipeline bands documents by.

    Classic formulas on the classic approximations: sentences =
    ``[.!?]+`` runs (min 1), words = whitespace tokens (min 1),
    syllables = vowel-GROUP runs ``[aeiouyAEIOUY]+`` (min 1 —
    the standard cheap estimator; consistent everywhere, which is
    what matters for banding).  All three counts are exact BIGINTs and
    the scores are fixed sequences of IEEE double ops on them, so any
    engine reproduces the values bit-for-bit (results are additionally
    quantized to the 1e-4 grid for display).

    Output: ``(id, n_sentences, n_words, n_syllables, flesch,
    fk_grade)`` — one narrow codegen map, no shuffle, no UDF.
    """
    s = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("long"),
        F.lit(1).cast("long"),
    )
    w = F.greatest(token_count(F.col(text_col)), F.lit(1).cast("long"))
    syl = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[aeiouyAEIOUY]+")).cast(
            "long"
        ),
        F.lit(1).cast("long"),
    )
    wps = w.cast("double") / s.cast("double")
    spw = syl.cast("double") / w.cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    q4 = lambda c: F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return df.select(
        F.col(id_col),
        s.alias("n_sentences"),
        w.alias("n_words"),
        syl.alias("n_syllables"),
        q4(flesch).alias("flesch"),
        q4(fk).alias("fk_grade"),
    )


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search via positional posting lists: documents
    where the phrase tokens appear CONSECUTIVELY, with the match
    count — the positional extension of :func:`search_index` (which is
    bag-of-words AND).

    Shape: ``posexplode`` of the whitespace token array gives
    (doc, position, token); each phrase term selects its posting list
    (a pushdown-able token filter — bucket-pruned when the index is a
    token-bucketed table) and the lists equi-join on
    ``(doc, position - offset)``, so adjacency is a pure hash join,
    never a string scan or regex over the corpus.  At 100 TB each join
    moves only the phrase terms' posting lists.

    Output: ``(id_col, n_matches)`` for documents with >= 1 match.
    """
    terms = [t for t in phrase if t]
    if len(terms) < 2:
        raise ValueError("phrase must have at least 2 tokens")
    base = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    cur = base.filter(F.col("token") == terms[0]).select(id_col, "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = base.filter(F.col("token") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("pos")
        )
        cur = cur.join(nxt, [id_col, "pos"])
    return cur.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )


def vocab_growth(
    df: DataFrame,
    quarters: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary-growth curve (Heaps'-law profile): distinct token
    count among the first i/``quarters`` of the corpus (by id order),
    for i = 1..quarters — the dataset-size diagnostic for "is more
    data still adding new vocabulary".

    One explode + ONE aggregate per token (its FIRST document id),
    then a bounded comparison against the quarter thresholds — the
    cumulative-distinct answer without re-scanning the corpus per
    checkpoint and without any distinct-over-growing-prefix shuffle
    chain.  Output: ``(quarter, n_docs, vocab)``.
    """
    if quarters < 1:
        raise ValueError("quarters must be >= 1")
    firsts = (
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .groupBy("__tok")
        .agg(F.min("__id").alias("__first"))
    )
    hi = df.agg(
        (F.max(F.col(id_col).cast("long")) + 1).alias("__hi")
    )
    qs = (
        hi.withColumn(
            "quarter", F.explode(F.sequence(F.lit(1), F.lit(quarters)))
        )
        .withColumn(
            "n_docs", F.expr(f"__hi * quarter div {quarters}")
        )
        .select("quarter", "n_docs")
    )
    return (
        firsts.crossJoin(F.broadcast(qs))
        .filter(F.col("__first") < F.col("n_docs"))
        .groupBy("quarter", "n_docs")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
        .select(
            F.col("quarter").cast("int").alias("quarter"),
            F.col("n_docs").cast("long").alias("n_docs"),
            "vocab",
        )
    )


def oov_rate(
    df: DataFrame,
    min_count: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "lang",
) -> DataFrame:
    """Out-of-vocabulary rate against a frequency-derived vocabulary:
    the vocabulary is every token with corpus frequency >=
    ``min_count`` (a deterministic threshold rule — top-k-by-frequency
    needs a tie-break contract; a count floor does not), and the OOV
    rate is the share of token OCCURRENCES outside it — the tokenizer/
    coverage health metric for corpus intake.

    Two aggregates over one exploded token stream: corpus frequency
    per token, joined back to the stream (the frequency table is
    small — vocabulary-sized — and broadcastable), then per-group
    occurrence counts.  Output: ``(group, total_tokens, oov_tokens,
    oov_permille)`` (permille floored — exact integer arithmetic).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    gcols = [group_col] if group_col else []
    stream = df.select(
        *gcols, F.explode(tokens(F.col(text_col))).alias("__tok")
    )
    freq = stream.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__f")
    )
    joined = stream.join(F.broadcast(freq), "__tok")
    agg = joined.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("total_tokens"),
        F.sum((F.col("__f") < min_count).cast("long"))
        .cast("long")
        .alias("oov_tokens"),
    )
    return agg.withColumn(
        "oov_permille",
        F.expr("oov_tokens * 1000 div total_tokens").cast("long"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher document-quality rule battery (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", App. A1.1 — the published
    heuristics behind MassiveWeb and most later web-corpus filters),
    each rule as its own boolean so downstream can tune rather than
    re-scan:

    - ``ok_word_count``: 50 <= words <= 100,000
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: (# '#' or '...' occurrences) / words < 0.1
    - ``ok_bullet_lines``: < 90% of lines start with a bullet
    - ``ok_ellipsis_lines``: < 30% of lines end with '...'
    - ``ok_alpha_words``: >= 80% of words contain a letter
    - ``ok_stopwords``: >= 2 DISTINCT Gopher stop words present
    - ``keep`` = all of the above

    Pure-codegen narrow map (token/line arrays staged as NAMED columns
    once — see SCALING.md on interpreted-HOF re-evaluation); at 100 TB
    this fuses into the scan like every other quality screen here.
    """
    staged = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("__toks"),
        F.filter(
            F.split(F.col(text_col), r"\n"),
            lambda ln: F.length(F.trim(ln)) > 0,
        ).alias("__lines"),
        (
            F.size(F.split(F.col(text_col), r"#", -1))
            - 1
            + F.size(F.split(F.col(text_col), r"\.\.\.", -1))
            - 1
        ).alias("__symbols"),
    )
    toks = F.col("__toks")
    lines = F.col("__lines")
    words = F.size(toks)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_wl = F.when(
        words > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).cast("double")
        / words,
    )
    alpha_ratio = F.when(
        words > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
        / words,
    )
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike(r"^[-*•]"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$")))
        .cast("double")
        / n_lines
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = staged.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        ((words >= 50) & (words <= 100_000)).alias("ok_word_count"),
        ((mean_wl >= 3.0) & (mean_wl <= 10.0)).alias("ok_mean_word_len"),
        (
            F.when(words > 0, F.col("__symbols").cast("double") / words)
            < 0.1
        ).alias("ok_symbol_ratio"),
        (bullet_ratio < 0.9).alias("ok_bullet_lines"),
        (ellipsis_ratio < 0.3).alias("ok_ellipsis_lines"),
        (alpha_ratio >= 0.8).alias("ok_alpha_words"),
        (stop_hits >= 2).alias("ok_stopwords"),
    )
    keep = (
        F.coalesce(F.col("ok_word_count"), F.lit(False))
        & F.coalesce(F.col("ok_mean_word_len"), F.lit(False))
        & F.coalesce(F.col("ok_symbol_ratio"), F.lit(False))
        & F.col("ok_bullet_lines")
        & F.col("ok_ellipsis_lines")
        & F.coalesce(F.col("ok_alpha_words"), F.lit(False))
        & F.col("ok_stopwords")
    )
    return flags.withColumn("keep", keep)


def c4_clean(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The C4 line-level cleaning pass (Raffel et al. 2020, §2.2 —
    the published rules that built the C4 corpus), re-expressed as a
    pure-codegen narrow map:

    - keep only lines ending in terminal punctuation (``. ! ? "``)
    - keep only lines with at least 5 words
    - drop lines containing the word "javascript" (cookie/JS
      boilerplate)
    - page-level: drop pages containing "lorem ipsum" or a curly
      brace (code), or with fewer than 3 surviving lines (the
      paper's three-sentence floor, with terminal-punctuated lines
      as the sentence proxy)

    Output: ``(id, clean_text, n_lines, n_kept, keep_page)`` — the
    cleaned text is rebuilt in original line order; rejected pages
    still report their flags so the drop is auditable.  Line arrays
    are staged as named columns (interpreted-HOF lesson, SCALING.md);
    no shuffle — the 100 TB pass fuses into the scan."""
    staged = df.select(
        F.col(id_col),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("__lorem"),
        F.col(text_col).contains("{").alias("__brace"),
        F.filter(
            F.split(F.col(text_col), r"\n"),
            lambda ln: F.length(F.trim(ln)) > 0,
        ).alias("__lines"),
    )
    lines = F.col("__lines")
    is_kept = (
        lambda ln: F.trim(ln).rlike(r'[.!?"]$')
        & (
            F.size(
                F.filter(
                    F.split(F.trim(ln), r"\s+"),
                    lambda w: F.length(w) > 0,
                )
            )
            >= 5
        )
        & ~F.lower(ln).contains("javascript")
    )
    kept = staged.select(
        F.col(id_col),
        "__lorem",
        "__brace",
        F.size(lines).cast("long").alias("n_lines"),
        F.filter(lines, is_kept).alias("__kept"),
    )
    return kept.select(
        F.col(id_col),
        F.array_join(F.transform(F.col("__kept"), F.trim), "\n").alias(
            "clean_text"
        ),
        "n_lines",
        F.size("__kept").cast("long").alias("n_kept"),
        (
            ~F.col("__lorem")
            & ~F.col("__brace")
            & (F.size("__kept") >= 3)
        ).alias("keep_page"),
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY against the whole corpus: the share
    of a document\'s distinct character n-grams that appear in NO
    other document — the cheap "is this document adding anything new"
    signal a curriculum/sampling pipeline uses to up-weight novel
    material and down-weight boilerplate (the complement of the dedup
    family: dedup removes near-copies, novelty RANKS what remains).

    Inverted-index shape, all linear: explode each document\'s
    distinct shingle set (the dedup family\'s guarded
    :func:`~pandasy_spark.extended.dedup.shingles`), ONE
    vocabulary-keyed aggregate for corpus document frequency, ONE
    join back + doc-keyed aggregate — shuffle keys are the gram
    vocabulary and the doc id, both natural partitions at 100 TB;
    never a pairwise comparison.  Novelty lands on the integer
    lattice: ``novelty_bp = (n_unique·10000) div n_shingles``.

    Documents shorter than ``n`` characters have no shingle set and
    are ABSENT from the output (no well-defined novelty), same
    convention as the dedup kernels.

    Output: ``(id, n_shingles, n_unique, novelty_bp)``.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from .dedup import shingles

    e = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    # (id, gram) rows are UNIQUE by construction (shingles emits each
    # doc's DISTINCT gram set), so corpus document frequency is a
    # plain count — and a df==1 gram has exactly ONE owner, namely
    # min(id) of its single row.  Carrying the owner through the gram
    # aggregate replaces the join-back of every gram row (the old
    # third full-vocabulary shuffle) with a doc-keyed count of the
    # unique grams only: three map-combined aggregates + a doc-sized
    # left join, no gram-row join, no hot-gram window.  Measured 2.5x
    # at sf0.1 (712k gram rows); identical output.
    per_gram = e.groupBy("gram").agg(
        F.count(F.lit(1)).alias("__df"), F.min("id").alias("__owner")
    )
    uniq = (
        per_gram.filter(F.col("__df") == 1)
        .groupBy(F.col("__owner").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
    )
    base = e.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return (
        base.join(uniq, "id", "left")
        .withColumn(
            "n_unique", F.coalesce(F.col("n_unique"), F.lit(0).cast("long"))
        )
        .select(
            "id",
            "n_shingles",
            "n_unique",
            F.expr("(n_unique * 10000) div n_shingles").alias("novelty_bp"),
        )
    )


def boilerplate_strip(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-frequency line-level boilerplate removal — the CCNet
    rule (Wenzek et al. 2020): a line that appears in >= ``min_docs``
    DISTINCT documents is template chrome (nav bars, footers, cookie
    banners) and is dropped EVERYWHERE, including its first
    occurrence.  The complementary semantics to ``paragraph_dedup``'s
    first-occurrence rule: dedup keeps one copy of repeated content;
    boilerplate removal keeps zero copies of template content —
    a cleaning pipeline typically runs both.

    Scale shape: lines posexplode narrowly off the scan; the document
    frequency is ONE map-combined distinct-doc count per line hash
    (count_distinct collapses per-mapper duplicates of a hot line
    before the shuffle); the verdict joins back by the same hash
    (hash equi-join — at 100 TB the df table is the distinct-line
    set, the natural join key distribution); reconstruction is one
    per-document aggregate whose partitions are bounded by document
    length.  Empty/whitespace-only lines are dropped from both the
    count and the rebuilt text.

    Output: ``(id, clean_text, n_lines, n_kept)`` — one row per input
    document id, text rebuilt in original line order (empty string
    when everything was chrome, and ``('', 0, 0)`` for documents with
    no non-empty lines at all).
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    lines = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "__pos", "__line"
            ),
        )
        .filter(F.trim(F.col("__line")) != "")
        .select(
            "__id",
            "__pos",
            "__line",
            F.md5(F.trim(F.col("__line"))).alias("__key"),
        )
    )
    freq = lines.groupBy("__key").agg(
        F.countDistinct("__id").alias("__df")
    )
    flagged = lines.join(freq, "__key").select(
        "__id",
        "__pos",
        "__line",
        (F.col("__df") < min_docs).alias("__keep"),
    )
    rebuilt = flagged.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct("__pos", "__line"),
                        )
                    )
                ),
                lambda x: x["__line"],
            ),
        ).alias("clean_text"),
    )
    # a document with NO non-empty lines contributes no line rows —
    # restore it as ('', 0, 0) so callers joining back by id never
    # silently lose documents (round-11 session-2 review finding)
    all_ids = df.select(F.col(id_col).alias("__id")).distinct()
    return all_ids.join(rebuilt, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("long")
        .alias("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
        .alias("n_kept"),
    )
