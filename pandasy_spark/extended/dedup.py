"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

No counterpart in the reference; designed Spark-first for 100 TB-scale
corpus dedup:

- exact dedup: hash-partitioned ranking window on a content hash —
  one shuffle keyed by digest, no driver involvement, no skew (md5
  keys are uniform).
- MinHash+LSH: shingle -> k hash functions -> per-doc signature ->
  banded bucket join.  Only documents sharing a band bucket are ever
  paired, so the candidate set is ~linear in corpus size instead of
  O(n^2).  All hashing is engine-portable MINSTD int64 arithmetic
  (JVM, codegen'd; DuckDB oracles rebuild identical values).
- LSH anchor dedup: per-bucket min-id anchors -> exact verification ->
  per-doc drop decision — linear work AND output even when near-dup
  clusters hold most of the corpus (pair LISTING is output-quadratic
  there by definition).
- n-gram Jaccard: exact verification kernel (array_intersect /
  array_union on distinct shingle sets) — used to verify LSH
  candidates, or brute-force on small bounded subsets.
- SimHash: 32-bit rotation-free signature from token hashes; near-dup
  candidates share the signature on one of the 4 bytes (blocked
  Hamming search).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import qround
from .text import fingerprint

# All dedup hashing below is pure int64 arithmetic modulo the MINSTD
# prime — engine-portable, so the minhash/simhash gate queries can be
# hash-checked against a DuckDB oracle that rebuilds the same values
# (xxhash64, the r1 hash source, exists only in Spark).  Every
# intermediate stays well inside int64, so ANSI overflow checks are
# safe.  a in [1, p-1] is a bijection mod prime p, so the affine family
# (a_i*h + b_i) mod p is a textbook universal family.
_P31 = 2147483647  # 2^31 - 1 (prime)
_ROLL_MOD = 9_007_199_254_740_992  # 2^53: (acc*257 + code) stays in int64
# 48271 is a primitive root mod 2^31-1, so its powers sweep [1, p-1]
# — well-spread multipliers, and a*h < 2^62 stays in int64.
_MINHASH_A = [pow(48271, i + 2, _P31) for i in range(64)]
_MINHASH_B = [(1103515245 * (i + 1) + 12345) % _P31 for i in range(64)]

__all__ = [
    "exact_dedup",
    "shingles",
    "ngram_jaccard_pairs",
    "blocked_jaccard_pairs",
    "hashed_shingles",
    "rolling_dup_pairs",
    "minhash_signatures",
    "banded_buckets",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_index",
    "dedup_against_index",
    "simhash",
    "simhash_candidate_pairs",
    "ngram_contamination",
    "winnow_fingerprints",
    "winnow_dup_pairs",
    "connected_components",
    "span_dedup",
    "levenshtein_dup_pairs",
    "bloom_build",
    "bloom_might_contain",
    "bloom_decontaminate",
    "containment_pairs",
    "paragraph_dedup",
    "token_weight_rows",
    "weighted_minhash_signatures",
    "weighted_jaccard_pairs",
    "lsh_verified_pairs",
    "lsh_anchor_dedup",
    "keep_best_representative",
]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (lowest id) per exact normalized text.

    ``min_by(row, id)`` grouped by the md5 fingerprint: a hash
    aggregate with map-side partial combine, so a corpus where one
    document dominates (billions of copies -> one hot fingerprint)
    still collapses per-mapper before the shuffle.  The previous
    ranking-window form funneled all copies of a hot key into a single
    reducer task; distinct-content keys were uniform, duplicate-content
    keys are by definition not."""
    fp = fingerprint(F.col(text_col))
    cols = df.columns
    return (
        df.groupBy(fp.alias("__fp"))
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols])
    )


def char_poly_hash(col: Column, n: int | None = None) -> Column:
    """Karp-Rabin char fold ``(acc*257 + code) mod 2^53`` reduced mod
    the MINSTD prime — an engine-portable string hash (DuckDB:
    ``list_reduce`` over ``ord`` codes).  The base primitive under the
    minhash family.

    With ``n`` set (input known to be exactly ``n`` chars, e.g. a
    shingle), the fold is unrolled into ``n`` ``ascii(substring(...))``
    terms — identical values, but straight-line whole-stage-codegen
    arithmetic with no per-row array allocation (~30% faster minhash
    end-to-end).  Leave ``n=None`` for variable-length inputs."""
    if n is not None:
        acc: Column = F.lit(0).cast("long")
        for i in range(n):
            acc = (acc * F.lit(257) + F.ascii(F.substring(col, i + 1, 1))) % F.lit(
                _ROLL_MOD
            )
        return acc % F.lit(_P31)
    chars = F.filter(F.split(col, ""), lambda c: F.length(c) > 0)
    h53 = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(257) + F.ascii(c)) % F.lit(_ROLL_MOD),
    )
    return h53 % F.lit(_P31)


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct character n-gram set of a string (empty array if the
    string is shorter than n).

    Guarded: ``sequence(1, 0)`` in Spark counts DOWN ([1, 0]), which
    would emit short junk shingles for strings of length 1..n-1."""
    cnt = F.length(col) - (n - 1)
    return F.when(
        cnt > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt), lambda i: F.substring(col, i, n)
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def hashed_shingles(col: Column, n: int = 3) -> Column:
    """Distinct character n-gram set as PORTABLE int64 HASHES (the
    Karp-Rabin/MINSTD fold of each n-gram, computed positionally — no
    substring array is ever materialized).  Set operations on int64
    arrays are several times cheaper than on string arrays (no string
    hashing/equality in the hot loop, 8-byte fixed width in shuffle
    buffers), which is what matters when a blocked-Jaccard join
    evaluates millions of candidate pairs; the Jaccard over hashed
    sets is the MinHash family's exact counterpart (identical up to
    31-bit collisions, ~1e-5 per document at n=3 set sizes)."""
    cnt = F.length(col) - (n - 1)

    def sh_hash(i):
        acc: Column = F.lit(0).cast("long")
        for j in range(n):
            acc = (acc * F.lit(257) + F.ascii(F.substring(col, i + j, 1))) % F.lit(
                _ROLL_MOD
            )
        return acc % F.lit(_P31)

    return F.when(
        cnt > 0,
        F.array_distinct(F.transform(F.sequence(F.lit(1), cnt), sh_hash)),
    ).otherwise(F.array().cast("array<long>"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_rows: int | None = 20_000,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs (id1 < id2).

    O(n^2) — a bounded-subset / LSH-candidate VERIFICATION kernel, not
    a whole-corpus operator; use ``blocked_jaccard_pairs`` or
    ``lsh_candidate_pairs`` at scale.  Guarded by ``max_rows`` (one
    count job); ``max_rows=None`` explicitly accepts an unbounded
    quadratic run."""
    from .similarity import _guard_quadratic

    _guard_quadratic(df, max_rows, "ngram_jaccard_pairs")
    a = df.select(
        F.col(id_col).alias("id1"), shingles(F.col(text_col), n).alias("s1")
    ).filter(F.size("s1") > 0)
    b = df.select(
        F.col(id_col).alias("id2"), shingles(F.col(text_col), n).alias("s2")
    ).filter(F.size("s2") > 0)
    pairs = a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    uni = F.size(F.array_union("s1", "s2")).cast("double")
    jac = inter / uni
    return (
        pairs.withColumn("jaccard", qround(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: explode distinct shingles, hash
    each once, apply ``num_hashes`` affine transforms, take the
    column-wise min.

    Map-side partial aggregation keeps the shuffle at
    |docs| x num_hashes, independent of shingle counts.  The intake is
    ``_spread``: a small parquet arrives as ONE split (one row group)
    and would pin the whole shingle-hash kernel to one core; the guard
    is a no-op when the scan is already parallel.  Shingles are
    deliberately NOT deduplicated per document: column-wise min is
    duplicate-insensitive, so the values are identical to the set
    version while skipping a per-row ``array_distinct`` pass."""
    df = _spread(df)
    cnt = F.length(F.col(text_col)) - (n - 1)

    # One Karp-Rabin char-fold per shingle POSITION (no n-gram string
    # is ever materialized — same values as char_poly_hash over the
    # substring, straight-line codegen arithmetic), then k affine
    # (universal-family) transforms mod the MINSTD prime — k integer
    # multiply-adds are far cheaper than k string hashes, with
    # equivalent minhash quality, and the whole construction is
    # reproducible in any SQL engine (DuckDB oracle-checkable).
    def sh_hash(i):
        acc: Column = F.lit(0).cast("long")
        for j in range(n):
            acc = (
                acc * F.lit(257) + F.ascii(F.substring(F.col(text_col), i + j, 1))
            ) % F.lit(_ROLL_MOD)
        return acc % F.lit(_P31)

    grams = F.when(
        cnt > 0, F.transform(F.sequence(F.lit(1), cnt), sh_hash)
    ).otherwise(F.array().cast("array<long>"))
    sh = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("__h"))
    mins = [
        F.min(
            (F.col("__h") * F.lit(_MINHASH_A[i]) + F.lit(_MINHASH_B[i]))
            % F.lit(_P31)
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def banded_buckets(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """(id, band, bucket) rows: the signature split into ``bands``
    contiguous slices, each folded to one integer bucket (engine-
    portable fold, uniform keys).  This IS the persistable LSH index
    layout — write it bucketed on (band, bucket) and incremental dedup
    joins against it without touching the corpus."""
    sig_len_col = F.size("signature")
    width = (sig_len_col / bands).cast("int")
    return signatures.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.aggregate(
                    F.slice("signature", b * width + 1, width),
                    F.lit(0).cast("long"),
                    lambda acc, v: (acc * F.lit(48271) + v) % F.lit(_P31),
                ),
            )
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8
) -> DataFrame:
    """Banded LSH: split each signature into ``bands`` contiguous rows
    of equal width, hash each band, and self-join on (band index, band
    hash).  Emits distinct (id1 < id2) candidate pairs.

    The self-join is an equi-join on uniform hash keys — shuffle
    partitioned by bucket, broadcast-free, skew-free unless a bucket is
    pathologically hot (boilerplate-heavy corpora: raise ``bands``)."""
    banded = banded_buckets(signatures, bands)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup pipeline: signatures -> LSH candidates ->
    signature-estimated Jaccard filter.  Returns (id1, id2, est_jaccard).
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
    cands = lsh_candidate_pairs(sigs, bands)
    s1 = sigs.select(F.col("id").alias("id1"), F.col("signature").alias("sig1"))
    s2 = sigs.select(F.col("id").alias("id2"), F.col("signature").alias("sig2"))
    joined = cands.join(s1, "id1").join(s2, "id2")
    eq = F.zip_with("sig1", "sig2", lambda a, b: (a == b).cast("int"))
    est = F.aggregate(eq, F.lit(0), lambda acc, x: acc + x).cast("double") / F.size(
        "sig1"
    )
    return (
        joined.withColumn("est_jaccard", qround(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id1", "id2", "est_jaccard")
    )


def _spread(df: DataFrame) -> DataFrame:
    """Fan a too-coarsely-split input out to the cluster's parallelism.

    Shingle hashing is CPU-heavy per input BYTE, so a small parquet
    (one row group -> ONE split no matter what maxPartitionBytes says)
    serializes the whole kernel on one core.  Delegates to
    sources.catalog.ensure_min_partitions, which also installs the
    localCheckpoint optimization barrier (Catalyst pushes
    computed-column filters straight through a bare ``Repartition``,
    landing the heavy expressions back in the single-task scan).  At
    real scale inputs arrive in thousands of splits and this is a
    metadata-only no-op."""
    from ..sources.catalog import ensure_min_partitions

    return ensure_min_partitions(df)


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """LSH candidates -> EXACT Jaccard verification: the whole-corpus
    near-dedup composition that stays linear in corpus size.

    Candidate pairs come from banded MinHash LSH
    (:func:`lsh_candidate_pairs` — one equi-join on uniform band
    buckets), and only those pairs get the exact hashed-shingle Jaccard
    (two id equi-joins against the shingle sets + one set intersection
    per CANDIDATE, never per corpus pair).  Total work is
    O(|corpus| x num_hashes + |candidates|); with 16 bands of width 2
    over 32 hashes, a pair at the 0.6 threshold shares a band bucket
    with p = 1-(1-0.6^2)^16 ~ 0.999, so recall at the threshold is
    effectively exact while unrelated pairs almost never collide.

    Contrast :func:`blocked_jaccard_pairs` (sum |block|^2 — superlinear
    when blocks grow with the corpus) and :func:`ngram_jaccard_pairs`
    (|corpus|^2, bounded-subset verification only).  Reference parity:
    slide's dedup surface exposes exact + minhash paths; this is their
    scale composition.

    OUTPUT-BOUND CAVEAT: pair ENUMERATION is Omega(true pair count),
    and a corpus with near-dup clusters of size m contains m^2/2 true
    pairs — no candidate scheme beats that (measured: 5k docs with a
    ~3.8k-doc near-dup cluster -> 11.6M candidate pairs).  When the
    goal is dedup (not pair listing), use :func:`lsh_anchor_dedup`,
    which stays linear by verifying each doc against per-bucket anchors
    only.
    """
    df = _spread(df)
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
    cands = lsh_candidate_pairs(sigs, bands)
    # pinned: both join branches consume the shingle pass (see
    # lsh_anchor_dedup) — one computation instead of two
    sets_ = df.select(
        F.col(id_col).alias("id"),
        hashed_shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0).localCheckpoint(eager=False)
    joined = cands.join(
        sets_.select(F.col("id").alias("id1"), F.col("sh").alias("s1")), "id1"
    ).join(sets_.select(F.col("id").alias("id2"), F.col("sh").alias("s2")), "id2")
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    uni = (F.size("s1") + F.size("s2")).cast("double") - inter
    jac = inter / uni
    return (
        joined.withColumn("jaccard", qround(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def lsh_anchor_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Whole-corpus near-dedup with LINEAR work AND linear output:
    LSH anchor (star) linking -> exact Jaccard verification -> per-doc
    drop decision.

    Each band bucket elects its minimum id as the anchor; every other
    member is verified (exact hashed-shingle Jaccard) against its <=
    ``bands`` anchors only — never against all bucket members.  A doc
    verified >= ``threshold`` against any smaller-id anchor is a
    duplicate; the row (id, dup_of = min such anchor, jaccard of that
    anchor) is emitted.  Work is O(|corpus| x bands) candidates
    regardless of cluster structure — the shape that survives a corpus
    where one near-dup cluster holds most of the data (there, PAIR
    enumeration is Omega(|cluster|^2) by output size alone; see
    :func:`lsh_verified_pairs`).

    The greedy anchor pass is the standard production near-dedup
    compromise (cluster membership via bucket anchors, not full
    transitive closure); compose with :func:`connected_components` on
    the emitted (id, dup_of) edges when full-cluster transitivity is
    required.  Every step (min ids, exact Jaccard, min-by tie-break)
    is deterministic and engine-portable — the DuckDB oracle rebuilds
    it bit-for-bit.
    """
    df = _spread(df)
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
    banded = banded_buckets(sigs, bands)
    # 1 row per bucket: map-side-combined min, immune to bucket skew
    anchors = banded.groupBy("band", "bucket").agg(F.min("id").alias("anchor"))
    cands = (
        banded.join(anchors, on=["band", "bucket"])
        .filter(F.col("anchor") < F.col("id"))
        .select("id", "anchor")
        .distinct()
    )
    # pinned: the hashed-shingle pass is the heaviest per-row kernel
    # here and BOTH sides of the verify join consume it — unpinned it
    # runs twice (once per join branch; the exchanges differ by key so
    # nothing is reused)
    sets_ = df.select(
        F.col(id_col).alias("__sid"),
        hashed_shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0).localCheckpoint(eager=False)
    joined = cands.join(
        sets_.select(F.col("__sid").alias("id"), F.col("sh").alias("s1")), "id"
    ).join(
        sets_.select(F.col("__sid").alias("anchor"), F.col("sh").alias("s2")),
        "anchor",
    )
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    uni = (F.size("s1") + F.size("s2")).cast("double") - inter
    verified = joined.withColumn("jac", qround(inter / uni, 4)).filter(
        F.col("jac") >= threshold
    )
    return (
        verified.groupBy("id")
        .agg(
            F.min("anchor").alias("dup_of"),
            F.min_by("jac", "anchor").alias("jaccard"),
        )
        .select(F.col("id").alias(id_col), "dup_of", "jaccard")
    )


def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Build the persistable LSH bucket index of a corpus: (id, band,
    bucket) rows.  At 100 TB this is computed ONCE per corpus and
    stored bucketed on (band, bucket) (sources.write_bucketed_table);
    each new crawl batch then dedups against it with one co-located
    equi-join instead of re-reading the corpus text."""
    return banded_buckets(
        minhash_signatures(df, id_col, text_col, num_hashes, n), bands
    )


def dedup_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Incremental near-dedup: drop new documents that share ANY LSH
    band bucket with an already-indexed corpus.

    Cost is proportional to the NEW batch (signatures over new docs
    only) plus one equi-join against the index — the corpus text is
    never touched.  Both sides of the join are uniform hash keys; with
    the index stored bucketed on (band, bucket) the join is shuffle-
    free on the corpus side.  Returns the surviving rows of
    ``new_docs`` (all columns).
    """
    new_buckets = minhash_index(
        new_docs, id_col, text_col, num_hashes, bands, n
    )
    dup_ids = (
        new_buckets.join(index, on=["band", "bucket"], how="left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return new_docs.join(dup_ids, on=id_col, how="left_anti")


def simhash(col: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: per-bit majority vote of token
    hashes, fully columnar (no UDF).  Returns a non-negative long."""
    tokens = F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)
    hashes = F.transform(tokens, lambda t: char_poly_hash(t))

    def _bit(h: Column, i: int) -> Column:
        # per-bit MINSTD mix of the token hash — engine-portable
        # pseudo-random bit i (the poly hash's own low bits are too
        # structured for direct use)
        x0 = (h * F.lit(1103515245) + F.lit(i * 12345 + 12345)) % F.lit(_P31)
        x1 = (x0 * F.lit(48271)) % F.lit(_P31)
        x2 = (x1 * F.lit(48271)) % F.lit(_P31)
        return x2 % 2

    def _bit_sum(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(_bit(h, i) == 1, 1).otherwise(-1),
        )

    bit_sums = [_bit_sum(i) for i in range(bits)]
    out = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return out


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    blocks: int = 4,
) -> DataFrame:
    """Blocked Hamming search: near-dup simhashes (distance < blocks)
    must agree exactly on at least one of ``blocks`` bit-blocks, so a
    per-block equi-join finds all such pairs without O(n^2)."""
    width = bits // blocks
    mask = (1 << width) - 1
    sh = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("sh")
    )
    blocked = sh.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sh", b * width).bitwiseAND(F.lit(mask))
                    for b in range(blocks)
                ]
            )
        ).alias("block", "key"),
    )
    left, right = blocked.alias("l"), blocked.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.block") == F.col("r.block"),
                F.col("l.key") == F.col("r.key"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .distinct()
    )


def blocked_jaccard_pairs(
    df: "DataFrame",
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    hashed: bool = False,
    salt: int = 16,
) -> "DataFrame":
    """Exact n-gram Jaccard restricted to BLOCKS (equal values of
    ``block_cols`` — e.g. source, language, a time bucket, or an LSH
    band): the candidate join is an equi-join on the block keys, so
    work is sum(|block|^2) instead of |corpus|^2 and each block's
    pairs are produced by one co-partitioned shuffle join.

    ``hashed=True`` compares :func:`hashed_shingles` int64 sets
    instead of string sets — the form to run at scale (the pair loop
    stops hashing strings) at the cost of
    Jaccard-up-to-31-bit-collisions semantics.

    ``salt`` splits each block's LEFT side into ``salt`` id-hash
    sub-chunks with the right side replicated across them — blocking
    keys are few by design (30 blocks would cap parallelism at 30
    tasks while the block with 451 docs burns 100k pair evaluations in
    ONE of them), and the salt restores uniform fan-out without
    changing the pair set (each pair matches at exactly one salt
    value).  Union size comes from inclusion-exclusion
    (``|A|+|B|-|A∩B|``) — half the set-op cost of an array_union.

    This is the scale path for near-dedup when a natural blocking key
    exists; use ``lsh_candidate_pairs`` when it does not."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    sh = hashed_shingles if hashed else shingles
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id1"),
        sh(F.col(text_col), n).alias("s1"),
    ).filter(F.size("s1") > 0)
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id2"),
        sh(F.col(text_col), n).alias("s2"),
    ).filter(F.size("s2") > 0)
    if salt > 1:
        a = a.withColumn("__salt", F.pmod(F.crc32(F.col("id1").cast("string")), F.lit(salt)))
        b = b.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long")))
        )
        join_keys = list(block_cols) + ["__salt"]
    else:
        join_keys = list(block_cols)
    pairs = a.join(b, on=join_keys).filter(F.col("id1") < F.col("id2"))
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    uni = (F.size("s1") + F.size("s2")).cast("double") - inter
    jac = inter / uni
    return (
        pairs.withColumn("jaccard", qround(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select(*block_cols, "id1", "id2", "jaccard")
    )


def rolling_dup_pairs(
    df: "DataFrame",
    id_col: str,
    key_cols: list[str],
    time_col: str,
    window_seconds: int,
) -> "DataFrame":
    """Time-rolling duplicate pairs: rows with equal ``key_cols`` whose
    timestamps are within ``window_seconds`` of each other — the
    ingestion-time guard for repeated records in an event stream.

    Scale shape: time is quantized into ``window_seconds`` buckets; the
    left side is exploded into its bucket ± 1 (3x inflation), the right
    side keeps its single bucket, and the join runs co-partitioned on
    (keys + bucket).  Any pair within the window spans at most adjacent
    buckets, and each pair matches in EXACTLY one (left-replica, right)
    combination — no distinct pass needed.  Work is Σ|bucket-group|²,
    never |corpus|², and skewed key groups split across buckets."""
    window_us = int(window_seconds) * 1_000_000
    bucket = F.floor(F.unix_micros(F.col(time_col)) / F.lit(window_us)).cast("long")
    left = df.select(
        *key_cols,
        F.col(id_col).alias("id1"),
        F.col(time_col).alias("__t1"),
        F.explode(
            F.array(bucket - F.lit(1), bucket, bucket + F.lit(1))
        ).alias("__b"),
    )
    right = df.select(
        *key_cols,
        F.col(id_col).alias("id2"),
        F.col(time_col).alias("__t2"),
        bucket.alias("__b"),
    )
    pairs = left.join(right, on=list(key_cols) + ["__b"]).filter(
        (F.col("id1") < F.col("id2"))
        & (
            F.abs(F.unix_micros("__t1") - F.unix_micros("__t2"))
            <= F.lit(window_us)
        )
    )
    return pairs.select(*key_cols, "id1", "id2")


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at
    least ``min_shared`` distinct word ``n``-grams with an evaluation
    set — the standard pre-training hygiene step that keeps eval
    answers out of the training corpus.

    Shape: explode distinct n-grams on both sides, semi-join train
    grams against the (small, distinct) benchmark gram set, count per
    train doc.  The join is an equi-join on gram strings; the
    benchmark side is tiny and broadcasts, so the cost is one scan +
    explode of the training corpus regardless of corpus size.

    Output: (id, n_shared) for contaminated docs only — anti-join it
    back against the corpus to drop them."""
    from .text import word_ngrams

    t = train.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_ngrams(F.col(text_col), n))
        ).alias("g"),
    )
    b = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_ngrams(F.col(text_col), n))
            ).alias("g")
        )
        .distinct()
    )
    return (
        t.join(F.broadcast(b), on="g", how="left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(F.col("id").alias(id_col), "n_shared")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD '03 —
    the MOSS algorithm): hash every character k-gram, slide a window of
    ``w`` consecutive hashes, keep each window's minimum; the distinct
    minima are the document's fingerprint set.

    Guarantee: any shared substring of length >= w + k - 1 between two
    documents yields at least one shared fingerprint — unlike MinHash
    (whole-document similarity), winnowing detects LOCAL overlap
    (quotations, partial copies) with bounded sketch density ~2/(w+1).

    Everything is the engine-portable Karp-Rabin/MINSTD arithmetic in
    array built-ins (transform/slice/array_min) — one narrow pass, no
    shuffle, DuckDB-oracle-checkable.  Dup detection = explode + equi-
    join on fingerprint value, the same scale shape as LSH buckets.

    Output: (id, fp) exploded distinct fingerprint rows."""
    text = F.col(text_col)

    def gram_hash(i):  # i: 1-based Column position
        acc: Column = F.lit(0).cast("long")
        for j in range(k):
            acc = (acc * F.lit(257) + F.ascii(F.substring(text, i + j, 1))) % F.lit(
                _ROLL_MOD
            )
        return acc % F.lit(_P31)

    nh = F.length(text) - (k - 1)
    hs_expr = F.when(
        nh > 0, F.transform(F.sequence(F.lit(1), nh), gram_hash)
    ).otherwise(F.array().cast("array<long>"))
    # materialize the k-gram hash array as a NAMED column before the
    # window pass: embedding `hs` inside the window lambda would
    # re-evaluate the whole O(L·k) gram expression once PER WINDOW
    # element (higher-order lambdas are interpreted with no common-
    # subexpression elimination) — measured 0.6 s/row at L≈300 vs
    # ~1 ms/row with the attribute reference (O(L²·k) -> O(L·k))
    staged = df.select(F.col(id_col).alias("id"), hs_expr.alias("__hs"))
    hs = F.col("__hs")
    nw = F.size(hs) - (w - 1)
    fps = (
        F.when(
            nw > 0,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), nw),
                    lambda i: F.array_min(F.slice(hs, i, w)),
                )
            ),
        )
        # shorter than one full window but at least one gram: the
        # whole hash array is the single window
        .when(F.size(hs) > 0, F.array(F.array_min(hs)))
        .otherwise(F.array().cast("array<long>"))
    )
    return staged.select("id", F.explode(fps).alias("fp"))


def winnow_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Local-overlap candidate pairs: documents sharing at least
    ``min_shared`` winnowing fingerprints.  Equi-join on fingerprint
    value (uniform keys), count per pair — linear candidates, no
    all-pairs comparison."""
    fp = winnow_fingerprints(df, id_col, text_col, k, w)
    a = fp.select(F.col("id").alias("id1"), "fp")
    b = fp.select(F.col("id").alias("id2"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 25,
    small_graph_edges: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over a duplicate-pair edge list, via the
    alternating large-star / small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14).

    This is the missing last mile of every candidate-pair generator in
    this module (LSH, SimHash, blocked Jaccard, winnowing): pairs only
    say "these two documents match"; dedup at corpus scale needs the
    transitive CLUSTERS so one survivor per cluster can be kept.  A
    driver-side union-find over collected pairs caps out at what fits
    in one process; this version keeps the whole graph distributed:

    - each round is two groupBy+join passes over the edge list (one
      shuffle each, keyed by node id — uniform keys, no skew beyond
      the graph's own degree skew, which large-star itself flattens),
    - the edge set monotonically converges to a star forest
      (node -> min-id root) in O(log^2 n) rounds (2-4 in practice on
      dedup graphs, whose components are near-cliques),
    - lineage is truncated with ``localCheckpoint`` every round, the
      standard guard against the unbounded-plan-growth trap of
      iterative algorithms on Spark (on a cluster, prefer
      ``checkpoint`` with a durable checkpoint dir).

    Returns ``(node, component)`` for every node appearing in an edge;
    ``component`` is the minimum node id in the connected component.
    Reference has no graph surface (pandas kernels only); this extends
    the dedup family per SURVEY.md §2.9.

    Pass a ``stats`` dict to receive run telemetry after the (eager)
    loop finishes: ``iterations``, ``confirm_rounds`` (how many times
    the exact fixpoint confirmation ran — exactly once per converged
    distributed run), and ``converged`` (False only when
    ``max_iterations`` was exhausted; surface it in downstream output
    so an over-split labeling is visible, not silent).
    """
    if stats is None:
        stats = {}
    stats.update(iterations=0, confirm_rounds=0, converged=True)
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )

    # Small-graph endgame: after near-dup pair generation the edge
    # list is typically orders of magnitude smaller than the corpus
    # (only documents WITH a duplicate appear).  Below the explicit
    # bound, a driver-side union-find beats O(log^2 n) rounds of
    # distributed shuffles — each round costs several scheduled stages
    # regardless of data size.  Above the bound, the star-contraction
    # loop below keeps the whole graph distributed; the threshold is a
    # parameter so a 100 TB run can force the distributed path with
    # small_graph_edges=0.
    if small_graph_edges > 0 and e.count() <= small_graph_edges:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # ONE Arrow batch transfer + plain-int iteration: measured
        # ~2.7x faster than toLocalIterator's per-partition fetches
        # with Row-object access at ~100k edges (0.33 s vs 0.88 s),
        # and the endgame is bounded by small_graph_edges anyway
        epdf = e.toPandas()
        for u, v in zip(epdf["u"].tolist(), epdf["v"].tolist()):
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min id so the root IS the component label
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        comp_rows = [(n, find(n)) for n in parent]
        spark = edges.sparkSession
        comp_small = spark.createDataFrame(
            comp_rows or [(0, 0)], "node long, component long"
        )
        if not comp_rows:
            comp_small = comp_small.limit(0)
        return nodes.join(comp_small, "node", "left").select(
            "node", F.coalesce("component", "node").alias("component")
        )

    def _large_star(ed: DataFrame) -> DataFrame:
        # For each node u: connect every strictly-larger neighbour to
        # min(N(u) + {u}).  Emitted edges point larger -> smaller.
        sym = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # Orient edges larger -> smaller, then for each node u connect
        # all smaller neighbours (and u itself) to the minimum one.
        o = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v"))
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        return (
            o.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _checksum(ed: DataFrame) -> tuple:
        # Order-free set fingerprint in one cheap aggregate action:
        # count plus three commutative reductions of a per-edge hash.
        # The star-contraction edge set evolves monotonically, so a
        # stable fingerprint means a stable set — no per-iteration
        # exceptAll anti-join (which cost more than the iteration).
        # This is PROBABILISTIC on its own: two different edge sets
        # agreeing on (count, sum, min, max) of xxhash64 would stop
        # the loop one round early (~2^-64 odds per round).  The loop
        # below therefore treats a stable fingerprint as a CANDIDATE
        # fixpoint and confirms it exactly with one exceptAll
        # anti-join — cheap because it runs once, at the converged
        # (star-forest, smallest) edge set, instead of every round.
        h = F.xxhash64(F.col("u"), F.col("v"))
        row = ed.agg(
            F.count(F.lit(1)),
            F.sum(h),
            F.min(h),
            F.max(h),
        ).collect()[0]
        return tuple(row)

    prev_sig: tuple | None = None
    converged = False
    for _ in range(max_iterations):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        stats["iterations"] += 1
        sig = _checksum(e2)
        if sig == prev_sig:
            # candidate fixpoint: confirm exactly.  Counts already
            # match (part of the fingerprint), so one empty one-sided
            # multiset difference proves e2 == e.
            stats["confirm_rounds"] += 1
            if e2.exceptAll(e).isEmpty():
                e = e2
                converged = True
                break
        prev_sig = sig
        e = e2
    stats["converged"] = converged
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: star-contraction did not converge "
            f"within max_iterations={max_iterations}; components may be "
            f"over-split. Re-run with a higher limit (rounds needed is "
            f"O(log n) in the largest component's diameter).",
            RuntimeWarning,
            stacklevel=2,
        )

    comp = (
        e.groupBy("u")
        .agg(F.min("v").alias("component"))
        .select(F.col("u").alias("node"), "component")
    )
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
) -> DataFrame:
    """Sub-document exact dedup at fixed word-span granularity (the
    chunk-level approximation of exact-substring dedup used by
    large-corpus pipelines): split each document into consecutive
    ``span_words``-word chunks, keep the globally-first occurrence of
    every distinct chunk (ordered by ``(id, position)``), and rebuild
    each document from its surviving chunks.

    No counterpart in the reference (no string ops there —
    /root/repo/SURVEY.md §2.9).  Scale shape: the global
    first-occurrence pick is ``min(struct(id, cpos, chunk))`` grouped
    by the md5 fingerprint — a HASH AGGREGATE with map-side partial
    combine, so even a pathological corpus where one boilerplate chunk
    appears billions of times collapses to one row per mapper before
    the shuffle (a ranking window over the same key would funnel every
    copy into a single reducer).  Chunking itself is a projection
    (``sequence``/``slice`` inside codegen, ~|corpus words| rows after
    the explode); reconstruction is one groupBy on the document id.
    At 100 TB this is 2 skew-proof shuffles of the chunk table; there
    is no all-pairs stage.
    """
    # stage the word array as a NAMED column: captured inside the
    # chunk lambda it would re-split the full text once per chunk —
    # O(L²/span) chars per document (the interpreted-HOF class of
    # defect fixed on winnow_fingerprints, see SCALING.md)
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__words")
    )
    words = F.col("__words")
    n_chunks = F.ceil(F.size(words) / F.lit(span_words)).cast("int")
    chunks = staged.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(words, i * span_words + 1, span_words), " "
                ),
            )
        ).alias("cpos", "chunk"),
    )
    # min over (id, cpos, chunk): id+cpos identify the occurrence, so
    # the struct ordering never reaches the chunk field — it rides
    # along so no join-back is needed to recover the text.
    first = (
        chunks.groupBy(F.md5(F.col("chunk")).alias("__fp"))
        .agg(F.min(F.struct(id_col, "cpos", "chunk")).alias("__first"))
        .select(
            F.col(f"__first.{id_col}").alias(id_col),
            F.col("__first.cpos").alias("cpos"),
            F.col("__first.chunk").alias("chunk"),
        )
    )
    rebuilt = first.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cpos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.ceil(F.size(F.split(F.col(text_col), " ")) / F.lit(span_words))
        .cast("long")
        .alias("n_chunks"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
    )


def levenshtein_dup_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 20,
    prefix_len: int = 120,
) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance within blocks: documents
    sharing all ``block_cols`` values are paired and kept when the
    Levenshtein distance of their ``prefix_len``-char prefixes is at
    most ``max_distance``.

    Edit distance catches single-character corruption (OCR noise,
    mojibake, typo-level mutations) that shingle/Jaccard methods
    dilute across many n-grams.  Cost is O(prefix_len^2) per pair and
    O(sum |block|^2) pairs, so this is the within-block verification
    tier of a dedup stack — block on cheap keys (source, language,
    length bucket, or an LSH bucket) and cap the prefix; never run it
    unblocked.  ``levenshtein`` is an integer JVM built-in, exact and
    engine-portable (DuckDB has the identical function).
    """
    a = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id1"),
        F.substring(F.col(text_col), 1, prefix_len).alias("t1"),
    )
    b = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id2"),
        F.substring(F.col(text_col), 1, prefix_len).alias("t2"),
    )
    pairs = a.join(b, block_cols).filter(F.col("id1") < F.col("id2"))
    dist = F.levenshtein(F.col("t1"), F.col("t2"))
    return pairs.select(
        "id1", "id2", dist.alias("edit_distance"), *block_cols
    ).filter(F.col("edit_distance") <= max_distance)


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

_BLOOM_WORDS_DEFAULT = 1024  # 64 Ki bits = 8 KiB — fine for 10^4-row eval sets


def bloom_build(
    df: DataFrame,
    key_col: str = "text",
    num_words: int = _BLOOM_WORDS_DEFAULT,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a ONE-ROW DataFrame
    with an ``array<bigint>`` of ``num_words`` 64-bit words.

    Probe positions are ``xxhash64(key, seed=i) mod (num_words*64)``
    for ``i`` in [0, num_hashes) — JVM-side, no UDF.  Build shape:
    explode k positions per key (k×|eval| rows — the eval set is small
    by definition), bit_or per word, densify via a map lookup over the
    word index sequence.  The result is a single row holding ~8 KiB —
    exactly what a broadcast join wants.
    """
    m_bits = num_words * 64
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.pmod(F.xxhash64(F.col(key_col), i), F.lit(m_bits)),
        )
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # shiftleft()'s python wrapper only takes a literal shift;
            # call_function passes the per-row bit position as a Column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    dense = words.agg(
        F.map_from_arrays(
            F.collect_list("word_idx"), F.collect_list("word")
        ).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(num_words - 1).cast("long")),
            lambda w: F.coalesce(
                F.element_at(F.col("m"), w), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )
    return dense


def bloom_might_contain(
    bloom_col: Column, key: Column, num_words: int = _BLOOM_WORDS_DEFAULT,
    num_hashes: int = 5,
) -> Column:
    """True iff all ``num_hashes`` probe bits for ``key`` are set in
    the broadcast bloom array — pure codegen arithmetic per row."""
    m_bits = num_words * 64
    def bit_set(i):
        p = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(bloom_col, (p / 64).cast("int") + 1)
        return F.call_function("shiftright", word, (p % 64).cast("int")) % 2 != 0
    cond = bit_set(0)
    for i in range(1, num_hashes):
        cond = cond & bit_set(i)
    return cond


def bloom_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    key_col: str = "text",
    num_words: int = _BLOOM_WORDS_DEFAULT,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT removal of corpus rows whose ``key_col`` appears in the
    eval set, with a Bloom prefilter doing ~all the work.

    The 100 TB shape this demonstrates: a plain anti-join would
    shuffle the full corpus on the text key.  Instead the eval set is
    folded into an ~8 KiB bit array carried to every executor by a
    1-row broadcast cross join, and each corpus row does k integer
    probes in whole-stage codegen — a pure narrow map.  Only the tiny
    candidate set (true hits + false positives, bounded by the bloom's
    FP rate) pays an exact broadcast anti-join to restore exactness;
    the surviving non-candidates never shuffle at all.

    Result: corpus rows NOT present in the eval set (exact — false
    positives are rescued by the confirm join).
    """
    bloom = bloom_build(eval_df, key_col, num_words, num_hashes)
    probed = corpus.crossJoin(F.broadcast(bloom)).withColumn(
        "__hit",
        bloom_might_contain(F.col("bloom"), F.col(key_col), num_words, num_hashes),
    )
    clean = probed.filter(~F.col("__hit")).drop("__hit", "bloom")
    candidates = probed.filter(F.col("__hit")).drop("__hit", "bloom")
    rescued = candidates.join(
        F.broadcast(eval_df.select(F.col(key_col)).distinct()),
        on=key_col,
        how="left_anti",
    )
    return clean.unionByName(rescued)


def containment_pairs(
    df: "DataFrame",
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> "DataFrame":
    """ASYMMETRIC near-dup: containment(A in B) = |sh(A) ∩ sh(B)| /
    |sh(A)| — the quote/subset detector Jaccard misses (a paragraph
    fully copied into a much longer page has low Jaccard but
    containment ≈ 1).  The directional score matters for
    training-data hygiene: keep the superset document, drop the
    contained one.

    Emits BOTH directions per unordered pair (id1 contained-in id2 is
    a different fact than id2 contained-in id1); same block-equi-join
    scale shape as :func:`blocked_jaccard_pairs` — work is
    sum(|block|²), one co-partitioned shuffle join, no all-pairs."""
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id1"),
        shingles(F.col(text_col), n).alias("s1"),
    ).filter(F.size("s1") > 0)
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id2"),
        shingles(F.col(text_col), n).alias("s2"),
    ).filter(F.size("s2") > 0)
    pairs = a.join(b, on=list(block_cols)).filter(F.col("id1") != F.col("id2"))
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    cont = inter / F.size("s1").cast("double")
    return (
        pairs.withColumn("containment", qround(cont, 4))
        .filter(F.col("containment") >= threshold)
        .select(*block_cols, "id1", "id2", "containment")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Paragraph-level exact dedup with document reconstruction — the
    boilerplate-removal pass of web-crawl pipelines (nav bars, cookie
    banners, newsletter blurbs repeat across MILLIONS of pages while
    the surrounding documents are unique; C4/RefinedWeb both dedup at
    line/paragraph granularity, not document granularity).

    Rules: split on ``sep``; drop whitespace-only paragraphs; a
    paragraph's identity is the md5 of its lowercased,
    whitespace-collapsed, trimmed text; the FIRST occurrence in
    (id, position) order survives, every later occurrence is dropped;
    each document is rebuilt from its surviving paragraphs in original
    order (possibly empty when everything was boilerplate).

    Output: ``(id, clean_text, n_paragraphs, n_kept)``.

    Scale shape: posexplode (narrow) -> ONE map-combined min(struct)
    aggregate per fingerprint (the global first-occurrence choice —
    same partial-agg shape as exact_dedup, no ranking window) -> one
    equi-join back on the fingerprint -> one groupBy(id) to
    reassemble.  Hot fingerprints (the actual boilerplate) collapse
    map-side in the aggregate; the join fans them back out only to
    the docs that contain them.
    """
    c = F.col(text_col)
    paras = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.filter(
                F.split(c, _re.escape(sep)),
                lambda x: F.length(F.trim(x)) > 0,
            )
        ).alias("__pos", "__para"),
    ).withColumn(
        "__fp",
        F.md5(F.lower(F.trim(F.regexp_replace(F.col("__para"), r"\s+", " ")))),
    )
    firsts = paras.groupBy("__fp").agg(
        F.min(F.struct(F.col("__id"), F.col("__pos"))).alias("__first")
    )
    flagged = paras.join(firsts, "__fp").select(
        "__id",
        "__pos",
        "__para",
        (
            (F.col("__first.__id") == F.col("__id"))
            & (F.col("__first.__pos") == F.col("__pos"))
        ).alias("__keep"),
    )
    rebuilt = flagged.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("__pos"), F.col("__para")),
                        )
                    )
                ),
                lambda s: s["__para"],
            ),
            sep,
        ).alias("clean_text"),
    )
    # documents whose text has NO non-whitespace paragraph emit zero
    # posexplode rows and never reach the aggregate — left-join back
    # to the distinct input ids so "every document is rebuilt
    # (possibly empty)" holds for them too
    base = df.select(F.col(id_col).alias("__id")).distinct()
    return base.join(rebuilt, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_paragraphs"), F.lit(0))
        .cast("long")
        .alias("n_paragraphs"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


def token_weight_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = 8,
) -> DataFrame:
    """Per-document capped token multiset: ``(id, tok, cnt)`` with
    whitespace tokenization, lowercasing, and counts clipped at
    ``cap`` — the weighted-Jaccard input representation.  The cap
    bounds both the replication factor of the weighted minhash and
    the influence of boilerplate repetition (the same reason tf is
    log-damped in BM25)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.trim(F.col(text_col)), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    ).select("id", F.lower(F.col("tok")).alias("tok"))
    return toks.groupBy("id", "tok").agg(
        F.least(F.count(F.lit(1)), F.lit(cap)).cast("long").alias("cnt")
    )


def weighted_minhash_signatures(
    counts: DataFrame,
    num_hashes: int = 32,
) -> DataFrame:
    """Weighted MinHash over integer-weight token multisets, EXACT for
    integer weights: a token with count c contributes the c distinct
    elements (tok, 1)..(tok, c), so plain set-minhash over the
    replicated elements IS the weighted Jaccard estimator
    (collision probability = Σ min(c1,c2) / Σ max(c1,c2)) — no
    rejection sampling, no real-valued ICWS machinery, and every hash
    stays on the engine-portable MINSTD int64 lattice.

    Input: ``(id, tok, cnt)`` from :func:`token_weight_rows`.
    Output: ``(id, signature)`` like :func:`minhash_signatures`, so
    the banded-LSH machinery (:func:`lsh_candidate_pairs`) composes
    unchanged.

    Scale shape: replication multiplies the exploded row count by the
    mean capped count (≤ cap); the signature aggregate is map-side
    combined to |docs| × num_hashes exactly as unweighted minhash.
    """
    reps = counts.select(
        "id",
        "tok",
        F.explode(F.sequence(F.lit(1), F.col("cnt"))).alias("rep"),
    )
    h0 = char_poly_hash(F.col("tok"))
    # distinct element hash per (token, replica): one extra affine mix
    # in the replica index keeps everything inside int64
    hr = (
        h0 * F.lit(48271) + F.col("rep") * F.lit(1103515245) + F.lit(12345)
    ) % F.lit(_P31)
    hashed = reps.withColumn("__h", hr)
    mins = [
        F.min(
            (F.col("__h") * F.lit(_MINHASH_A[i]) + F.lit(_MINHASH_B[i]))
            % F.lit(_P31)
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = hashed.groupBy("id").agg(*mins)
    return agg.select(
        "id",
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    cap: int = 8,
    threshold_milli: int = 300,
) -> DataFrame:
    """Weighted near-duplicate pairs: weighted-minhash banded LSH
    generates candidates, then each candidate is VERIFIED with the
    exact weighted Jaccard ``Σ min(c1,c2) / Σ max(c1,c2)`` over the
    capped token counts — the repetition-aware upgrade of
    :func:`minhash_dedup_pairs` (plain Jaccard treats "spam spam spam
    spam" and "spam" as identical; weighted Jaccard does not).

    The threshold compares on the exact integer lattice
    (``inter * 1000 >= threshold_milli * union``); the reported
    ``wjaccard`` pays one deterministic double division.

    Output: ``(id1, id2, inter_w, union_w, wjaccard)``.

    Scale shape: candidates come from the banded equi-join (never
    all-pairs); verification joins the candidate pairs back to the
    token-count table on (id, tok) — per-pair cost is the shared-token
    count, and the per-id totals come from one map-combined aggregate.
    """
    counts = token_weight_rows(df, id_col, text_col, cap)
    sigs = weighted_minhash_signatures(counts, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands)
    totals = counts.groupBy("id").agg(F.sum("cnt").alias("tot"))
    t1 = counts.select(
        F.col("id").alias("id1"), "tok", F.col("cnt").alias("c1")
    )
    t2 = counts.select(
        F.col("id").alias("id2"), "tok", F.col("cnt").alias("c2")
    )
    inter = (
        cands.join(t1, "id1")
        .join(t2, ["id2", "tok"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.least(F.col("c1"), F.col("c2"))).alias("inter_w"))
    )
    out = (
        inter.join(
            totals.select(F.col("id").alias("id1"), F.col("tot").alias("tot1")),
            "id1",
        )
        .join(
            totals.select(F.col("id").alias("id2"), F.col("tot").alias("tot2")),
            "id2",
        )
        .select(
            "id1",
            "id2",
            F.col("inter_w").cast("long").alias("inter_w"),
            (F.col("tot1") + F.col("tot2") - F.col("inter_w"))
            .cast("long")
            .alias("union_w"),
        )
    )
    return out.filter(
        F.col("inter_w") * 1000 >= F.lit(threshold_milli) * F.col("union_w")
    ).withColumn(
        "wjaccard",
        F.col("inter_w").cast("double") / F.col("union_w").cast("double"),
    )


def keep_best_representative(
    labeled: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "component",
) -> DataFrame:
    """Survivor selection by QUALITY instead of min-id: given
    cluster-labeled rows (the output shape of
    :func:`connected_components` joined back onto the corpus), keep
    the member with the HIGHEST quality score per cluster — what a
    training pipeline actually wants from dedup (the min-id
    representative is arbitrary; the best-quality member preserves
    the most signal).  Ties break deterministically on (quality, id)
    via the max-struct ordering, so the survivor set is engine-exact.

    Scale shape: ONE cluster-keyed map-combined aggregate (the
    max-struct is a partial-aggregable argmax — no window, no sort)
    + one broadcast-able join back.  ``quality_col`` must be
    integer-grid for cross-engine hashing.

    Output: the input rows plus ``keep`` (is this row the cluster\'s
    chosen representative) and ``n_members``.
    """
    best = labeled.groupBy(cluster_col).agg(
        F.max(
            F.struct(
                F.col(quality_col).alias("q"), F.col(id_col).alias("id")
            )
        ).alias("__best"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    ).select(
        cluster_col,
        F.col("__best")["id"].alias("__rep_id"),
        "n_members",
    )
    return (
        labeled.join(best, cluster_col)
        .withColumn("keep", F.col(id_col) == F.col("__rep_id"))
        .drop("__rep_id")
    )
