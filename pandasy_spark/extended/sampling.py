"""Deterministic sampling / splitting / packing for training pipelines.

The reference has no sampling surface at all; these are the extended
LLM-data-pipeline operators (SURVEY.md §2.9 posture) a 100 TB corpus
build actually needs:

- **hash_split**: stable train/val/test assignment keyed on a document
  id — the split a row lands in never changes as the corpus grows,
  shards re-partition, or the job re-runs.  Pure narrow map (no
  shuffle, no RNG state): `bucket = portable_hash(id) mod 10_000`
  compared against cumulative fraction boundaries.
- **stratified_sample**: per-stratum deterministic downsampling —
  same hash-bucket trick, with the keep-fraction looked up per stratum
  (broadcast join on the tiny fraction table).  Unlike
  ``DataFrame.sampleBy`` (Bernoulli RNG, non-reproducible across
  engines), this is exactly reproducible anywhere.
- **weighted_interleave**: mix N corpora to target weights by
  downsampling each source to the largest achievable size preserving
  the requested proportions.  One count per source (a metadata-cheap
  agg), then the same deterministic hash filter; no shuffle beyond the
  final union.
- **chunk_pack**: GPT-style concat-and-chunk packing — documents are
  laid end-to-end on a global token axis (running-sum window) and cut
  into fixed ``budget``-token context windows; emits one row per
  (document x overlapped window).  Closed-form: one window cumsum +
  one ``sequence``/``explode`` — no sequential state, so it scales as
  a single shuffle on the ordering key.
- **greedy_pack**: bin packing where documents are never split (first
  sequential bin with room, oversized docs get their own bin).
  Genuinely stateful per shard -> Arrow-batched ``applyInPandas`` per
  shard (the sanctioned Python boundary); shards are independent, so
  parallelism = shard count.

All hashing is the engine-portable MINSTD arithmetic from
``dedup.char_poly_hash`` (pure int64 ops reproducible in any SQL
engine), so every closed-form operator here is DuckDB-oracle-checkable
bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import char_poly_hash, _P31

__all__ = [
    "split_bucket",
    "hash_split",
    "stratified_sample",
    "weighted_interleave",
    "chunk_pack",
    "greedy_pack",
    "curriculum_order",
    "domain_cap",
    "mixture_weights",
    "reservoir_per_group",
    "pack_manifest",
    "bootstrap_counts",
    "bootstrap_resample",
    "negative_pairs",
    "class_balance",
    "token_budget_sample",
    "dsir_weights",
    "matched_pairs",
    "systematic_sample",
]

_BUCKETS = 10_000


def split_bucket(id_col: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 10000) from a document id.

    The id is rendered as a string (so int/string ids hash alike in any
    engine), char-folded with the portable Karp-Rabin hash, re-mixed
    through one affine MINSTD step (so ids that differ in a suffix
    spread over distant buckets), then reduced mod 10_000.

    DuckDB oracle twin (identical values)::

        ((list_reduce(... char fold ...) * 48271 + salt) % 2147483647)
          % 10000
    """
    h = char_poly_hash(id_col.cast("string"))
    mixed = (h * F.lit(48271) + F.lit(salt)) % F.lit(_P31)
    return (mixed % F.lit(_BUCKETS)).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float],
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label ('train'/'val'/...).

    ``fractions`` maps label -> fraction; they must sum to ~1.  The
    assignment is a pure narrow map — no shuffle, no sampling state —
    so it is stable under corpus growth and re-partitioning: a given id
    is in 'val' today and in 'val' after 10x more data arrives.
    """
    total = sum(fractions.values())
    if not math.isclose(total, 1.0, rel_tol=1e-9):
        raise ValueError(f"fractions must sum to 1, got {total}")
    # materialize the bucket once — a CASE referencing the raw hash
    # expression would re-evaluate the char fold per WHEN branch
    tmp = "__split_bucket"
    bucket = F.col(tmp)
    # cumulative integer boundaries over the 10k bucket grid
    expr: Column | None = None
    acc = 0.0
    for label, frac in fractions.items():
        acc += frac
        hi = int(math.floor(acc * _BUCKETS + 0.5))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None
    return (
        df.withColumn(tmp, split_bucket(F.col(id_col), salt))
        .withColumn(split_col, expr)
        .drop(tmp)
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-stratum downsample.

    Keeps a row iff ``split_bucket(id) < fraction(stratum) * 10000``.
    Fractions ride in on a broadcast join against the tiny
    stratum->fraction table, so arbitrary per-stratum policies cost one
    broadcast, not a shuffle.  Exactly reproducible (no RNG), unlike
    ``DataFrame.sampleBy``.
    """
    spark = df.sparkSession
    ftab = spark.createDataFrame(
        [(k, int(math.floor(v * _BUCKETS + 0.5))) for k, v in fractions.items()],
        f"{stratum_col}: string, __keep_below: int",
    )
    joined = df.join(F.broadcast(ftab), on=stratum_col, how="left")
    default_hi = int(math.floor(default_fraction * _BUCKETS + 0.5))
    keep = F.coalesce(F.col("__keep_below"), F.lit(default_hi))
    bucket = split_bucket(F.col(id_col), salt)
    return joined.filter(bucket < keep).drop("__keep_below")


def weighted_interleave(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    id_col: str,
    salt: int = 0,
    source_col: str = "source",
) -> DataFrame:
    """Mix corpora to target proportions, deterministically.

    Finds the largest total size achievable with the requested weights
    given each source's row count (``C = min_i n_i / w_i``), then
    downsamples source ``i`` to ``w_i * C`` rows via the hash-bucket
    filter and unions with a source tag.  Count jobs on the sources are
    the only extra cost; the filter itself is a narrow map.
    """
    wsum = sum(weights.values())
    norm = {k: v / wsum for k, v in weights.items()}
    counts = {k: sources[k].count() for k in sources}
    # largest achievable total preserving proportions
    cap = min(counts[k] / norm[k] for k in sources if norm[k] > 0)
    parts = []
    for k, src in sources.items():
        frac = min(1.0, (norm[k] * cap) / counts[k]) if counts[k] else 0.0
        hi = int(math.floor(frac * _BUCKETS + 0.5))
        bucket = split_bucket(F.col(id_col), salt)
        parts.append(
            src.filter(bucket < F.lit(hi)).withColumn(source_col, F.lit(k))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def chunk_pack(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    id_cols: Sequence[str] = ("doc_id",),
    persist_intermediate: bool = True,
) -> DataFrame:
    """Concat-and-chunk packing (GPT-style pretraining layout).

    Documents are concatenated in ``order_col`` order on a single token
    axis; the axis is cut every ``budget`` tokens; a document emits one
    row per context window it overlaps, with the token sub-range it
    contributes.  Closed-form — no sequential state.

    The global running sum is computed scalably (a bare
    ``Window.orderBy`` would drag the whole table into ONE task): range
    partition on the order key, cumsum within each partition, then add
    per-partition prefix offsets from a partition-count-sized summary
    broadcast back — the distributed prefix-sum pattern.  ``order_col``
    must be a total order (unique), otherwise the concatenation order —
    like any SQL window over a non-unique ORDER BY — is ambiguous.

    A prefix sum is inherently two-pass (per-partition totals, then the
    rows again); without materialization Catalyst plans the second pass
    as a full re-scan of the input — including recomputing upstream
    token counts.  ``persist_intermediate`` (default) caches the
    minimal projected frame (ids + two longs, NEVER the document text)
    MEMORY_AND_DISK so the input is scanned once; pass False if the
    caller manages its own materialization (e.g. the frame is already
    cached or checkpointed).

    Output: ``id_cols..., chunk_id, tok_start, tok_end`` where
    [tok_start, tok_end) is the half-open token slice of the document
    placed in that chunk (document-relative offsets).
    """
    t = (
        df.select(
            *id_cols,
            F.col(order_col).alias("__ord"),
            F.col(token_col).cast("long").alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .repartitionByRange(F.col("__ord"))
        .withColumn("__pid", F.spark_partition_id())
    )
    if persist_intermediate:
        from pyspark import StorageLevel

        t = t.persist(StorageLevel.MEMORY_AND_DISK)
    wp = (
        Window.partitionBy("__pid")
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("__local_end", F.sum("__n").over(wp))
    # one row per partition; the exclusive prefix over it is tiny
    wo = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        t.groupBy("__pid")
        .agg(F.sum("__n").alias("__ptotal"))
        .withColumn("__offset", F.sum("__ptotal").over(wo) - F.col("__ptotal"))
        .select("__pid", "__offset")
    )
    t = t.join(F.broadcast(offsets), "__pid").withColumn(
        "__end", F.col("__local_end") + F.col("__offset")
    )
    t = t.withColumn("__start", F.col("__end") - F.col("__n"))
    first_chunk = F.floor(F.col("__start") / budget)
    last_chunk = F.floor((F.col("__end") - 1) / budget)
    t = t.withColumn(
        "chunk_id", F.explode(F.sequence(first_chunk, last_chunk))
    )
    lo = F.greatest(F.col("__start"), F.col("chunk_id") * budget)
    hi = F.least(F.col("__end"), (F.col("chunk_id") + 1) * budget)
    return t.select(
        *id_cols,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (lo - F.col("__start")).cast("long").alias("tok_start"),
        (hi - F.col("__start")).cast("long").alias("tok_end"),
    )


def greedy_pack(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    token_col: str,
    budget: int,
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Whole-document greedy bin packing, parallel across shards.

    Within each shard (in ``order_col`` order) a document joins the
    current bin if it fits, else opens the next bin; documents longer
    than ``budget`` get a bin of their own.  The per-shard scan is
    genuinely sequential, so it runs as Arrow-batched
    ``applyInPandas`` — one task per shard, parallelism = shard count,
    state bounded by the largest shard (size your shards like
    partitions: O(100 MB)).

    Output: ``shard_col, id_cols..., bin_id, bin_tokens`` (bin ids are
    shard-local, dense from 0).
    """
    cols = [shard_col, *id_cols, "__ord", "__n"]
    t = df.select(
        F.col(shard_col),
        *[F.col(c) for c in id_cols],
        F.col(order_col).alias("__ord"),
        F.col(token_col).cast("long").alias("__n"),
    )
    out_fields = ", ".join(
        [f"`{shard_col}` {t.schema[shard_col].dataType.simpleString()}"]
        + [f"`{c}` {t.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["bin_id long", "bin_tokens long"]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord", kind="mergesort", ignore_index=True)
        bins: list[int] = []
        fill: list[int] = []
        cur_bin, cur_fill = 0, 0
        first = True
        for n in pdf["__n"]:
            n = int(n)
            if not first and cur_fill + n > budget:
                cur_bin += 1
                cur_fill = 0
            bins.append(cur_bin)
            cur_fill += n
            fill.append(cur_fill)
            first = False
        pdf = pdf.assign(bin_id=bins)
        totals = pdf.groupby("bin_id")["__n"].transform("sum")
        pdf = pdf.assign(bin_tokens=totals)
        return pdf[[shard_col, *id_cols, "bin_id", "bin_tokens"]]

    return t.groupBy(shard_col).applyInPandas(pack, schema=out_fields)


def curriculum_order(
    df: DataFrame,
    stage_col: str,
    id_col: str = "doc_id",
    num_shards: int = 8,
    salt: int = 7,
) -> DataFrame:
    """Deterministic curriculum ordering + sharding for training runs:
    every example gets a stable (shard, pos) such that reading shards
    in position order yields stages in ascending order (easy -> hard,
    or any caller-defined phase), with a reproducible pseudo-random
    order inside each stage.

    The trainer-facing contract is what matters: re-running the
    pipeline — on this engine or any other — produces byte-identical
    shard layouts, because the within-stage order comes from the
    portable id hash, not an RNG or partition iteration order.

    Scale shape: one shuffle keyed by ``shard`` (uniform by
    construction: the shard is the id hash mod N) and one
    within-partition sort — exactly the work a sharded file writer
    (``repartition(shard).sortWithinPartitions(...)``) must do anyway;
    the ``row_number`` adds nothing beyond that sort.  No global
    ordering bottleneck: positions are per shard.
    """
    h = (char_poly_hash(F.col(id_col).cast("string")) * F.lit(48271) + F.lit(salt)) % F.lit(
        _P31
    )
    out = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % F.lit(num_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col(stage_col), F.col("__h"), F.col(id_col)
    )
    return out.withColumn("pos", F.row_number().over(w)).drop("__h")


def domain_cap(
    df,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    cap: int = 10,
):
    """Per-domain document cap: keep at most ``cap`` documents per
    domain, preferring high ``order_col`` (quality proxy), ties broken
    by id — the standard web-corpus guard against a handful of hosts
    dominating the training mix.

    One ranking window keyed by domain.  Domains are Zipf-skewed at
    web scale; the window only SORTS within a domain partition (no
    cross-row state), so AQE's skew split plus the rank filter keeps
    the hot domains bounded; for pathological single-domain corpora
    pre-aggregate with ``top_k_per_group`` semantics instead.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
    )


def mixture_weights(
    df,
    group_col: str = "source",
    weight_col: str | None = None,
    target: dict[str, float] | None = None,
):
    """Per-group sampling weights that reshape the corpus toward a
    target mixture (uniform across groups when ``target`` is None) —
    the data-mixing step of pretraining pipelines (domain reweighting
    a la DoReMi/Pile recipes, here as exact share arithmetic).

    ``weight_col`` (e.g. a token count) weights each row's
    contribution to its group's share; None counts rows.  Returns one
    row per group: observed share, target share, the resampling
    weight ``target/observed``, and the capped keep-probability
    ``min(1, weight)`` for downsampling-only pipelines.

    One tiny aggregate (|groups| rows) + a broadcast of the total —
    nothing corpus-sized moves.  Exact IEEE division only, so results
    hash-match any engine.
    """
    from pyspark.sql import functions as F

    contrib = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    per_group = df.groupBy(group_col).agg(F.sum(contrib).alias("mass"))
    total = per_group.agg(F.sum("mass").alias("total_mass"))
    out = per_group.crossJoin(F.broadcast(total))
    if target is None:
        n_groups = per_group.agg(
            F.count(F.lit(1)).cast("double").alias("n_groups")
        )
        out = out.crossJoin(F.broadcast(n_groups)).withColumn(
            "target_share", F.lit(1.0) / F.col("n_groups")
        )
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        out = out.withColumn(
            "target_share", F.coalesce(mapping[F.col(group_col)], F.lit(0.0))
        )
    share = F.col("mass") / F.col("total_mass")
    weight = F.col("target_share") / share
    return out.select(
        group_col,
        F.col("mass").cast("double").alias("mass"),
        share.alias("observed_share"),
        "target_share",
        weight.alias("weight"),
        F.least(F.lit(1.0), weight).alias("keep_prob"),
    )


def reservoir_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    k: int,
    weight_col: str | None = None,
    salt: int = 0,
) -> DataFrame:
    """Deterministic reservoir sample of ``k`` rows per group.

    Unweighted: each row's priority is the portable id hash (mixed
    with ``salt``), and the k smallest priorities per group win —
    exactly the classic reservoir-sampling outcome but reproducible
    across engines and re-runs (the hash plays the role of the RNG).
    With ``weight_col``, priorities become A-Res keys
    (Efraimidis-Spirakis 2006): ``-ln(u)/w`` with ``u`` the hash
    mapped into (0,1) — higher weight, more likely to survive.

    Scale shape: one shuffle on the group key + a rank window; k is
    tiny, so the window's per-group state is bounded.  No RNG state,
    no driver participation, stable under corpus growth — the same
    guarantees as ``hash_split``, per group.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    # the salt picks the MULTIPLIER (48271^(salt+1) mod p): any additive
    # salt — before or after a linear map — only shifts every priority
    # by the same constant, preserving the ordering except at the mod
    # wrap; distinct multipliers genuinely re-permute the order
    g = pow(48271, salt + 1, _P31)
    # NULL ids hash to NULL, and NULL sorts FIRST in Spark ascending
    # but LAST in most SQL engines — pin them to the largest priority
    # so they lose deterministically everywhere
    h = F.coalesce(
        (char_poly_hash(F.col(id_col).cast("string")) * F.lit(g)) % F.lit(_P31),
        F.lit(_P31),
    )
    if weight_col is None:
        priority = h
    else:
        u = (h + F.lit(1)).cast("double") / F.lit(float(_P31 + 1))
        priority = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__priority"), F.col(id_col)
    )
    return (
        df.withColumn("__priority", priority)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__priority", "__rk")
    )


def pack_manifest(
    packed: DataFrame,
    chunk_col: str = "chunk_id",
    id_col: str = "doc_id",
    start_col: str = "tok_start",
    end_col: str = "tok_end",
) -> DataFrame:
    """Per-context-window manifest over ``chunk_pack`` output — the
    table an attention-masking data loader reads: which documents a
    packed window contains and where their segment boundaries sit
    (cross-document attention must be masked at those boundaries).

    Output: (chunk, n_docs, n_tokens, segments) with ``segments`` a
    deterministic ``id:start-end;id:start-end`` rendering in document
    order — a string, not a nested array, so the result is value-
    hashable across engines.

    One keyed aggregate on the chunk id (map-side combined; windows
    hold a bounded number of documents by construction)."""
    seg = F.concat_ws(
        ";",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("i"),
                        F.col(start_col).alias("s"),
                        F.col(end_col).alias("e"),
                    )
                )
            ),
            lambda x: F.concat_ws(
                "", x["i"].cast("string"), F.lit(":"),
                x["s"].cast("string"), F.lit("-"), x["e"].cast("string"),
            ),
        ),
    )
    return (
        packed.groupBy(F.col(chunk_col).alias("chunk"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(end_col) - F.col(start_col)).alias("n_tokens"),
            seg.alias("segments"),
        )
        .select(
            "chunk",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "segments",
        )
    )


# cumulative Poisson(1) inverse-CDF thresholds on the [0, 2^31-1)
# lattice: t_k = floor(P(X <= k) * (2^31-1)); draws >= 5 are folded
# into count 5 (tail mass 0.00366) so the replicate explode is bounded
_POISSON1_T = [
    790015083,   # P(X<=0) = 0.36787944117
    1580030167,  # P(X<=1) = 0.73575888234
    1975037709,  # P(X<=2) = 0.91969860293
    2106706890,  # P(X<=3) = 0.98101184313
    2139624185,  # P(X<=4) = 0.99634015317
]


def bootstrap_counts(id_col: Column, salt: int = 0) -> Column:
    """Deterministic bootstrap replicate count per row: an
    engine-portable stand-in for Poisson(1) draws (the standard
    distributed approximation of sampling-with-replacement, since
    Binomial(n, 1/n) -> Poisson(1)).

    The row id hashes through two affine MINSTD steps to a uniform
    value on [0, 2^31-1); the count is how many cumulative-probability
    thresholds the value clears — the inverse-CDF table above, capped
    at 5.  Pure BIGINT comparisons: the identical expression runs in
    any SQL engine, so resamples are reproducible across engines and
    across partitionings (no RNG state, no ``rand()``).
    """
    h = char_poly_hash(id_col.cast("string"))
    u = ((h * F.lit(48271) + F.lit(salt)) % F.lit(_P31) * F.lit(16807)) % F.lit(
        _P31
    )
    cnt: Column = F.lit(0)
    for t in _POISSON1_T:
        cnt = cnt + (u >= F.lit(t)).cast("int")
    return cnt.cast("int")


def bootstrap_resample(
    df: DataFrame, id_col: str, salt: int = 0
) -> DataFrame:
    """Bootstrap resample of a frame (deterministic, shuffle-free):
    each row appears ``bootstrap_counts(id)`` times — 0 to 5 copies,
    expectation 1 — via one narrow ``explode(sequence)``; no shuffle,
    no collect, stable under repartitioning.  Different ``salt``
    values give independent resamples for confidence-interval
    estimation over aggregate statistics.
    """
    n = bootstrap_counts(F.col(id_col), salt)
    return (
        df.withColumn("__reps", n)
        .filter(F.col("__reps") > 0)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__reps"))))
        .drop("__reps", "__i")
    )


def negative_pairs(
    df: DataFrame, id_col: str, k: int = 3, salt: int = 0
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor id, ``k`` pseudo-random OTHER ids from the same
    corpus — (anchor, negative) pairs with no RNG state and no cross
    join.

    The corpus ids get dense ranks 0..N-1 via
    :func:`...operators.sort.stable_row_ids` (ONE range exchange);
    each anchor derives ``k`` MINSTD-hashed positions on [0, N) and
    equi-joins back to the rank table to translate position → id.
    Self-pairs (an anchor drawing its own rank) are dropped, so an
    anchor can yield fewer than ``k`` pairs — the standard price of
    rejection-free deterministic draws; collisions among a given
    anchor's negatives are likewise possible and kept (document-level
    dedup is one distinct away if the training recipe needs it).

    Output: ``(anchor, negative, draw)`` with draw in [0, k).
    """
    from ..operators.sort import stable_row_ids

    if k < 1:
        raise ValueError("k must be >= 1")
    ids = df.select(F.col(id_col).cast("long").alias("__id")).filter(
        F.col("__id").isNotNull()
    ).distinct()
    ranked = stable_row_ids(ids, ["__id"], id_col="__rank")
    n_row = ranked.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    anchors = (
        ranked.select(F.col("__id").alias("anchor"))
        .crossJoin(F.broadcast(n_row))
        .withColumn("draw", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    )
    u = (
        (
            (F.col("anchor") * F.lit(48271) + F.col("draw") * F.lit(12345)
             + F.lit(salt))
            % F.lit(_P31)
        )
        * F.lit(16807)
    ) % F.lit(_P31)
    probes = anchors.withColumn("__pos", u % F.col("__n")).drop("__n")
    return (
        probes.join(
            ranked.select(
                F.col("__rank").alias("__pos"),
                F.col("__id").alias("negative"),
            ),
            "__pos",
        )
        .filter(F.col("negative") != F.col("anchor"))
        .select("anchor", "negative", F.col("draw").cast("int").alias("draw"))
    )


def class_balance(
    df: DataFrame, class_col: str, id_col: str
) -> DataFrame:
    """Deterministic downsample-to-minority: every class keeps exactly
    as many rows as the SMALLEST class has — the classic rebalancing
    step before training a classifier on skewed labels (fraud, churn,
    error events).

    Scale-safe selection WITHOUT a per-class global sort: the kept set
    is ``{rows : h(id) ≤ kth-smallest distinct hash in the class}``
    with ``h`` the engine-portable 56-bit md5 hash and the threshold
    located by the KMV coarse-histogram two-pass
    (extended/sketches.py kmv_kth_hash) — a ``row_number`` over each
    full class would funnel the majority class through ONE task, the
    exact single-partition-sort anti-pattern; here only the O(k +
    n/4096) sliver below the located cell is ever ranked, and the
    final keep is a broadcast-join + narrow filter.  Selection is a
    uniform random sample of each class (md5 is avalanche-uniform),
    reproducible across engines and runs.

    ``id_col`` must be unique per row (hash ties would otherwise keep
    slightly more than k).  NULL classes are dropped.  The minority
    count is read with one 1-row scalar action (bounded by
    construction).  Output: the input rows that survive, with the
    selection hash as ``__h``.

    Large-k regime: the exact k-th-hash pass ranks ~k + n/4096 rows
    in one task per class — immaterial while k is sketch-to-
    million-sized (sf1.0 probe: 2.98x at 10x rows), but if the
    MINORITY class itself has billions of rows, swap the exact
    threshold for ``approx_percentile`` over the hash at fraction
    k/n (the keep count becomes k ± the rank error; the balancing
    use-case tolerates that, the oracle-exact gate form does not).
    """
    from .sketches import kmv_kth_hash, portable_hash56

    base = df.filter(F.col(class_col).isNotNull())
    k = base.groupBy(class_col).count().agg(F.min("count")).first()[0]
    if k is None:
        raise ValueError("class_balance needs at least one non-null class")
    k = int(k)
    if k < 2:
        raise ValueError("minority class must have >= 2 rows")
    th = kmv_kth_hash(base, [class_col], id_col, k=k)
    return (
        base.withColumn("__h", portable_hash56(F.col(id_col)))
        .join(F.broadcast(th), class_col)
        .filter(F.col("__h") <= F.col("kth_hash"))
        .drop("kth_hash")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """EXACT per-domain token budgeting — "give me ~N tokens from each
    source", the corpus-mixture primitive behind recipes like "30%
    code / 50% web / 20% books, 10B tokens total" (compose with
    :func:`mixture_weights` for proportional budgets).

    Documents are ordered inside each domain by a deterministic
    portable hash priority (so the selection is an unbiased,
    re-runnable sample — not id-order-biased) and taken while the
    domain's cumulative token count BEFORE the document is under the
    budget; the selected set therefore overshoots by at most one
    document per domain and is identical on any engine/partitioning.

    Scale shape: token counts are a narrow map; the per-domain running
    total does NOT use a per-domain window (one domain's millions of
    docs would land in ONE task) — instead ONE global
    :func:`...operators.sort.ordered_prefix_scan` over
    (domain, priority, id) gives strict global prefix sums, per-domain
    totals reduce to a ≤ #domains summary whose strict-prefix offsets
    come from one BOUNDED window (#domains is small by the same
    corpus-mixture assumption as :func:`domain_cap` /
    :func:`mixture_weights`), and per-domain prefix = global prefix −
    broadcast offset.  One range exchange total.

    Output: selected rows ``(domain, id, n_tok, tokens_before)``.
    """
    from ..operators.sort import ordered_prefix_scan
    from .text import tokens as _tokens

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    toks = df.select(
        F.col(domain_col).alias("__dom"),
        F.col(id_col).alias("__id"),
        F.size(_tokens(F.col(text_col))).cast("long").alias("n_tok"),
    )
    pri = (
        char_poly_hash(F.col("__id").cast("string")) * F.lit(48271)
        + F.lit(salt)
    ) % F.lit(_P31)
    toks = toks.withColumn("__pri", pri)
    scanned = ordered_prefix_scan(
        toks,
        ["__dom", "__pri", "__id"],
        "n_tok",
        agg="sum",
        out_col="__gcum",
        strict=True,
    )
    dom_tot = toks.groupBy("__dom").agg(F.sum("n_tok").alias("__t"))
    w = Window.orderBy("__dom").rowsBetween(Window.unboundedPreceding, -1)
    offs = dom_tot.select(
        "__dom",
        F.coalesce(F.sum("__t").over(w), F.lit(0)).cast("long").alias("__off"),
    )
    return (
        scanned.join(F.broadcast(offs), "__dom")
        .withColumn(
            "tokens_before", (F.col("__gcum") - F.col("__off")).cast("long")
        )
        .filter(F.col("tokens_before") < budget_tokens)
        .select(
            F.col("__dom").alias(domain_col),
            F.col("__id").alias(id_col),
            "n_tok",
            "tokens_before",
        )
    )


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """DSIR-style hashed importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw document by how much it resembles a small TARGET slice,
    ``log p_target(doc) − p_raw(doc)`` under hashed-unigram bag
    models — the data-selection step that upsamples target-like
    pretraining data without training a classifier.

    Both distributions live on the same ``num_buckets`` hashing-trick
    feature space (:func:`...extended.text.hash_features`' portable
    char-fold hash — no vocabulary pass, no global state) with +1
    Laplace smoothing, so the per-bucket log ratio

        lw(b) = ln( ((c_t(b)+1)/(N_t+B)) / ((c_r(b)+1)/(N_r+B)) )

    is a broadcast-sized table.  A document's weight is the sum of
    lw over its word instances.  To keep the distributed sum
    order-independent (float addition is not associative), each
    bucket's lw is QUANTIZED to a 1e9 integer lattice first — the
    per-doc sum is then BIGINT-exact in any summation order (the
    Kaplan-Meier lattice treatment; the ln-libm agreement caveat
    stated there applies here too).

    Scale shape: one explode + two map-combined aggregates (buckets,
    then per-doc sums) + one broadcast join of the ≤ ``num_buckets``
    score table.  The corpus shuffles only as (doc, bucket) word
    rows combining to per-doc partials.

    Output: one row per document with ≥ 1 word feature:
    ``(id, n_feat, log_w_nano)`` — log importance weight × 1e9,
    BIGINT.  Select by thresholding or top-k downstream.
    """
    words = df.select(
        F.col(id_col),
        F.when(is_target, 1).otherwise(0).alias("__t"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("__w"),
    )
    b = words.select(
        id_col,
        "__t",
        (char_poly_hash(F.col("__w")) % num_buckets).alias("__b"),
    )
    dist = b.groupBy("__b").agg(
        F.sum("__t").cast("long").alias("c_t"),
        F.count(F.lit(1)).cast("long").alias("c_r"),
    )
    tot = dist.agg(
        F.sum("c_t").cast("long").alias("n_t"),
        F.sum("c_r").cast("long").alias("n_r"),
    )
    lw = F.log(
        (
            (F.col("c_t") + 1).cast("double")
            / (F.col("n_t") + F.lit(num_buckets)).cast("double")
        )
        / (
            (F.col("c_r") + 1).cast("double")
            / (F.col("n_r") + F.lit(num_buckets)).cast("double")
        )
    )
    scored = dist.crossJoin(F.broadcast(tot)).select(
        "__b",
        F.floor(lw * F.lit(1e9)).cast("long").alias("__lwq"),
    )
    return (
        b.join(F.broadcast(scored), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feat"),
            F.sum("__lwq").cast("long").alias("log_w_nano"),
        )
    )


def matched_pairs(
    df: DataFrame,
    stratum_col: str,
    treated: Column,
    id_col: str,
    salts: int = 8,
) -> DataFrame:
    """Deterministic 1:1 exact matching on a stratification covariate
    — the observational-causal prep step (propensity-bucket matching,
    holdout twin selection) that turns "purchasers vs everyone else"
    into comparable pairs before an :func:`...events.ab_test`-style
    comparison.

    Within each stratum, treated and control units pair greedily by
    ascending id; units past the shorter side's count stay unmatched
    (dropped).  Matching needs per-stratum ranks, and a raw
    per-stratum window is the classic skew trap — the modal stratum
    (e.g. activity = 1) can hold billions of rows at 100 TB.  So the
    stratum SUBDIVIDES by a deterministic id salt (``id % salts``)
    first: ranks run within (stratum, salt) — ``salts``× smaller
    partitions, same exactness guarantees WITHIN each substratum —
    at the cost of cross-salt matches (a treated unit only pairs
    inside its salt; expected match loss is the per-salt imbalance,
    small when strata are large, zero when ``salts=1``).  This is
    the engine-portable version of the blocked-self-join salting
    rule (SCALING.md): the pair semantics are part of the contract,
    stated identically in any engine.

    Output: one row per matched pair —
    ``(stratum, salt, t_id, c_id)``, BIGINT ids; deterministic for a
    given (data, salts).
    """
    if salts < 1:
        raise ValueError("salts must be >= 1")
    from pyspark.sql.window import Window

    base = df.filter(
        F.col(id_col).isNotNull() & F.col(stratum_col).isNotNull()
    ).select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).cast("long").alias("__id"),
        treated.cast("boolean").alias("__t"),
    ).filter(F.col("__t").isNotNull())
    salted = base.select(
        "stratum",
        "__id",
        "__t",
        # dividend-signed `%` (not pmod): the documented `id % salts`
        # contract and the oracle's DuckDB `%` agree on negative ids
        # (round-11 session-2 review finding)
        (F.col("__id") % F.lit(salts)).cast("long").alias("salt"),
    )
    w = Window.partitionBy("stratum", "salt", "__t").orderBy("__id")
    ranked = salted.select(
        "stratum", "salt", "__id", "__t",
        F.row_number().over(w).cast("long").alias("__rk"),
    )
    t = ranked.filter(F.col("__t")).select(
        "stratum", "salt", "__rk", F.col("__id").alias("t_id")
    )
    c = ranked.filter(~F.col("__t")).select(
        "stratum", "salt", "__rk", F.col("__id").alias("c_id")
    )
    return t.join(c, ["stratum", "salt", "__rk"]).select(
        "stratum", "salt", "t_id", "c_id"
    )


def systematic_sample(
    df: DataFrame,
    order_by: Sequence[str],
    every: int,
    offset: int = 0,
) -> DataFrame:
    """Systematic (every-k-th) sampling in a TOTAL key order — the
    audit-sampling flavor (inventory spot checks, compliance pulls)
    where the contract is "the 3rd, 10th, 17th, ... record in ledger
    order", not a hash coin-flip: unlike :func:`hash_split`'s
    per-row Bernoulli determinism, systematic sampling guarantees
    EXACT stride coverage over the ordered population even when the
    key domain has gaps (where ``id % k`` silently skews).

    The order rank comes from ``stable_row_ids`` — the distributed
    range-partitioned prefix-sum numbering, never a global
    single-task ``row_number`` — and the sample is the narrow filter
    ``row_id % every == offset``.

    Output: the sampled rows with their ``row_id`` rank retained
    (rank 0 = first in order).
    """
    from ..operators.sort import stable_row_ids

    if every < 2:
        raise ValueError("every must be >= 2")
    if not 0 <= offset < every:
        raise ValueError("offset must be in [0, every)")
    ranked = stable_row_ids(df, list(order_by), id_col="row_id")
    return ranked.filter(
        F.col("row_id") % F.lit(int(every)) == F.lit(int(offset))
    )
