"""Mergeable cardinality sketches with ENGINE-PORTABLE hashing.

The existing approximate-aggregate gate (``agg_approx``) self-certifies
Spark's builtin HLL/t-digest with error-bound booleans; these
operators go further: the whole sketch — hash, register, estimator —
is integer arithmetic over md5 hex-prefix hashes (md5 has identical
semantics in Spark and DuckDB), so a DuckDB oracle rebuilds
bit-identical registers and the estimate itself is hash-checked
across engines.  That is the property a production
pipeline needs when sketches are persisted and merged across systems:
two engines must agree on the REGISTERS, not just land inside an error
bound.

Reference scope: the reference engine's aggregate surface
(`/root/reference/slide/utils.py` group-agg ops) has no sketch
aggregates; these are Spark-first extensions in the
training-pipeline-profiling family (distinct counts of near-unbounded
key spaces: URLs, doc fingerprints, user ids).

Scale shapes (the point of a sketch at 100 TB):

- HLL: ONE ``groupBy(group, bucket).agg(max(rho))`` — the aggregate's
  key space is ``groups × m`` regardless of input rows, so map-side
  combine collapses each partition to ≤ m rows per group and the
  shuffle is sketch-sized, not data-sized.  No distinct, no sort.
- KMV (exact k-th minimum distinct hash): a data-sized distinct is
  unavoidable (the statistic is over the distinct set), but the sort
  is not — a coarse-bucket histogram (4096 cells per group, counted
  with ``count_distinct`` partial aggregation) locates the k-th value's
  bucket, and only that O(k + n_distinct/4096) sliver is ranked.  The
  classic distributed order-statistic two-pass; no per-group global
  sort of the distinct table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "portable_hash31",
    "portable_hash56",
    "quantile_kmv_sketch",
    "kmv_diff_estimate",
    "hll_sketch",
    "hll_estimate",
    "hll_merge",
    "kmv_kth_hash",
    "kmv_bottom",
    "kmv_estimate",
    "kmv_union_estimate",
    "cms_sketch",
    "cms_point_estimate",
    "cms_inner_product",
    "bitmap_distinct",
]

#: Mersenne prime 2^31 - 1 — modulus of the pairwise hash family used
#: by the count-min rows (h_d(x) = ((h·48271^(d+1) + d) mod P) mod w).
_P31 = 2147483647


def portable_hash31(col: Column) -> Column:
    """Engine-portable UNIFORM key hash in ``[0, 2^31)``: the first 8
    hex digits of ``md5`` of the key's string form, as an integer, mod
    2^31.  md5 exists with identical semantics in Spark and DuckDB
    (``('0x' || substring(md5(s),1,8))::BIGINT`` on the DuckDB side),
    and unlike the MINSTD char fold it has full avalanche — sketch
    estimators (HLL rho ranks) need cryptographic-grade bit uniformity
    that a linear-congruential fold cannot provide on clustered key
    spaces like sequential ids."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(1 << 31),
    )


def portable_hash56(col: Column) -> Column:
    """56-bit variant (first 14 md5 hex digits) for order-statistic
    sketches: KMV needs hash RESOLUTION (the k-th minimum of n distinct
    values sits near ``2^bits·k/n`` — 31 bits run out of headroom by
    n ≈ 10^7) while keeping ``(k-1)·2^56`` inside int64 for the exact
    integer estimator."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 14), 16, 10).cast(
        "long"
    )


def _rho(w: Column, max_bits: int) -> Column:
    """1-based leading-zero rank of ``w`` within ``max_bits`` bits:
    ``max_bits - msb(w) + 1`` with ``msb`` = length of the minimal
    binary string — ``bin()`` has identical minimal-width semantics in
    Spark and DuckDB, so the register values match bit-for-bit."""
    return F.when(w == 0, F.lit(max_bits + 1)).otherwise(
        F.lit(max_bits + 1) - F.length(F.bin(w))
    )


def hll_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    p: int = 6,
) -> DataFrame:
    """HyperLogLog registers per group: ``(group..., bucket, rho)``
    with ``bucket = h mod 2^p`` and ``rho`` the max leading-zero rank
    of the remaining ``31 - p`` hash bits (Flajolet et al. 2007).

    ONE aggregate, key space ``groups × 2^p``: map-side combine makes
    the shuffle sketch-sized however large the input.  Registers are
    mergeable across runs/engines by ``max(rho)`` — the property that
    makes HLL the 100 TB distinct counter."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    h = portable_hash31(F.col(key_col))
    w = F.floor(h / F.lit(m)).cast("long")  # h < 2^31: exact in double
    return (
        df.select(
            *group_cols,
            (h % F.lit(m)).alias("bucket"),
            _rho(w, 31 - p).cast("int").alias("__r"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__r").alias("rho"))
    )


def hll_estimate(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    p: int = 6,
    alpha_milli: int | None = None,
) -> DataFrame:
    """Integer-exact HLL estimate per group.

    ``S = Σ_buckets 2^(32 - rho)`` (empty buckets contribute ``2^32``)
    is BIGINT-exact.  Every register term is a multiple of ``2^p``
    (rho ≤ 32 - p), so ``S div 2^p`` is an exact reduction and the raw
    estimate ``alpha · m² / Σ 2^(-rho)`` is ONE BIGINT floor division

        ``(alpha_milli · 2^(p+29)) div (125 · (S div 2^p))``

    identical in value to the unreduced
    ``(alpha_milli · m² · 2^29) div (125 · S)`` but with the numerator
    bounded at ``alpha_milli · 2^45`` — inside int64 for the whole
    supported ``p ∈ [4, 16]`` range (the unreduced form overflows at
    p ≥ 13), and under ``2^53`` (double-representable in any engine's
    mirror) for ``p ≤ 14``.  No floating point anywhere, so two
    engines cannot disagree in the last ulp.

    ``alpha_milli`` defaults per the HLL paper's bias constants in
    thousandths — 673/697/709 for p = 4/5/6, ``round(721.3 /
    (1 + 1.079/m))`` beyond — and may be overridden.

    Output: ``(group..., m, nonzero, s, est)``.
    """
    m = 1 << p
    if alpha_milli is None:
        alpha_milli = {4: 673, 5: 697, 6: 709}.get(p) or round(
            721.3 / (1 + 1.079 / m)
        )
    regs = hll_sketch(df, group_cols, key_col, p)
    per_bucket = F.expr("shiftleft(CAST(1 AS BIGINT), 32 - rho)")
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(per_bucket).alias("__sp"),
    )
    return agg.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        F.col("nonzero").cast("long").alias("nonzero"),
        F.expr(
            f"CAST(__sp + ({m} - nonzero) * {1 << 32} AS BIGINT)"
        ).alias("s"),
    ).withColumn(
        "est",
        F.expr(
            f"(CAST({alpha_milli} AS BIGINT) * {1 << (p + 29)})"
            f" div (125 * (s div {m}))"
        ).cast("long"),
    )


def kmv_kth_hash(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int = 64,
    coarse_bits: int = 12,
) -> DataFrame:
    """EXACT k-th smallest distinct portable hash per group, without
    sorting the distinct table — the KMV / bottom-k sketch statistic
    (Bar-Yossef et al. 2002; Beyer et al. 2007).

    Two passes:

    1. coarse histogram: ``count_distinct(h)`` per
       ``(group, h div 2^(56 - coarse_bits))`` — the 56-bit portable
       hash bucketed into 4096 cells per group
       at the default, partial-aggregated; a per-group running sum
       over those ≤ 4096 cells (bounded window) locates the cell
       containing the k-th distinct hash.
    2. refine: only hashes below that cell's upper edge (expected
       ``k + n_distinct/2^coarse_bits`` rows per group) are
       distinct-ed and ranked.  The full distinct table is never
       sorted.

    Groups with fewer than ``k`` distinct keys are dropped (the
    statistic is undefined).  Output: ``(group..., kth_hash)``.
    """
    return (
        kmv_bottom(df, group_cols, key_col, k, coarse_bits)
        .filter(F.col("rk") == k)
        .select(*group_cols, F.col("h").alias("kth_hash"))
    )


def kmv_bottom(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int = 64,
    coarse_bits: int = 12,
) -> DataFrame:
    """The full bottom-k sketch per group — the ``k`` smallest
    distinct portable hashes, ranked: ``(group..., h, rk)`` with
    ``rk ∈ [1, k]``.  This IS the persistable KMV synopsis: bottom-k
    sets from disjoint corpora (or per-group sets) union into the
    bottom-k of the combined key set by re-ranking the merged rows —
    see :func:`kmv_union_estimate`.

    Same two-pass shape as :func:`kmv_kth_hash` (which takes this
    sketch's last row): coarse ``count_distinct`` histogram locates
    the k-th hash's cell, only that sliver is distinct-ed and ranked.
    Groups with fewer than ``k`` distinct keys return all their
    hashes (rk < k rows only).
    """
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    shift = 1 << (56 - coarse_bits)
    h = portable_hash56(F.col(key_col)).alias("h")
    hashed = df.select(*group_cols, h)
    cells = hashed.groupBy(
        *group_cols, F.floor(F.col("h") / F.lit(shift)).alias("cell")
    ).agg(F.count_distinct("h").alias("nd"))
    wc = Window.partitionBy(*group_cols).orderBy("cell")
    located = (
        cells.withColumn("cum", F.sum("nd").over(wc))
        .filter(F.col("cum") >= k)
        .groupBy(*group_cols)
        .agg(F.min("cell").alias("kcell"))
    )
    wr = Window.partitionBy(*group_cols).orderBy("h")
    joined = (
        hashed.crossJoin(F.broadcast(located))
        if not group_cols
        else hashed.join(F.broadcast(located), list(group_cols))
    )
    return (
        joined
        .filter(F.col("h") < (F.col("kcell") + 1) * F.lit(shift))
        .select(*group_cols, "h")
        .distinct()
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= k)
    )


def kmv_union_estimate(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    coarse_bits: int = 12,
) -> DataFrame:
    """Distinct-count estimate of the UNION of every unordered group
    pair, from the groups' bottom-k sketches alone — the KMV set
    operation (Beyer et al. 2007): the k smallest hashes of A ∪ B are
    all contained in bottom-k(A) ∪ bottom-k(B), so merging two k-row
    synopses and re-ranking yields the EXACT k-th minimum of the union
    without revisiting either corpus.  With per-group estimates this
    gives inclusion-exclusion intersection/Jaccard estimates for free.

    Scale shape: the per-group sketches cost the one corpus pass of
    :func:`kmv_bottom`; everything after runs on ``groups × k`` rows —
    the pair join is broadcast-tiny however large the data was.

    Output: one row per pair ``(g1 < g2)``:
    ``(g1, g2, kth_hash, est)`` with the same integer-exact
    ``(k-1)·2^56 div u_k`` estimator as :func:`kmv_estimate`.
    Pairs whose union has fewer than ``k`` distinct keys are dropped.
    """
    from pyspark.sql.window import Window

    if not 2 <= k <= 127:
        raise ValueError("k must be in [2, 127] for the int64 estimator")
    bottom = kmv_bottom(df, [group_col], key_col, k, coarse_bits).select(
        F.col(group_col).alias("__g"), "h"
    )
    gs = bottom.select("__g").distinct()
    pairs = (
        gs.select(F.col("__g").alias("g1"))
        .crossJoin(gs.select(F.col("__g").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    side_a = pairs.join(bottom, F.col("g1") == F.col("__g")).select(
        "g1", "g2", "h"
    )
    side_b = pairs.join(bottom, F.col("g2") == F.col("__g")).select(
        "g1", "g2", "h"
    )
    merged = side_a.union(side_b).distinct()
    wr = Window.partitionBy("g1", "g2").orderBy("h")
    return (
        merged.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == k)
        .select(
            "g1",
            "g2",
            F.col("h").alias("kth_hash"),
            F.expr(f"(CAST({k - 1} AS BIGINT) * {1 << 56}) div h")
            .cast("long")
            .alias("est"),
        )
    )


def kmv_estimate(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int = 64,
    coarse_bits: int = 12,
) -> DataFrame:
    """KMV distinct-count estimate per group, integer-exact:
    ``est = (k-1) · 2^56 div kth_hash`` — the unbiased (k-1)/u_k
    estimator with the division done in BIGINT (``(k-1)·2^56`` must
    stay inside int64: k ≤ 127), so engines agree exactly.
    Output: ``(group..., kth_hash, est)``."""
    if not 2 <= k <= 127:
        raise ValueError("k must be in [2, 127] for the int64 estimator")
    kth = kmv_kth_hash(df, group_cols, key_col, k, coarse_bits)
    return kth.withColumn(
        "est",
        F.expr(
            f"(CAST({k - 1} AS BIGINT) * {1 << 56}) div kth_hash"
        ).cast("long"),
    )


def hll_merge(
    regs: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge HLL register tables by ``max(rho)`` per bucket — THE
    property that makes HLL the 100 TB distinct counter: sketches
    built independently (per partition, per day, per engine, per run)
    union losslessly into the sketch of the combined corpus without
    touching the raw keys again.  Feed the result to the same
    estimator as a directly-built sketch.

    ``group_cols`` are the key columns to KEEP; any sketch column not
    named (e.g. a source/day column) is merged away.  One map-combined
    aggregate over ``groups × m`` keys.
    """
    return regs.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def _cms_cells(key: Column, depth: int, width: int) -> Column:
    """array<struct<d, cell>> of the depth row/cell coordinates for a
    key: ``cell_d = ((h · 48271^(d+1) + d) mod (2^31-1)) mod width``
    with ``h`` the portable 31-bit hash — products stay under 2^62,
    and the identical arithmetic is one SQL expression per row."""
    h = portable_hash31(key)
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                (
                    ((h * F.lit(pow(48271, d + 1, _P31)) + F.lit(d)) % F.lit(_P31))
                    % F.lit(width)
                )
                .cast("int")
                .alias("cell"),
            )
            for d in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch per group: occupied registers
    ``(group..., d, cell, cnt)`` — the fixed-size frequency summary
    for heavy-hitter queries over unbounded key spaces (Cormode &
    Muthukrishnan 2005).

    ONE aggregate whose key space is ``groups × depth × width``
    however large the input: map-side combine collapses each
    partition to at most that many cells before the shuffle — the
    same sketch-sized-shuffle story as :func:`hll_sketch`.  Sketches
    from disjoint corpora merge by cell-wise SUM of ``cnt``; point
    estimates never underestimate (each row's cell ≥ the true count),
    so ``min`` over rows is a certified upper-biased estimate.
    """
    if not 1 <= depth <= 8:
        raise ValueError("depth must be in [1, 8]")
    if width < 2:
        raise ValueError("width must be >= 2")
    return (
        df.select(
            *group_cols,
            F.explode(_cms_cells(F.col(key_col), depth, width)).alias("dc"),
        )
        .select(
            *group_cols, F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell")
        )
        .groupBy(*group_cols, "d", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_point_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimate for each probe key against a
    :func:`cms_sketch` table (same depth/width): ``min`` over the
    depth rows of the probed cell's count, absent cells counting 0.

    The probe table is expected to be small (a candidate/watchlist
    set): its exploded ``(group, d, cell)`` coordinates equi-join the
    sketch — broadcast when tiny — and one ``min`` aggregate per
    probe returns the estimate.  Deterministic one-sided error:
    ``est >= exact`` always, ``est <= exact + εN`` with the usual CMS
    probability over the hash family.
    """
    pcells = probes.select(
        *group_cols,
        F.col(key_col),
        F.explode(_cms_cells(F.col(key_col), depth, width)).alias("dc"),
    ).select(
        *group_cols,
        key_col,
        F.col("dc.d").alias("d"),
        F.col("dc.cell").alias("cell"),
    )
    return (
        pcells.join(sketch, [*group_cols, "d", "cell"], "left")
        .groupBy(*group_cols, key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )


def cms_inner_product(
    sk_a: DataFrame, sk_b: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Equi-join CARDINALITY estimate from two Count-Min sketches
    (Cormode & Muthukrishnan 2005): |A ⋈_k B| = Σ_k cntA(k)·cntB(k)
    is estimated by the per-row inner product of the two register
    tables, minimized over the depth rows.  Deterministically
    one-sided (est ≥ exact — collisions only ADD), within εN·M with
    the usual CMS probability.

    This is the 100 TB join PRE-FLIGHT: the sketches cost one
    map-combined pass per side, and the estimate — computed on
    depth × width rows, broadcast scale — tells the planner whether
    the join explodes (skewed key) BEFORE paying its shuffle.  The
    same estimate against a sketch of itself bounds self-join size,
    the classic skew diagnostic.

    Both sketches must share (depth, width, group cols).  Output:
    ``(group..., est)``.
    """
    a = sk_a.select(*group_cols, "d", "cell", F.col("cnt").alias("__ca"))
    b = sk_b.select(*group_cols, "d", "cell", F.col("cnt").alias("__cb"))
    j = a.join(b, [*group_cols, "d", "cell"])
    per_d = j.groupBy(*group_cols, "d").agg(
        F.sum(F.col("__ca") * F.col("__cb")).cast("long").alias("__ip")
    )
    return per_d.groupBy(*group_cols).agg(
        F.min("__ip").cast("long").alias("est")
    )


def kmv_intersect_estimate(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    coarse_bits: int = 12,
) -> DataFrame:
    """Intersection / Jaccard estimates for every unordered group pair
    from bottom-k sketches alone — the full KMV set algebra (Beyer et
    al. 2007, §4): with ``K = bottom-k(A ∪ B)`` (exact from the merged
    synopses, see :func:`kmv_union_estimate`), the fraction of K's
    members present in BOTH sketches estimates the Jaccard
    coefficient, and ``est_inter = (|K∩| · est_union) div k`` the
    intersection size.  Every quantity stays on the BIGINT lattice
    (counts, the (k-1)·2^56 div u_k estimator, one integer product /
    floor-div), so engines agree bit-for-bit.

    Output per pair ``(g1 < g2)``: ``(g1, g2, kth_hash, est_union,
    k_common, est_inter, jaccard_milli)``; pairs whose union has
    fewer than ``k`` distinct keys are dropped (use exact counting
    there — the sketch regime starts above k).

    Scale shape: identical to :func:`kmv_union_estimate` — one corpus
    pass builds the per-group sketches; all pair algebra runs on
    ``groups × k`` rows.
    """
    from pyspark.sql.window import Window

    if not 2 <= k <= 127:
        raise ValueError("k must be in [2, 127] for the int64 estimator")
    bottom = kmv_bottom(df, [group_col], key_col, k, coarse_bits).select(
        F.col(group_col).alias("__g"), "h"
    )
    gs = bottom.select("__g").distinct()
    pairs = (
        gs.select(F.col("__g").alias("g1"))
        .crossJoin(gs.select(F.col("__g").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    side_a = pairs.join(bottom, F.col("g1") == F.col("__g")).select(
        "g1", "g2", "h", F.lit(1).alias("in_a")
    )
    side_b = pairs.join(bottom, F.col("g2") == F.col("__g")).select(
        "g1", "g2", "h", F.lit(1).alias("in_b")
    )
    merged = (
        side_a.select("g1", "g2", "h", "in_a", F.lit(0).alias("in_b"))
        .unionByName(
            side_b.select("g1", "g2", "h", F.lit(0).alias("in_a"), "in_b")
        )
        .groupBy("g1", "g2", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wr = Window.partitionBy("g1", "g2").orderBy("h")
    ranked = merged.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= k
    )
    return (
        ranked.groupBy("g1", "g2")
        .agg(
            F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth_hash"),
            F.sum((F.col("in_a") * F.col("in_b"))).cast("long").alias(
                "k_common"
            ),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") == k)
        .select(
            "g1",
            "g2",
            "kth_hash",
            F.expr(f"(CAST({k - 1} AS BIGINT) * {1 << 56}) div kth_hash")
            .cast("long")
            .alias("est_union"),
            "k_common",
        )
        .withColumn(
            "est_inter",
            F.expr(
                f"(k_common * ((CAST({k - 1} AS BIGINT) * {1 << 56})"
                f" div kth_hash)) div {k}"
            ).cast("long"),
        )
        .withColumn(
            "jaccard_milli",
            F.expr(f"(k_common * 1000) div {k}").cast("long"),
        )
    )


def bitmap_distinct(
    df: DataFrame,
    group_col: str,
    id_col: str,
    domain: int,
    shard_col: Column | None = None,
) -> DataFrame:
    """EXACT distinct counting over a BOUNDED integer id domain via
    bitmap words — the bitmap-index technique that beats both
    ``COUNT(DISTINCT)`` (full shuffle of every occurrence) and HLL
    (approximate) when ids are dense machine-assigned integers
    (user ids, device ids, product ids): per (group, word) the OR of
    ``1 << (id mod 62)`` collapses map-side to at most
    ``domain/62`` rows per group regardless of row count, and
    ``sum(bit_count(word))`` reads the exact distinct total off the
    sketch.  62-bit words keep every shift off the int64 sign bit in
    any engine.

    Bitmaps form a merge algebra exactly like the bloom/HLL/KMV
    sketches (OR is associative/commutative/idempotent): with
    ``shard_col`` the build runs per (shard, group, word) first and
    the shards OR-merge — the incremental-build path a 100 TB
    pipeline uses to fold yesterday's bitmap into today's.

    An IN-PLAN ``raise_error`` guard fires on any id outside
    ``[0, domain)`` — a silent wraparound would alias two ids onto
    one bit and undercount.

    Output: ``(group_col, n_distinct)``.
    """
    if domain < 1:
        raise ValueError("domain must be >= 1")
    idc = F.col(id_col).cast("long")
    guarded = F.when(
        idc.isNull() | (idc < 0) | (idc >= domain),
        F.raise_error(
            F.lit(
                f"bitmap_distinct: id outside [0, {domain}) — widen the"
                " domain"
            )
        ).cast("long"),
    ).otherwise(idc)
    shard_cols = (
        [shard_col.cast("long").alias("__s")] if shard_col is not None else []
    )
    base = df.select(
        F.col(group_col).alias("__g"), *shard_cols, guarded.alias("__id")
    )
    word = F.expr("__id div 62").alias("__w")
    # the Python shiftleft helper takes a literal bit count; the SQL
    # form accepts a column expression
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__id % 62 AS INT))")
    if shard_col is not None:
        sharded = base.select("__g", "__s", word, bit.alias("__b"))
        per_shard = sharded.groupBy("__g", "__s", "__w").agg(
            F.bit_or("__b").alias("__bm")
        )
        merged = per_shard.groupBy("__g", "__w").agg(
            F.bit_or("__bm").alias("__bm")
        )
    else:
        merged = base.select("__g", word, bit.alias("__b")).groupBy(
            "__g", "__w"
        ).agg(F.bit_or("__b").alias("__bm"))
    return (
        merged.groupBy("__g")
        .agg(F.sum(F.bit_count("__bm")).cast("long").alias("n_distinct"))
        .select(F.col("__g").alias(group_col), "n_distinct")
    )


def quantile_kmv_sketch(
    df: DataFrame,
    value_col: str,
    id_col,
    ps_bp: Sequence[int] = (2500, 5000, 7500, 9500),
    k: int = 1000,
    eps_bp: int = 500,
) -> DataFrame:
    """Mergeable quantile sketch by KMV row sampling, with IN-PLAN
    certification — the order-statistic sibling of
    :func:`kmv_estimate`: the ``k`` rows with the smallest portable
    row hashes are a deterministic uniform sample whose UNION across
    shards/slices is again a KMV sample (re-rank the merged rows, keep
    the bottom k) — the reaggregation property that makes it a
    sketch, not a sample job.  Quantile estimates are exact DISC rank
    selections on the bounded sample; the plan then counts each
    estimate's TRUE rank in the full data and emits
    ``within_eps`` booleans (the agg_approx self-certifying
    pattern) — the sketch carries its own error evidence.

    Scale shape: the sample is ``orderBy(hash).limit(k)`` — a
    TakeOrdered with per-partition partial top-k, never a full sort;
    the rank selection is a window over <= k rows (bounded BY
    CONSTRUCTION); certification is one broadcast of the |ps|
    estimates against one scan with a map-combined grouped count.
    Deterministic end-to-end: hash ties break on the id, value ties
    rank by (value, hash).

    Output: one row per requested quantile —
    ``(p_bp, est, n, true_rank, within_eps)`` where ``est`` is in
    the value column's own units and ``true_rank`` counts
    ``value <= est`` over the full data.
    """
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    if not ps_bp:
        raise ValueError("ps_bp must be non-empty")
    if any(p < 1 or p > 10000 for p in ps_bp):
        raise ValueError("quantiles are basis points in [1, 10000]")
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    base = df.filter(
        F.col(value_col).isNotNull() & idc.isNotNull()
    ).select(
        F.col(value_col).alias("__v"),
        portable_hash56(idc).alias("__h"),
        idc.alias("__id"),
    )
    sample = base.orderBy("__h", "__id").limit(k)
    w_rank = Window.orderBy("__v", "__h")
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = sample.select(
        "__v",
        F.row_number().over(w_rank).cast("long").alias("__rv"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("__m"),
    )
    ps = df.sparkSession.createDataFrame(
        [(int(p),) for p in ps_bp], "p_bp long"
    )
    est = (
        ranked.join(F.broadcast(ps))
        .filter(
            F.col("__rv")
            == F.expr("(p_bp * __m + 9999) DIV 10000")
        )
        .select("p_bp", F.col("__v").alias("est"))
    )
    counts = (
        base.select("__v")
        .join(F.broadcast(est))
        .groupBy("p_bp", "est")
        .agg(
            F.sum(F.when(F.col("__v") <= F.col("est"), 1).otherwise(0))
            .cast("long")
            .alias("true_rank"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    within = (
        F.abs(
            F.col("true_rank") * 10000 - F.col("p_bp") * F.col("n")
        )
        <= F.lit(int(eps_bp)) * F.col("n")
    )
    return counts.select(
        "p_bp", "est", "n", "true_rank", within.alias("within_eps")
    )


def kmv_diff_estimate(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    k: int = 64,
    coarse_bits: int = 12,
    tol_pct: int = 50,
) -> DataFrame:
    """Distinct-count estimate of the set DIFFERENCE ``|A \\ B|``
    from A's bottom-k sketch — the audience-subtraction operation
    (reach minus suppression list, corpus minus contamination set)
    completing the KMV set algebra beside :func:`kmv_union_estimate`
    and :func:`kmv_intersect_estimate`: A's bottom-k hashes are a
    uniform sample of A's distinct keys, so the fraction of the
    sample NOT found in B estimates the difference fraction, scaled
    by the KMV cardinality estimate of A (Beyer et al. 2007 §4).

    Scale shape: A's sketch costs the one corpus pass of
    :func:`kmv_bottom`; membership is a k-row broadcast semi/anti
    probe against B's hashed distinct keys (B is scanned once, never
    joined at corpus width); the in-plan EXACT difference (one
    distinct anti-join) is the certification pattern (knn_beam's
    in-plan ground truth) — drop it in production and keep the
    estimate, which is the entire point of the sketch.

    All arithmetic int64-exact: the cardinality estimator is the
    shared ``(k-1)·2^56 div u_k``; the scale-down is subtract-mod
    floor division.  Emits empty when A has fewer than ``k``
    distinct keys (the statistic is undefined, the kmv contract).

    Output: one row
    ``(k, n_sample_not_in_b, a_est, diff_est, diff_exact, ok)`` with
    ``ok`` = relative error within ``tol_pct`` percent (exact-zero
    differences require an exact-zero estimate).
    """
    if not 2 <= k <= 127:
        raise ValueError("k must be in [2, 127] for the int64 estimator")
    a_keys = (
        df_a.select(F.col(key_col).alias("__ka"))
        .filter(F.col("__ka").isNotNull())
        .distinct()
    )
    b_keys = (
        df_b.select(F.col(key_col).alias("__kb"))
        .filter(F.col("__kb").isNotNull())
        .distinct()
    )
    bottom = kmv_bottom(
        a_keys, [], "__ka", k, coarse_bits
    )
    kth = bottom.filter(F.col("rk") == k).select(
        F.expr(f"(CAST({k - 1} AS BIGINT) * {1 << 56}) div h")
        .cast("long")
        .alias("a_est")
    )
    b_hashes = b_keys.select(portable_hash56(F.col("__kb")).alias("h"))
    not_in_b = bottom.join(b_hashes, "h", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_not")
    )
    exact = a_keys.join(
        b_keys, a_keys["__ka"] == b_keys["__kb"], "left_anti"
    ).agg(F.count(F.lit(1)).cast("long").alias("diff_exact"))
    est = (
        F.col("n_not") * F.col("a_est")
        - (F.col("n_not") * F.col("a_est")) % F.lit(k)
    ) / F.lit(k)
    joined = (
        not_in_b.join(F.broadcast(kth)).join(F.broadcast(exact))
    )
    return joined.select(
        F.lit(int(k)).cast("long").alias("k"),
        F.col("n_not").alias("n_sample_not_in_b"),
        "a_est",
        est.cast("long").alias("diff_est"),
        "diff_exact",
        (
            F.abs(est.cast("long") - F.col("diff_exact"))
            * F.lit(100)
            <= F.lit(int(tol_pct)) * F.col("diff_exact")
        ).alias("ok"),
    )
