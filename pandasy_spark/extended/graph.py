"""Iterative graph analytics on DataFrames: PageRank.

No counterpart in the reference (its surface is relational —
SURVEY.md §2); companion to the connected-components operator in
``extended.dedup``.  Like that operator, the loop is a fixed chain of
joins + aggregates so Catalyst plans each round like any relational
query, with ``localCheckpoint`` bounding lineage growth.

Determinism: ranks are kept in integer nano-units (BIGINT) and every
update uses only integer floor-division and multiplication, so the
result is bit-identical across engines and partitionings — a DuckDB
oracle can state the same iterations in closed form.  (Float PageRank
sums are shuffle-order-dependent in the last ULP; integer grids are
not.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

#: rank scale: 1.0 == 10^9 nano-units.
SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 4,
    damping_pct: int = 85,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Every node appearing as a source starts at rank ``SCALE`` (1.0 in
    nano-units); each round a node sends ``rank div outdeg`` to each
    out-neighbour and collects ``floor(SCALE*(100-damping_pct)/100) +
    (damping_pct * incoming) div 100``.  Dangling nodes (no
    out-edges) receive updates but originate none, and their leaked
    mass is dropped — the standard simplification; pass a
    symmetrized edge list if every node must have out-degree >= 1.

    Returns ``(node BIGINT, rank_nano BIGINT)`` for every node that
    appears as a source or destination.

    Scale shape: out-degrees are one map-side-combined aggregate;
    each iteration is one equi-join of the (|V|-sized) rank table
    against the edge list on ``src`` — broadcast when the rank table
    is small, shuffle-hash otherwise, Spark's AQE picks — followed by
    one map-side-combined sum on ``dst``.  k iterations = k
    join+agg rounds, O(|E|) each; ``localCheckpoint`` every
    ``checkpoint_every`` rounds keeps the plan from growing
    superlinearly (same discipline as connected components,
    extended/dedup.py).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    if iterations > 1:
        # the edge list is scanned every round: materialize the
        # distinct ONCE instead of re-deriving it from the source
        # (and re-shuffling) per iteration
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (100 - damping_pct) * SCALE // 100
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank_nano"))
    for i in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_nano div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * coalesce(incoming, 0L)) div 100"
                    )
                ).alias("rank_nano"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
