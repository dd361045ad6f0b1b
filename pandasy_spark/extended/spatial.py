"""Planar spatial operators: grid-bucketed radius (distance) joins.

No counterpart in the reference (its surface is stateless frame ops —
SURVEY.md §2.9) and none in Spark: a naive ``dx*dx + dy*dy <= r*r``
theta-join plans as a Cartesian product.  The scale-safe shape is the
classic spatial-grid decomposition (the same pigeonhole idea as the
tolerance join in operators/rangejoin.py, in two dimensions): bucket
points into r-sized cells, have each left point probe its 3×3 cell
neighborhood, equi-join on the cell key, then filter exactly.  Any
pair within distance r differs by at most one cell per axis, so the
probe set is complete; each right point lives in exactly one cell, so
no pair is emitted twice.

All arithmetic is int64 (coordinates on a caller-chosen integer grid,
squared distances), so results value-hash across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "radius_join",
    "radius_pairs",
    "point_in_polygon",
    "dbscan",
    "knn_join",
]


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: int,
    id_cols: tuple[str, str] = ("id_l", "id_r"),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All (left, right) point pairs within Euclidean distance
    ``radius`` (inclusive), on integer planar coordinates.

    ``left`` / ``right`` carry ``(id, x, y)`` with the id column named
    per ``id_cols``; coordinates are int64 on whatever grid the caller
    scaled to (meters, milli-degrees, embedding cells...).

    Output: ``(id_l, id_r, dist_sq)`` — squared distance, exact
    BIGINT (no sqrt: comparisons and ranking never need it, and the
    lattice keeps engines bit-identical).

    Scale shape: ONE equi-join on (cell_x, cell_y) after a 9-way
    left-side probe explode — shuffle partitioned by cell, never a
    Cartesian product.  Cell population bounds the per-key fan-out;
    for heavily skewed point sets (urban clusters) AQE's skew split
    applies as with any hot equi-join key.  Cost scales with the
    number of NEARBY pairs, which is the output size — the optimum
    for any radius join.
    """
    if radius <= 0:
        raise ValueError("radius must be a positive integer")
    id_l, id_r = id_cols
    r2 = radius * radius
    cell = lambda c: F.floor(c / F.lit(radius))  # noqa: E731

    rb = right.select(
        F.col(id_r),
        F.col(x_col).cast("long").alias("__rx"),
        F.col(y_col).cast("long").alias("__ry"),
    ).withColumns(
        {
            "__cx": cell(F.col("__rx")),
            "__cy": cell(F.col("__ry")),
        }
    )
    offsets = F.expr(
        "array(-1, 0, 1)"
    )
    lb = (
        left.select(
            F.col(id_l),
            F.col(x_col).cast("long").alias("__lx"),
            F.col(y_col).cast("long").alias("__ly"),
        )
        .withColumn("__dx", F.explode(offsets))
        .withColumn("__dy", F.explode(offsets))
        .withColumns(
            {
                "__cx": cell(F.col("__lx")) + F.col("__dx"),
                "__cy": cell(F.col("__ly")) + F.col("__dy"),
            }
        )
    )
    d2 = (F.col("__lx") - F.col("__rx")) * (
        F.col("__lx") - F.col("__rx")
    ) + (F.col("__ly") - F.col("__ry")) * (F.col("__ly") - F.col("__ry"))
    return (
        lb.join(rb, ["__cx", "__cy"])
        .withColumn("dist_sq", d2)
        .filter(F.col("dist_sq") <= F.lit(r2))
        .select(id_l, id_r, F.col("dist_sq").cast("long").alias("dist_sq"))
    )


def radius_pairs(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Self radius join: unordered pairs (``id1 < id2``) of distinct
    points within ``radius`` — the spatial-clustering / neighbor-graph
    primitive (DBSCAN's epsilon neighborhood, store-proximity dedup).

    Same grid plan as :func:`radius_join`; the ``id1 < id2`` filter
    rides the exact-distance filter, after the equi-join, so each
    unordered pair still survives from exactly one probed cell.
    """
    l = points.select(
        F.col(id_col).alias("id1"), F.col(x_col), F.col(y_col)
    )
    r = points.select(
        F.col(id_col).alias("id2"), F.col(x_col), F.col(y_col)
    )
    joined = radius_join(l, r, radius, ("id1", "id2"), x_col, y_col)
    return joined.filter(F.col("id1") < F.col("id2"))


def point_in_polygon(
    df: DataFrame,
    polygon: "list[tuple[int, int]]",
    x_col: str = "x",
    y_col: str = "y",
    flag_col: str = "inside",
) -> DataFrame:
    """Point-in-polygon test against ONE literal polygon (geofence
    filtering: "keep events inside this region") via the standard
    crossing-number (ray-casting) rule, evaluated as pure int64
    codegen per row — the polygon unrolls into one boolean expression
    per edge, so at 100 TB this is a narrow map fused into the scan,
    no join, no UDF.

    For each directed edge A→B, the upward-crossing half-open rule:
    the ray from (x, y) to +∞ in x crosses the edge iff
    ``Ay <= y < By`` (upward) with the point strictly LEFT of the
    edge — ``cross = (Bx-Ax)*(y-Ay) - (x-Ax)*(By-Ay) > 0`` — or
    symmetrically for downward edges (``By <= y < Ay``, cross < 0).
    Odd crossing count = inside.  Integer coordinates keep every
    product exact, so the predicate value-hashes in any engine; the
    half-open vertex rule makes points AT a vertex or on an edge
    deterministic (counted by the same rule on both engines), not
    well-defined "inside" in the geometric sense — quantize the grid
    so boundary cases cannot matter if that distinction does.

    Non-convex and self-intersecting polygons follow the even-odd
    rule.  ``polygon`` must have >= 3 vertices.
    """
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    crossings: "F.Column | None" = None
    n = len(polygon)
    for i in range(n):
        ax, ay = polygon[i]
        bx, by = polygon[(i + 1) % n]
        cross = (F.lit(int(bx - ax)) * (y - F.lit(int(ay)))) - (
            (x - F.lit(int(ax))) * F.lit(int(by - ay))
        )
        up = (
            (F.lit(int(ay)) <= y) & (y < F.lit(int(by))) & (cross > 0)
        )
        down = (
            (F.lit(int(by)) <= y) & (y < F.lit(int(ay))) & (cross < 0)
        )
        c = (up | down).cast("int")
        crossings = c if crossings is None else crossings + c
    return df.withColumn(flag_col, (crossings % 2 == 1))


def dbscan(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Exact planar DBSCAN — density clustering on integer grid
    coordinates, the "find the dense regions and call the rest noise"
    companion to the centroid k-means in ``similarity`` (k-means
    forces every point into one of k spheres; DBSCAN discovers the
    cluster COUNT and shape from density and isolates outliers —
    the right screen for spatial event blobs or 2-D embedding maps).

    Classic semantics, made deterministic:

    - ``core``: |N_eps(p)| >= min_pts, the neighborhood INCLUDING p
      (the standard convention).
    - clusters: connected components of the core-core eps-graph;
      the cluster label is the MINIMUM core id in the component (so
      labels are stable across partitionings and runs).  A core with
      no core neighbor forms its own singleton cluster.
    - ``border``: non-core within eps of >= 1 core; classic DBSCAN
      assigns it to whichever core CLAIMED IT FIRST (scan-order
      dependent!) — here it joins the smallest cluster label among
      its core neighbors, which is the same set of clusters, chosen
      deterministically.
    - ``noise``: everything else; cluster is NULL.

    Scale shape: ONE grid-bucketed radius self-join (never Cartesian
    — cost scales with the number of nearby pairs, the output of the
    density computation itself), one neighbor-count aggregate, the
    distributed large-star/small-star components loop over CORE-CORE
    edges only (the dense-pair graph, already the smaller remnant),
    and one min-aggregate for borders.  All arithmetic int64.

    Output: ``(id, role, cluster)`` — role in {'core','border',
    'noise'}, cluster BIGINT (NULL for noise).

    Contract: ids must be unique and INTEGRAL (the components loop
    runs on the long lattice — dense-rank string ids first; enforced
    with a TypeError at plan build); a row with a NULL coordinate has
    no well-defined neighborhood and classifies as noise at any
    ``min_pts`` (never core, even at min_pts=1).
    """
    from pyspark.sql import types as T

    from .dedup import connected_components

    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    idt = points.schema[id_col].dataType
    if not isinstance(
        idt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # the components loop casts node ids to long (dedup.py
        # connected_components): a string id would silently NULL out
        # every core-core edge (non-ANSI) or throw mid-job (ANSI) —
        # fail loudly at plan build instead
        raise TypeError(
            f"dbscan: column {id_col!r} has type {idt.simpleString()}; "
            "expected integral ids (dense-rank string ids first)"
        )
    pts = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    pairs = radius_pairs(pts, eps, id_col="__id").localCheckpoint(
        eager=False
    )  # the eps-graph feeds counts, core edges, and border assignment
    nbrs = pairs.select(
        F.col("id1").alias("__a"), F.col("id2").alias("__b")
    ).unionAll(
        pairs.select(F.col("id2").alias("__a"), F.col("id1").alias("__b"))
    )
    counts = nbrs.groupBy("__a").agg(
        F.count(F.lit(1)).cast("long").alias("__nn")
    )
    flagged = pts.join(
        counts, pts["__id"] == counts["__a"], "left"
    ).select(
        "__id",
        (
            # a NULL coordinate has no well-defined neighborhood: it
            # can never be core (even at min_pts=1) — it joins no
            # eps-cell, so with no core neighbors either it lands in
            # the noise branch, as documented
            pts["x"].isNotNull()
            & pts["y"].isNotNull()
            & (
                F.coalesce(F.col("__nn"), F.lit(0)) + F.lit(1)
                >= F.lit(min_pts)
            )
        ).alias("__core"),
    )
    cores = flagged.filter("__core").select("__id")
    core_edges = (
        pairs.join(cores.withColumnRenamed("__id", "id1"), "id1")
        .join(cores.withColumnRenamed("__id", "id2"), "id2")
        .select("id1", "id2")
    )
    comp = connected_components(core_edges, "id1", "id2")
    core_rows = cores.join(
        comp, cores["__id"] == comp["node"], "left"
    ).select(
        F.col("__id").alias("id"),
        F.lit("core").alias("role"),
        F.coalesce(F.col("component"), F.col("__id"))
        .cast("long")
        .alias("cluster"),
    )
    core_clusters = core_rows.select(
        F.col("id").alias("__cid"), F.col("cluster").alias("__ccl")
    )
    non_core = flagged.filter(~F.col("__core")).select("__id")
    border_rows = (
        nbrs.join(non_core, nbrs["__a"] == non_core["__id"]) 
        .join(core_clusters, nbrs["__b"] == core_clusters["__cid"])
        .groupBy("__a")
        .agg(F.min("__ccl").cast("long").alias("cluster"))
        .select(
            F.col("__a").alias("id"),
            F.lit("border").alias("role"),
            "cluster",
        )
    )
    assigned = core_rows.select("id").unionAll(border_rows.select("id"))
    noise_rows = (
        pts.join(assigned, pts["__id"] == assigned["id"], "left_anti")
        .select(
            F.col("__id").alias("id"),
            F.lit("noise").alias("role"),
            F.lit(None).cast("long").alias("cluster"),
        )
    )
    return core_rows.unionAll(border_rows).unionAll(noise_rows)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    radius: int,
    id_cols: tuple[str, str] = ("query_id", "id"),
    x_col: str = "x",
    y_col: str = "y",
    expand_rounds: int = 0,
) -> DataFrame:
    """Bounded-radius k-nearest-neighbor join on the integer plane:
    for each query point, the ``k`` nearest corpus points WITHIN
    ``radius`` — the horizon-bounded kNN posture that scales (an
    unbounded exact 2D kNN degenerates to an all-pairs rank; with a
    radius the candidate set is the grid join's output, which is the
    size of the point density times the search area, and a pipeline
    picks the radius from the known density, exactly like
    :func:`dbscan`'s eps).  Queries with fewer than ``k`` neighbors
    inside the horizon emit fewer rows; queries with none are absent
    — the same explicit-horizon contract as
    :func:`closeness_from_landmarks`.

    ``expand_rounds`` is the standard escalation for pipelines that
    cannot pre-pick a radius (VERDICT r10 ask #5): after the base
    pass, queries still holding FEWER than ``k`` neighbors retry at
    double the radius, up to ``expand_rounds`` times (round ``i``
    searches ``radius·2^i``).  A retried query's result is replaced
    wholesale by its wider-horizon top-k (a superset of the
    candidates it had, re-ranked — so the semantics equal a single
    pass at the widest radius that query reached, and filled queries
    never change).  The search stays bounded: each round is one grid
    join over ONLY the unfilled queries at 4x the prior search area,
    and the round count caps total work — never an unbounded
    all-pairs fallback.  Lineage per round is cut with a lazy
    localCheckpoint (the graph-loop discipline).

    Built ON the grid radius join (ONE cell equi-join, never
    Cartesian), then a per-query ranking window over the bounded
    candidate set.  Ties break deterministically on
    ``(dist_sq, corpus id)`` so the emitted set is engine-exact;
    distances stay SQUARED on the int64 lattice (ranking never needs
    the sqrt).

    Output: ``(query_id, id, dist_sq, rk)`` with ``rk`` in 1..k.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if expand_rounds < 0:
        raise ValueError("expand_rounds must be >= 0")
    from pyspark.sql.window import Window

    id_q, id_c = id_cols
    w = Window.partitionBy(id_q).orderBy(F.col("dist_sq"), F.col(id_c))

    def _topk(qdf: DataFrame, r: int) -> DataFrame:
        pairs = radius_join(
            qdf, corpus, r, id_cols=id_cols, x_col=x_col, y_col=y_col
        )
        return (
            pairs.withColumn("rk", F.row_number().over(w).cast("int"))
            .filter(F.col("rk") <= k)
            .select(id_q, id_c, "dist_sq", "rk")
        )

    res = _topk(queries, radius)
    pending = queries
    r = radius
    for _ in range(expand_rounds):
        r *= 2
        filled = (
            res.groupBy(id_q)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") >= k)
            .select(id_q)
        )
        pending = pending.join(filled, id_q, "left_anti")
        res = (
            res.join(filled, id_q, "left_semi")
            .unionAll(_topk(pending, r))
            .localCheckpoint(eager=False)
        )
    return res
