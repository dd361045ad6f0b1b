"""Tabular-ML preprocessing operators (exact, engine-portable).

The feature-engineering companions to the corpus operators in
``sampling``/``text``: leakage-safe target encoding, closed-form
linear trend fitting, and stable cross-validation folds — each a pure
DataFrame expression chain on the BIGINT lattice so the driver's
DuckDB oracle can value-hash the outputs (gates ml_target_encode,
profile_linreg, sample_kfold).

No counterpart in the reference (SURVEY.md §2.9 posture); these are
the operators a tabular training pipeline runs between the warehouse
and the trainer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "target_encode_loo",
    "ols_simple",
    "kfold_assign",
    "binary_metrics",
    "auc_exact",
    "pr_auc_exact",
    "calibration_bins",
    "ndcg_weights",
    "ndcg_exact",
    "cumulative_gains",
    "regression_metrics",
    "cohen_kappa",
    "confusion_multiclass",
    "mcc_binary",
    "brier_score",
    "recall_at_k",
    "recall_histogram",
    "expected_calibration_error",
    "group_kfold_assign",
    "auc_by_group",
    "roc_points",
    "fairness_panel",
    "mrr_exact",
    "bcubed",
]


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "loo_milli",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is encoded
    by the target mean of the OTHER rows in its category,
    ``(S_g − y_i) / (n_g − 1)`` on the milli grid — the leakage-safe
    form (a plain category mean leaks the row's own label into its
    feature).  ``target_col`` must already be integer-grid (cents).

    One per-category aggregate broadcast back onto the rows; rows in
    singleton categories are dropped (their LOO mean is undefined).
    Output: the input columns plus ``out_col`` (BIGINT).
    """
    g = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col(target_col).cast("long")).alias("__s"),
    )
    return (
        df.join(F.broadcast(g), cat_col)
        .filter(F.col("__n") > 1)
        .withColumn(
            out_col,
            F.expr(
                f"CAST((__s - {target_col}) * 1000 div (__n - 1) AS BIGINT)"
            ),
        )
        .drop("__n", "__s")
    )


def ols_simple(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Exact simple linear regression from ONE moment aggregate — the
    closed-form normal equations ``slope = (n·Sxy − Sx·Sy) /
    (n·Sxx − Sx²)`` floored onto the milli grid, intercept from the
    slope.  Both columns must be integer-grid.  Output: one row
    ``(n, sx, sy, slope_milli, intercept_milli)``.

    The grid-exact trend-fit primitive (same family as the moment PCA
    and grid-exact k-means): no MLlib, no iterations, one
    map-combined pass at any scale.

    Engine-portability caveat: the milli-flooring uses integral
    ``div``, which truncates TOWARD ZERO in Spark while DuckDB's
    ``//`` floors — identical for the non-negative fits this is used
    on (price-vs-quantity trends), off by one milli when a fit is
    NEGATIVE.  For possibly-negative slopes use the text_zipf gate's
    form: keep the moments small enough to be exact-in-double (milli
    input grid) and FLOOR the double ratio — floor is floor in every
    engine.
    """
    v = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return s.select(
        "n",
        "sx",
        "sy",
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)"
            " AS BIGINT)"
        ).alias("slope_milli"),
        F.expr(
            "CAST(FLOOR((sy - ((n * sxy - sx * sy) * 1000"
            " div (n * sxx - sx * sx)) * sx / 1e3) * 1000 / n)"
            " AS BIGINT)"
        ).alias("intercept_milli"),
    )


def kfold_assign(
    df: DataFrame,
    id_col: str,
    k: int = 5,
    salt: int = 0,
    fold_col: str = "fold",
) -> DataFrame:
    """Stable k-fold cross-validation assignment: the portable id-hash
    bucket reduced mod ``k`` (the hash_split contract extended to CV),
    so fold membership survives corpus growth, re-partitioning, and
    re-runs, and leave-fold-out training reads are plain filters.
    Pure narrow map — no shuffle, no RNG.
    """
    from .sampling import split_bucket

    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn(
        fold_col, (split_bucket(F.col(id_col), salt) % k).cast("int")
    )


def binary_metrics(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Binary-classification evaluation in ONE map-combined aggregate:
    confusion counts (tp/fp/fn/tn over non-null label∧pred rows) plus
    precision, recall, F1 and accuracy — the filter-quality report a
    pipeline runs when a model-based screen (quality classifier,
    toxicity filter) is validated against a rule-based or human
    label.  Undefined ratios (zero denominators) are NULL, not 0 — a
    filter that never fires has NO precision, and hiding that behind
    0.0 misreads as "measured terrible".  Scale: one scan, four
    conditional counts, no shuffle beyond the 1-row aggregate."""
    # Accept boolean OR integral 0/1 columns ONLY.  A float
    # score/probability column is REJECTED rather than silently
    # thresholded at != 0, and strings are rejected up front rather
    # than left to throw mid-job under ANSI (ADVICE r7) — threshold
    # scores explicitly before evaluating.
    from pyspark.sql import types as _T

    def _as_bool(name: str) -> Column:
        dt = df.schema[name].dataType
        if isinstance(dt, _T.BooleanType):
            return F.col(name)
        if isinstance(
            dt, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)
        ):
            # explicit comparison: `~col` on an integer column is
            # BITWISE negation (~1 == -2, truthy), so build a real
            # boolean (NULL-preserving) before the confusion counts
            return F.when(F.col(name).isNotNull(), F.col(name) != 0)
        raise TypeError(
            f"binary_metrics: column {name!r} has type "
            f"{dt.simpleString()}; expected boolean or integral 0/1 — "
            "threshold float scores / parse string labels first"
        )

    lbl = _as_bool(label_col)
    prd = _as_bool(pred_col)
    base = df.filter(lbl.isNotNull() & prd.isNotNull())
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")
    agg = base.agg(
        cnt(lbl & prd).alias("tp"),
        cnt(~lbl & prd).alias("fp"),
        cnt(lbl & ~prd).alias("fn"),
        cnt(~lbl & ~prd).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    precision = F.when(tp + fp > 0, tp.cast("double") / (tp + fp))
    recall = F.when(tp + fn > 0, tp.cast("double") / (tp + fn))
    f1 = F.when(
        (2 * tp + fp + fn) > 0, 2 * tp.cast("double") / (2 * tp + fp + fn)
    )
    acc = F.when(
        (tp + fp + fn + tn) > 0,
        (tp + tn).cast("double") / (tp + fp + fn + tn),
    )
    return agg.select(
        "tp", "fp", "fn", "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        acc.alias("accuracy"),
    )


def _check_grid_decimals(decimals: int) -> None:
    """Shared guard for the score-grid ``decimals`` parameter of the
    eval family (auc / pr_auc / gains).  Past ~9 digits the double
    product ``score · 10^decimals`` leaves float53's exact-integer
    range, so the snap silently stops being a grid (and the long cast
    overflows under ANSI for ordinary scores); negative values would
    silently merge whole integer ranges of scores into one grid point.
    Same advisory class as :func:`calibration_bins`'s r8 fix."""
    if not 0 <= decimals <= 9:
        raise ValueError("decimals must be in [0, 9]")


def auc_exact(
    df: DataFrame,
    score_col: str,
    is_positive: Column,
    decimals: int = 6,
) -> DataFrame:
    """EXACT distributed ROC-AUC — ``P(score_pos > score_neg) +
    ½·P(tie)``, the threshold-free companion to :func:`binary_metrics`
    — via the Mann-Whitney U identity ``AUC = U / (n_pos · n_neg)``
    on the same BIGINT rank lattice as
    :func:`...extended.profile.mann_whitney` (tie-averaged doubled
    rank sums, so every intermediate is integer-exact).

    No sort of the data and no sampling (the usual approximate-AUC
    escape hatch): scores snap to the ``decimals`` grid, ONE
    map-combined aggregate counts (pos, neg) per distinct score, the
    strictly-below counts come from the range-partitioned prefix scan
    (never a single-task value-domain window), and one closing
    aggregate folds the doubled rank sum.  The division happens once
    in DECIMAL(38,0) (``2·n_pos·n_neg`` overflows int64 once each
    side passes ~2 × 10⁹ rows) with positive operands, so floor
    division is engine-portable.

    NULL and NaN scores are EXCLUDED (unscored rows carry no ranking
    information; without the NaN filter, non-ANSI ``floor`` would
    silently snap NaN to grid point 0 — r8 advisory).  A NULL
    ``is_positive`` counts as NEGATIVE (``WHEN``/``OTHERWISE``
    semantics, matching the SQL oracle); pre-filter unlabeled rows if
    that is not the intent.

    Output: one row ``(n_pos, n_neg, u_x2, auc_micro)`` — AUC × 1e6,
    BIGINT (floored).
    """
    from ..operators.sort import ordered_prefix_scan

    _check_grid_decimals(decimals)
    p = float(10**decimals)
    sc = F.col(score_col)
    keep = sc.isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    g = df.filter(keep).select(
        F.floor(sc * p + F.lit(0.5)).cast("long").alias("__v"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    per_v = g.groupBy("__v").agg(
        F.sum("__pos").alias("c_p"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    ranked = ordered_prefix_scan(
        per_v, ["__v"], "t", out_col="c_below", strict=True
    ).select("c_p", "t", "c_below")
    stats = ranked.agg(
        F.sum("c_p").cast("long").alias("n_pos"),
        F.sum(F.col("t") - F.col("c_p")).cast("long").alias("n_neg"),
        F.sum(
            F.col("c_p")
            * (F.lit(2) * F.col("c_below") + F.col("t") + F.lit(1))
        )
        .cast("long")
        .alias("__r2"),
    )
    return stats.select(
        "n_pos",
        "n_neg",
        (F.col("__r2") - F.col("n_pos") * (F.col("n_pos") + F.lit(1)))
        .cast("long")
        .alias("u_x2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "CAST((CAST(__r2 - n_pos * (n_pos + 1) AS DECIMAL(38,0))"
                " * 500000) DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " AS BIGINT)"
            ),
        ).alias("auc_micro"),
    )


def pr_auc_exact(
    df: DataFrame,
    score_col: str,
    is_positive: Column,
    decimals: int = 6,
) -> DataFrame:
    """EXACT distributed average precision (PR-AUC) — the
    class-imbalance-honest companion to :func:`auc_exact` (ROC-AUC
    stays optimistic when negatives dominate; for a 1%-positive
    quality screen the PR curve is the one that moves).

    Standard step-wise average precision over DISTINCT score
    thresholds, descending::

        AP = Σ_i (TP_i − TP_{i−1})/n_pos · TP_i/(TP_i + FP_i)

    Ties need no per-row tiebreak: all rows sharing a grid score
    enter at one threshold together (the same convention
    ``sklearn.average_precision_score`` uses).  Scores snap to the
    ``decimals`` grid, ONE map-combined aggregate counts (pos, total)
    per distinct score, BOTH descending cumulatives come from one
    range-partitioned prefix scan (multi-column form — single scan,
    never a single-task window), and each threshold's term is floored
    onto a 1e9 lattice in DECIMAL(38,0) — engine-portable at any
    count (per-term truncation under-states AP by < #thresholds/1e9,
    and thresholds are bounded by the score grid).

    NULL/NaN scores are excluded; a NULL ``is_positive`` counts as
    negative (same contracts as :func:`auc_exact`).

    Output: one row ``(n_pos, n_neg, ap_nano)`` — AP × 1e9, BIGINT,
    NULL when there are no positives.
    """
    from ..operators.sort import ordered_prefix_scan

    _check_grid_decimals(decimals)
    p = float(10**decimals)
    sc = F.col(score_col)
    keep = sc.isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    g = df.filter(keep).select(
        F.floor(sc * p + F.lit(0.5)).cast("long").alias("__v"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    per_v = g.groupBy("__v").agg(
        F.sum("__pos").alias("c_p"),
        F.count(F.lit(1)).cast("long").alias("t"),
    ).withColumn("__nv", -F.col("__v"))
    scanned = ordered_prefix_scan(
        per_v, ["__nv"], ["c_p", "t"], out_col=["cum_p", "cum_t"]
    )
    tot = per_v.agg(
        F.sum("c_p").cast("long").alias("n_pos"),
        F.sum(F.col("t") - F.col("c_p")).cast("long").alias("n_neg"),
    )
    terms = scanned.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "CASE WHEN n_pos > 0 THEN"
            " CAST(c_p AS DECIMAL(38,0)) * cum_p * 1000000000"
            " div (CAST(cum_t AS DECIMAL(38,0)) * n_pos) END"
        ).alias("__term"),
    )
    # fold through `tot` (always exactly one row, like auc_exact's
    # stats row) so empty input yields ONE NULL row, not zero rows
    ap = terms.agg(F.sum("__term").cast("long").alias("__ap"))
    return tot.crossJoin(F.broadcast(ap)).select(
        "n_pos",
        "n_neg",
        F.when(F.col("n_pos") > 0, F.col("__ap")).alias("ap_nano"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    is_positive: Column,
    bins: int = 10,
    decimals: int = 4,
) -> DataFrame:
    """Calibration (reliability) table — the third leg of the eval
    triad beside :func:`binary_metrics` (thresholded) and
    :func:`auc_exact` (ranking): per probability bin, how often the
    positive class ACTUALLY occurs vs what the score promised.  A
    well-calibrated screen has ``obs_rate ≈ mean_pred`` per bin; a
    quality filter that is discriminative but badly calibrated will
    silently mis-size a corpus when its scores are used as keep
    probabilities.

    Exact and engine-portable: probabilities snap to the ``decimals``
    grid, ``bin = min(bins−1, floor(p·bins))`` (equal width, right
    edge closed), and both per-bin means are integer floor divisions
    of grid sums — no float accumulation.  ONE map-combined aggregate
    keyed by bin; shuffle volume = ``bins`` rows.

    NULL and NaN probabilities are EXCLUDED (same rationale as
    :func:`auc_exact`).

    Output: one row per non-empty bin ``(bin, n, n_pos,
    mean_pred_micro, obs_rate_micro)``.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not 1 <= decimals <= 6:
        # the output means are on the 1e-6 (micro) grid; a coarser
        # snap than 1e-6 is the point of `decimals`, a finer one would
        # silently zero the old 10**6//p multiplier (r8 advisory)
        raise ValueError("decimals must be in [1, 6]")
    p = 10**decimals
    pc = F.col(prob_col)
    keep = pc.isNotNull()
    if isinstance(df.schema[prob_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(pc)
    g = df.filter(keep).select(
        F.floor(pc * p + F.lit(0.5)).cast("long").alias("__q"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    binned = g.select(
        F.least(
            F.lit(bins - 1), F.expr(f"__q * {bins} div {p}")
        ).cast("int").alias("bin"),
        "__q",
        "__pos",
    )
    # both micro means divide in DECIMAL(38,0): exact for any allowed
    # `decimals` (no floored-multiplier digit loss) and overflow-free
    # at any per-bin row count
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.expr(
            "CAST(CAST(sum(__q) AS DECIMAL(38,0)) * 1000000"
            f" div (count(1) * {p}) AS BIGINT)"
        ).alias("mean_pred_micro"),
        F.expr(
            "CAST(CAST(sum(__pos) AS DECIMAL(38,0)) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("obs_rate_micro"),
    )


def ndcg_weights(k: int) -> list[int]:
    """The NDCG position discounts ``1/log2(i+1)`` for ranks 1..k,
    snapped onto the 1e9 lattice at PLAN BUILD time — the weights are
    inlined as integer literals into both the Spark plan and the SQL
    oracle, so no engine evaluates a transcendental at run time and
    the gate is bit-portable by construction (the same trick as the
    literal eigenvectors in embedding_pca)."""
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    return [int(10**9 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]


def ndcg_exact(
    df: DataFrame,
    query_col: str,
    item_col: str,
    rel_col: str,
    score_col: str,
    k: int = 10,
) -> DataFrame:
    """EXACT mean NDCG@k — the graded-relevance ranking metric beside
    the binary :func:`auc_exact`/:func:`pr_auc_exact` (a retrieval /
    recommender eval over many queries: "does the model rank the good
    items first, per query?").

    Per query: items rank by ``score`` descending (ties broken by
    ``item_col`` ascending — deterministic and restatable in SQL, so
    no per-partition tie ambiguity), DCG@k folds ``rel · w_rank`` on
    the 1e9 discount lattice (:func:`ndcg_weights` literals), the
    ideal ordering ranks by ``rel`` descending (same tiebreak), and
    ``ndcg_nano = DCG · 1e9 div IDCG`` divides once in DECIMAL(38,0).
    Queries whose IDCG is 0 (no relevant item) carry no ranking signal
    and are excluded from the mean, as are NULL/NaN-score rows; a NULL
    relevance counts as grade 0.

    Scale shape: both rank passes are windows PARTITIONED BY the query
    key over ONE exchange (two sort orders, no global window), the
    per-query fold is a map-combined aggregate, and the closing mean
    is one row.  ``rel_col`` must be non-negative integral (grades).

    Output: one row ``(n_queries, mean_ndcg_nano, min_ndcg_nano,
    n_perfect)`` — n_queries counts IDCG>0 queries, n_perfect those
    ranked ideally (ndcg_nano == 1e9).
    """
    from pyspark.sql import Window

    ws = ndcg_weights(k)
    rdt = df.schema[rel_col].dataType
    if not isinstance(
        rdt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # a float/double grade would silently TRUNCATE through the
        # long cast (0.9 → 0, erasing the relevance signal) — the
        # binary_metrics contract: snap to an integer grade grid first
        raise TypeError(
            f"ndcg_exact: column {rel_col!r} has type "
            f"{rdt.simpleString()}; expected integral grades — snap "
            "float relevance to an integer grid first"
        )
    sc = F.col(score_col)
    keep = sc.isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    base = df.filter(keep & F.col(query_col).isNotNull()).select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.coalesce(F.col(rel_col).cast("long"), F.lit(0)).alias("__rel"),
        sc.alias("__s"),
    )
    by_q = Window.partitionBy("__q")
    ranked = base.select(
        "__q",
        "__rel",
        F.row_number()
        .over(by_q.orderBy(F.col("__s").desc(), F.col("__i").asc()))
        .alias("__rn_s"),
        F.row_number()
        .over(by_q.orderBy(F.col("__rel").desc(), F.col("__i").asc()))
        .alias("__rn_r"),
    )
    warr = F.array(*[F.lit(w) for w in ws])
    per_q = ranked.groupBy("__q").agg(
        F.sum(
            F.when(
                F.col("__rn_s") <= k,
                F.col("__rel")
                * F.element_at(warr, F.col("__rn_s").cast("int")),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("__dcg"),
        F.sum(
            F.when(
                F.col("__rn_r") <= k,
                F.col("__rel")
                * F.element_at(warr, F.col("__rn_r").cast("int")),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("__idcg"),
    )
    scored = per_q.filter(F.col("__idcg") > 0).select(
        F.expr(
            "CAST(CAST(__dcg AS DECIMAL(38,0)) * 1000000000"
            " div __idcg AS BIGINT)"
        ).alias("__ndcg")
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.expr(
                "CAST(CAST(sum(__ndcg) AS DECIMAL(38,0))"
                " div count(1) AS BIGINT)"
            ),
        ).alias("mean_ndcg_nano"),
        F.min("__ndcg").alias("min_ndcg_nano"),
        F.sum(F.when(F.col("__ndcg") == 1_000_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_perfect"),
    )


def cumulative_gains(
    df: DataFrame,
    score_col: str,
    is_positive: Column,
    buckets: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """EXACT cumulative-gains / lift table — the "how deep must the
    screen cut to capture X% of the positives" view that ranking AUCs
    summarize away (a corpus filter is OPERATED at a depth; this is
    the depth table).

    Rows sort by score DESCENDING on the ``decimals`` grid.  Ties need
    no per-row tiebreak: rows sharing a grid score form one block, the
    block lands in the bucket where it ENDS (``bucket =
    ceil(cum_rows · buckets / n)``), and per bucket the LAST block's
    cumulatives are reported.  A bucket wholly spanned by one tie
    block emits no row (documented; its cumulatives are the next
    row's).  Capture and lift divide once per bucket in DECIMAL(38,0)
    on the 1e9 lattice.

    Scale shape: ONE map-combined aggregate per distinct grid score,
    one range-partitioned prefix scan (never a single-task window),
    one ≤ #buckets aggregate.  NULL/NaN scores are excluded; NULL
    ``is_positive`` counts as negative (same contracts as
    :func:`auc_exact`).

    Output: one row per non-empty bucket ``(bucket, cum_rows, cum_pos,
    capture_nano, lift_nano)`` — capture = cum_pos/n_pos, lift =
    capture / (cum_rows/n).
    """
    from ..operators.sort import ordered_prefix_scan

    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    _check_grid_decimals(decimals)
    p = float(10**decimals)
    sc = F.col(score_col)
    keep = sc.isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    g = df.filter(keep).select(
        F.floor(sc * p + F.lit(0.5)).cast("long").alias("__v"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    per_v = g.groupBy("__v").agg(
        F.sum("__pos").alias("c_p"),
        F.count(F.lit(1)).cast("long").alias("t"),
    ).withColumn("__nv", -F.col("__v"))
    scanned = ordered_prefix_scan(
        per_v, ["__nv"], ["c_p", "t"], out_col=["cum_p", "cum_t"]
    )
    tot = per_v.agg(
        F.sum("c_p").cast("long").alias("n_pos"),
        F.sum("t").cast("long").alias("n"),
    )
    b = scanned.crossJoin(F.broadcast(tot)).select(
        F.expr(f"CAST((cum_t * {buckets} + n - 1) div n AS INT)")
        .alias("bucket"),
        "cum_p",
        "cum_t",
        "n_pos",
        "n",
    )
    per_b = b.groupBy("bucket").agg(
        F.max("cum_t").cast("long").alias("cum_rows"),
        F.max("cum_p").cast("long").alias("cum_pos"),
        F.max("n_pos").alias("__np"),
        F.max("n").alias("__n"),
    )
    return per_b.select(
        "bucket",
        "cum_rows",
        "cum_pos",
        F.when(
            F.col("__np") > 0,
            F.expr(
                "CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000000"
                " div __np AS BIGINT)"
            ),
        ).alias("capture_nano"),
        F.when(
            (F.col("__np") > 0) & (F.col("cum_rows") > 0),
            F.expr(
                "CAST(CAST(cum_pos AS DECIMAL(38,0)) * __n * 1000000000"
                " div (CAST(__np AS DECIMAL(38,0)) * cum_rows) AS BIGINT)"
            ),
        ).alias("lift_nano"),
    )


def regression_metrics(
    df: DataFrame, y_col: str, yhat_col: str
) -> DataFrame:
    """Regression evaluation in ONE map-combined aggregate — exact
    MAE/MSE/R² for integer-grid targets and predictions (cents,
    milli-scores), completing the eval family's regression leg beside
    :func:`binary_metrics`.

    Everything is integer arithmetic: SAE and SSE fold in
    DECIMAL(38,0) (an e² up to 1e14 over 1e9 rows overflows int64),
    MAE reports ×1000 on the input grid, MSE floor-divides by n, and
    R² = 1 − SSE/SST uses the n-scaled sums-of-squares identity
    ``SST_n = n·Σy² − (Σy)²`` so no mean is ever materialized.  R² of
    a worse-than-mean fit is NEGATIVE: the division sign-splits
    (truncate the MAGNITUDE, then negate) because integral ``div``
    truncates toward zero in Spark while DuckDB's ``//`` floors — the
    split makes both engines compute the identical value (the
    ols_simple portability caveat, resolved rather than documented).

    Both columns must be integral (the binary_metrics contract: snap
    floats to a grid explicitly first).  NULL-in-either rows are
    excluded.  Output: one row ``(n, mae_milli, mse, r2_micro)`` —
    r2_micro NULL when SST is 0 (constant target) or n = 0.
    """
    for name in (y_col, yhat_col):
        dt = df.schema[name].dataType
        if not isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise TypeError(
                f"regression_metrics: column {name!r} has type "
                f"{dt.simpleString()}; expected integer-grid — snap "
                "floats to a grid first"
            )
    v = df.select(
        F.col(y_col).cast("long").alias("y"),
        F.col(yhat_col).cast("long").alias("p"),
    ).filter(F.col("y").isNotNull() & F.col("p").isNotNull())
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(abs(y - p) AS DECIMAL(38,0))")).alias("__sae"),
        F.sum(
            F.expr("CAST(y - p AS DECIMAL(38,0)) * CAST(y - p AS DECIMAL(38,0))")
        ).alias("__sse"),
        F.sum(F.col("y")).cast("long").alias("__sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("__syy"),
    )
    sst_n = (
        "(CAST(n AS DECIMAL(38,0)) * __syy"
        " - CAST(__sy AS DECIMAL(38,0)) * __sy)"
    )
    diff = f"({sst_n} - CAST(n AS DECIMAL(38,0)) * __sse)"
    return s.select(
        "n",
        F.when(
            F.col("n") > 0,
            F.expr("CAST(__sae * 1000 div n AS BIGINT)"),
        ).alias("mae_milli"),
        F.when(
            F.col("n") > 0, F.expr("CAST(__sse div n AS BIGINT)")
        ).alias("mse"),
        F.expr(
            f"CASE WHEN n > 0 AND {sst_n} > 0 THEN"
            f" CAST(CASE WHEN {diff} >= 0"
            f"  THEN {diff} * 1000000 div {sst_n}"
            f"  ELSE -((-{diff}) * 1000000 div {sst_n}) END AS BIGINT)"
            " END"
        ).alias("r2_micro"),
    )


def cohen_kappa(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between a predicted
    and a reference binary labeling, the honest form of "accuracy"
    when classes are imbalanced (a screen that always says KEEP scores
    94% accuracy on a 94%-keep corpus; its kappa is 0).

    Exact integer arithmetic on the confusion counts::

        kappa = (po − pe) / (1 − pe)
              = (n·(tp+tn) − E) / (n² − E),
        E = (tp+fp)·(tp+fn) + (fn+tn)·(fp+tn)

    — one map-combined aggregate (the :func:`binary_metrics` counting
    contract: boolean or integral 0/1 columns only, NULL-in-either
    rows excluded), then a single DECIMAL(38,0) division onto the
    micro lattice with an explicit sign split (kappa < 0 means
    worse-than-chance agreement; the split keeps Spark's
    truncate-toward-zero ``div`` and DuckDB's flooring ``//``
    identical).

    Output: one row ``(tp, fp, fn, tn, kappa_micro)`` — NULL kappa
    when the chance denominator ``n² − E`` is 0 (either rater is
    constant).
    """
    counts = binary_metrics(df, label_col, pred_col).select(
        "tp", "fp", "fn", "tn"
    )
    e = (
        "(CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)"
        " + CAST(fn + tn AS DECIMAL(38,0)) * (fp + tn))"
    )
    n = "CAST(tp + fp + fn + tn AS DECIMAL(38,0))"
    num = f"({n} * (tp + tn) - {e})"
    den = f"({n} * {n} - {e})"
    return counts.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            f"CASE WHEN {den} > 0 THEN"
            f" CAST(CASE WHEN {num} >= 0"
            f"  THEN {num} * 1000000 div {den}"
            f"  ELSE -((-{num}) * 1000000 div {den}) END AS BIGINT)"
            " END"
        ).alias("kappa_micro"),
    )


def confusion_multiclass(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Multiclass confusion summary — per-class precision / recall /
    F1, the k-way generalization of :func:`binary_metrics` (a corpus
    pipeline's language-ID, topic, or quality-tier classifiers are
    multiclass; collapsing them to one-vs-rest binaries hides exactly
    the cross-class confusions that matter).

    EXACT integer arithmetic end to end: ONE map-combined aggregate
    builds the (label, pred) contingency cells (shuffle = #cells ≤ k²
    rows), the margins and diagonal re-aggregate that tiny table, and
    each metric divides once in DECIMAL(38,0) onto the micro lattice
    (positive operands, so Spark ``div`` and DuckDB ``//`` agree)::

        precision = tp / n_pred,  recall = tp / n_true,
        f1        = 2·tp / (n_true + n_pred)          (the P/R-free
                    harmonic-mean identity — one division, no
                    intermediate rounding)

    The class set is the UNION of observed labels and predictions
    (a class the model never predicts still reports recall; a
    hallucinated class reports precision 0 with n_true = 0).
    NULL-in-either rows are excluded (the :func:`binary_metrics`
    contract — unlabeled rows carry no agreement information).

    Scale shape: everything after the first aggregate is k-sized;
    the margin joins are null-safe-free equi-joins on class labels.

    Output: one row per class ``(class, n_true, n_pred, tp,
    precision_micro, recall_micro, f1_micro)`` — metric NULL when its
    denominator is 0.
    """
    v = df.select(
        F.col(label_col).alias("__l"), F.col(pred_col).alias("__p")
    ).filter(F.col("__l").isNotNull() & F.col("__p").isNotNull())
    cells = v.groupBy("__l", "__p").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    tm = cells.groupBy(F.col("__l").alias("class")).agg(
        F.sum("__c").cast("long").alias("n_true")
    )
    pm = cells.groupBy(F.col("__p").alias("class")).agg(
        F.sum("__c").cast("long").alias("n_pred")
    )
    diag = cells.filter(F.col("__l") == F.col("__p")).select(
        F.col("__l").alias("class"), F.col("__c").alias("tp")
    )
    j = (
        tm.join(pm, "class", "full_outer")
        .join(diag, "class", "left")
        .select(
            "class",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    return j.select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        F.when(
            F.col("n_pred") > 0,
            F.expr(
                "CAST(CAST(tp AS DECIMAL(38,0)) * 1000000"
                " div n_pred AS BIGINT)"
            ),
        ).alias("precision_micro"),
        F.when(
            F.col("n_true") > 0,
            F.expr(
                "CAST(CAST(tp AS DECIMAL(38,0)) * 1000000"
                " div n_true AS BIGINT)"
            ),
        ).alias("recall_micro"),
        F.when(
            F.col("n_true") + F.col("n_pred") > 0,
            F.expr(
                "CAST(CAST(tp AS DECIMAL(38,0)) * 2000000"
                " div (n_true + n_pred) AS BIGINT)"
            ),
        ).alias("f1_micro"),
    )


def mcc_binary(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """Matthews correlation coefficient for a binary screen — the
    single-number confusion summary that, unlike accuracy or F1, is
    symmetric in classes and honest under imbalance (a filter that
    passes everything scores 0, not its base rate).  Same input
    contract as :func:`binary_metrics`: boolean or integral 0/1
    columns only (float scores must be thresholded explicitly,
    strings rejected up front), NULL in either column excludes the
    row.

    The confusion counts and the numerator ``tp·tn − fp·fn`` stay on
    the exact BIGINT lattice (exact while each count < ~3 × 10⁹ —
    every corpus here and any realistic per-shard eval).  Only the
    closing denominator leaves it: ``sqrt`` of the four marginal
    products evaluated in DOUBLE with a fixed left-to-right
    association, so the oracle restating the identical expression
    gets the identical IEEE result, and the ×1e6 snap happens after.
    ``mcc_micro`` is NULL when any marginal is zero (MCC undefined —
    a degenerate screen has no correlation to report, and 0 would
    misread as "measured uncorrelated").  Scale: one scan, four
    conditional counts, no shuffle beyond the 1-row aggregate."""
    from pyspark.sql import types as _T

    def _as_bool(name: str) -> Column:
        dt = df.schema[name].dataType
        if isinstance(dt, _T.BooleanType):
            return F.col(name)
        if isinstance(
            dt, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)
        ):
            return F.when(F.col(name).isNotNull(), F.col(name) != 0)
        raise TypeError(
            f"mcc_binary: column {name!r} has type {dt.simpleString()};"
            " expected boolean or integral 0/1"
        )

    lbl, prd = _as_bool(label_col), _as_bool(pred_col)
    base = df.filter(lbl.isNotNull() & prd.isNotNull())
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")
    agg = base.agg(
        cnt(lbl & prd).alias("tp"),
        cnt(~lbl & prd).alias("fp"),
        cnt(lbl & ~prd).alias("fn"),
        cnt(~lbl & ~prd).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    num = (tp * tn - fp * fn).cast("long")
    den = F.sqrt(
        (tp + fp).cast("double")
        * (tp + fn).cast("double")
        * (tn + fp).cast("double")
        * (tn + fn).cast("double")
    )
    return agg.select(
        "tp", "fp", "fn", "tn",
        num.alias("mcc_num"),
        F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tn + fp > 0) & (tn + fn > 0),
            F.floor(
                F.lit(1000000.0) * num.cast("double") / den + F.lit(0.5)
            ).cast("long"),
        ).alias("mcc_micro"),
    )


def brier_score(
    df: DataFrame,
    score_col: str,
    is_positive: Column,
    decimals: int = 4,
) -> DataFrame:
    """EXACT Brier score — mean squared error of a probability score
    against the binary outcome, the calibration-sensitive companion
    to :func:`auc_exact` (AUC only ranks; Brier also punishes
    systematic over/under-confidence, which is what
    :func:`calibration_bins` shows per-bin and this folds to one
    number).

    Everything stays on the integer lattice: scores snap to the
    ``decimals`` grid (same [0, 9] guard as the rest of the eval
    family), the squared error per row is ``(v − g·o)²`` with
    ``g = 10^decimals`` — an exact BIGINT ≤ g² per row — and ONE
    map-combined aggregate folds count and error sum.  The single
    division happens in DECIMAL(38,0) (the error sum × 1e6 can pass
    int64 once n·g² approaches 9 × 10¹²-scale products), positive
    operands, so floor division is engine-portable.

    NULL and NaN scores are EXCLUDED (unscored rows have no
    calibration information); a NULL ``is_positive`` counts as
    NEGATIVE (WHEN/OTHERWISE, matching the SQL oracle) — pre-filter
    unlabeled rows if that is not the intent.

    Output: one row ``(n, n_pos, sse_grid, brier_micro)`` —
    ``sse_grid`` the exact grid-unit error sum, ``brier_micro`` the
    Brier score × 1e6, floored BIGINT in [0, 1e6]."""
    _check_grid_decimals(decimals)
    p = float(10**decimals)
    g2 = 10 ** (2 * decimals)
    sc = F.col(score_col)
    keep = sc.isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    staged = df.filter(keep).select(
        F.floor(sc * p + F.lit(0.5)).cast("long").alias("__v"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    err = F.col("__v") - F.lit(int(p)) * F.col("__pos")
    agg = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum(err * err).cast("long").alias("sse_grid"),
    )
    return agg.select(
        "n", "n_pos", "sse_grid",
        F.when(
            F.col("n") > 0,
            F.expr(
                f"CAST((CAST(sse_grid AS DECIMAL(38,0)) * 1000000)"
                f" DIV (CAST(n AS DECIMAL(38,0)) * {g2}) AS BIGINT)"
            ),
        ).alias("brier_micro"),
    )


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "id",
) -> DataFrame:
    """Per-query recall@k of an ANN result set against exact ground
    truth — the standard retrieval-quality metric for the ANN family
    (:func:`~pandasy_spark.extended.similarity.lsh_cosine_topk`,
    ``ivf_topk``, ``pq_topk``, ``beam_topk``), completing the eval
    triad the way :func:`mcc_binary`/:func:`brier_score` did for
    classifiers.  Both inputs are (query_id, id) neighbor sets —
    ``exact`` from a brute-force pass
    (:func:`~pandasy_spark.extended.similarity.cosine_topk`),
    ``approx`` from any index.

    The query universe is defined by ``exact`` (ground truth): a query
    the index returned nothing for scores 0, and ids the index
    returned beyond the truth set are ignored (precision is a
    different metric).  Everything lands on the integer lattice:
    ``hits`` = |exact ∩ approx| per query (BIGINT) and ``recall_bp``
    = (hits·10000) div k — exact basis points, engine-portable
    (DuckDB ``//``; positive operands so floor == truncate).

    Scale shape: one equi-join on the (query_id, id) pair key + two
    aggregates on query_id — linear in k·|Q|, no window, no Python.
    At 100 TB the expensive side is producing ``exact``, which is why
    recall is evaluated on a SAMPLED query set against the full
    corpus; this operator's cost is independent of corpus size.

    Output: (query_id, hits, recall_bp), one row per ground-truth
    query."""
    if k <= 0:
        raise ValueError(f"recall_at_k: k must be positive, got {k}")
    # both sides dedupe on the pair key: a candidate list that names
    # the same (query, id) twice (multi-table LSH before its own
    # dropDuplicates, unioned shards) must count ONE hit, or recall
    # inflates past 10000 bp
    ex = exact.select(
        F.col(query_id_col).alias("query_id"), F.col(id_col).alias("id")
    ).dropDuplicates(["query_id", "id"])
    ap = approx.select(
        F.col(query_id_col).alias("query_id"), F.col(id_col).alias("id")
    ).dropDuplicates(["query_id", "id"])
    hits = (
        ex.join(ap, ["query_id", "id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        ex.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0).cast("long")).alias("hits"),
        )
        .select(
            "query_id",
            "hits",
            F.expr(f"(hits * 10000) div {int(k)}").alias("recall_bp"),
        )
    )


def recall_histogram(per_query: DataFrame, k: int) -> DataFrame:
    """Fold :func:`recall_at_k` per-query rows into the recall
    DISTRIBUTION: one row per hit count 0..k with the number of
    queries landing there (absent counts emitted as 0 so the
    histogram has a fixed k+1-row shape regardless of data).  A
    single aggregate on an at-most-(k+1)-key column + a broadcast
    join against the literal 0..k grid — bounded by construction, so
    plain ops, no prefix scan (SCALING.md rule)."""
    if k <= 0:
        raise ValueError(f"recall_histogram: k must be positive, got {k}")
    spark = per_query.sparkSession
    grid = spark.range(0, k + 1).select(F.col("id").cast("long").alias("hits"))
    counts = per_query.groupBy("hits").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    return (
        grid.join(counts, "hits", "left")
        .select(
            "hits",
            F.coalesce(F.col("n_queries"), F.lit(0).cast("long")).alias(
                "n_queries"
            ),
            F.expr(f"(hits * 10000) div {int(k)}").alias("recall_bp"),
        )
    )


def expected_calibration_error(
    df: DataFrame,
    prob_col: str,
    is_positive: Column,
    bins: int = 10,
    decimals: int = 4,
) -> DataFrame:
    """EXACT expected calibration error — :func:`calibration_bins`
    folded to the one number dashboards track: ECE =
    Σ_b (n_b/N)·|acc_b − conf_b|, plus MCE = max_b |acc_b − conf_b|
    (the worst bin, the number that catches a screen that is
    well-calibrated on average but badly wrong in one score band).

    The whole computation stays on the integer lattice: with scores
    snapped to the ``decimals`` grid (``p = 10^decimals``), the
    per-bin gap |acc_b − conf_b| has the exact BIGINT numerator
    ``|p·n_pos_b − Σq_b|``, the N-weighting cancels the per-bin n, so
    ECE_micro = (10⁶ · Σ_b |p·n_pos_b − Σq_b|) div (N·p) — ONE
    integer division at the very end, in DECIMAL(38,0) so no product
    can silently wrap; MCE divides per bin on the same lattice then
    takes the max.  Same binning contract as :func:`calibration_bins`
    (equal width, right edge closed, NULL/NaN scores excluded, NULL
    labels negative).

    Scale shape: one map-combined aggregate keyed by bin (shuffle
    volume = ``bins`` rows), one ≤``bins``-row fold — unchanged at
    any corpus size.

    Output: one row ``(n, n_bins_nonempty, ece_micro, mce_micro)``."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not 1 <= decimals <= 6:
        raise ValueError("decimals must be in [1, 6]")
    p = 10**decimals
    pc = F.col(prob_col)
    keep = pc.isNotNull()
    if isinstance(df.schema[prob_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(pc)
    g = df.filter(keep).select(
        F.floor(pc * p + F.lit(0.5)).cast("long").alias("__q"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    per_bin = (
        g.select(
            F.least(
                F.lit(bins - 1), F.expr(f"__q * {bins} div {p}")
            ).cast("int").alias("bin"),
            "__q",
            "__pos",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__pos").cast("long").alias("__np"),
            F.sum("__q").cast("long").alias("__sq"),
        )
        .select(
            "__n",
            F.abs(F.lit(int(p)) * F.col("__np") - F.col("__sq")).alias(
                "__gap"
            ),
        )
    )
    return per_bin.agg(
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_nonempty"),
        F.expr(
            "CAST(CAST(sum(__gap) AS DECIMAL(38,0)) * 1000000"
            f" div (CAST(sum(__n) AS DECIMAL(38,0)) * {p}) AS BIGINT)"
        ).alias("ece_micro"),
        F.max(
            F.expr(
                "CAST(CAST(__gap AS DECIMAL(38,0)) * 1000000"
                f" div (CAST(__n AS DECIMAL(38,0)) * {p}) AS BIGINT)"
            )
        ).alias("mce_micro"),
    )


def group_kfold_assign(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    salt: int = 0,
    fold_col: str = "fold",
) -> DataFrame:
    """GROUPED k-fold assignment: every row of a group (user, domain,
    document cluster) lands in the SAME fold, because the fold is a
    pure function of the group key — the leakage-safe CV split when
    rows within a group are correlated (a per-row split leaks a
    user\'s other events into training and inflates validation
    scores; grouped CV is the standard fix).  Same portable id-hash
    bucket as :func:`kfold_assign` (stable under corpus growth,
    re-partitioning, and re-runs), applied to the group key.  Pure
    narrow map — no shuffle; leave-fold-out reads are plain filters.
    Rows with a NULL group key get fold NULL (no well-defined group —
    filter or impute explicitly rather than silently pooling them)."""
    from .sampling import split_bucket

    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn(
        fold_col,
        F.when(
            F.col(group_col).isNotNull(),
            (split_bucket(F.col(group_col), salt) % k).cast("int"),
        ),
    )


def auc_by_group(
    df: DataFrame,
    score_col: str,
    is_positive: Column,
    group_cols: Sequence[str],
    decimals: int = 4,
) -> DataFrame:
    """Per-SLICE exact ROC-AUC — :func:`auc_exact` evaluated
    independently inside each group (source, language, time cohort):
    the eval-by-slice discipline that catches a screen performing
    well on average while failing one segment (the fairness/robustness
    audit a corpus-quality classifier gets before it gates a 100 TB
    ingest).

    Same Mann-Whitney tie-averaged doubled-rank-sum lattice as the
    global form, with one structural difference: ``decimals`` is
    capped at 4 so the per-group distinct-score domain is bounded BY
    CONSTRUCTION (≤ 10⁴+1 rows per group) and the cumulative
    below-count stays a plain per-group window — the SCALING.md rule;
    the global form needs the range-partitioned prefix scan precisely
    because its ungrouped value domain is unbounded.  One
    (group, score)-keyed map-combined aggregate, one bounded window,
    one group fold.

    NULL/NaN scores excluded; NULL ``is_positive`` counts negative
    (the eval-family convention).  A group with no positives or no
    negatives has no ranking information: ``auc_micro`` is NULL.

    Output: one row per group ``(group..., n_pos, n_neg, u_x2,
    auc_micro)``."""
    from pyspark.sql.window import Window

    if not 1 <= decimals <= 4:
        raise ValueError(
            "decimals must be in [1, 4] (the bounded-window contract; "
            "use auc_exact for finer grids)"
        )
    g = list(group_cols)
    if not g:
        raise ValueError("group_cols must be non-empty — use auc_exact")
    p = 10**decimals
    sc = F.col(score_col)
    keep = sc.isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    staged = df.filter(keep).select(
        *g,
        F.floor(sc * p + F.lit(0.5)).cast("long").alias("__v"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    per_v = staged.groupBy(*g, "__v").agg(
        F.sum("__pos").cast("long").alias("__cp"),
        F.count(F.lit(1)).cast("long").alias("__t"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_v.select(
        *g,
        "__cp",
        "__t",
        (F.sum("__t").over(w) - F.col("__t")).alias("__below"),
    )
    st = ranked.groupBy(*g).agg(
        F.sum("__cp").cast("long").alias("n_pos"),
        F.sum(F.col("__t") - F.col("__cp")).cast("long").alias("n_neg"),
        F.sum(
            F.col("__cp") * (2 * F.col("__below") + F.col("__t") + 1)
        )
        .cast("long")
        .alias("__r2"),
    )
    u2 = F.col("__r2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return st.select(
        *g,
        "n_pos",
        "n_neg",
        u2.cast("long").alias("u_x2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "CAST(CAST(__r2 - n_pos * (n_pos + 1) AS DECIMAL(38,0))"
                " * 500000 div (CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " AS BIGINT)"
            ),
        ).alias("auc_micro"),
    )


def _bp_floor(num: Column, den: Column) -> Column:
    """``floor(num * 10000 / den)`` on int64 via subtract-mod —
    the engine-portable basis-point close shared by the eval family
    (roc_points, fairness_panel); NULL when ``den`` is not positive.
    Magnitude contract: ``num * 10^4 < 2^63``."""
    return F.when(
        den > 0,
        ((num * 10000 - (num * 10000) % den) / den).cast("long"),
    )


def roc_points(
    df: DataFrame,
    score_col: str,
    is_positive: Column,
    decimals: int = 4,
) -> DataFrame:
    """Full ROC/PR operating-point sweep — one row per DISTINCT
    observed score threshold with the exact confusion counts and
    basis-point rates at "predict positive iff score >= threshold".
    The curve companion to the scalar summaries (:func:`auc_exact`
    integrates it, :func:`binary_metrics` picks one point); a
    threshold-selection step reads THIS to pick the operating point
    that meets a precision or FPR budget.

    Scale shape: identical to :func:`auc_exact` — scores snap to the
    ``decimals`` grid, ONE map-combined aggregate counts (pos, tot)
    per distinct score, and the strictly-below cumulative pair comes
    from ONE range-partitioned prefix scan over both counters (never
    a single-task value-domain window); the global (n_pos, n_tot)
    close is a broadcast 1-row join.  Row volume never reaches the
    curve: the output is bounded by the grid (<= 10^decimals + 1
    points).

    Exactness: counts are BIGINT; rates close as
    ``floor(x * 10000 / d)`` in int64 (magnitude contract:
    ``n * 10^4 < 2^63``, far past any corpus).  ``tp + fp >= 1``
    always (thresholds are observed scores), so precision needs no
    guard; TPR/FPR are NULL iff the class is empty.  NULL/NaN scores
    are excluded; NULL ``is_positive`` counts negative (the
    :func:`auc_exact` contract).

    Output: ``(thr, tp, fp, fn, tn, tpr_bp, fpr_bp, prec_bp)`` with
    ``thr`` in grid units (score x 10^decimals, BIGINT), one row per
    distinct observed score, descending-threshold curve order
    implied by ``thr``.
    """
    from ..operators.sort import ordered_prefix_scan

    _check_grid_decimals(decimals)
    p = float(10**decimals)
    sc = F.col(score_col)
    keep = sc.isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    g = df.filter(keep).select(
        F.floor(sc * p + F.lit(0.5)).cast("long").alias("__v"),
        F.when(is_positive, 1).otherwise(0).cast("long").alias("__pos"),
    )
    per_v = g.groupBy("__v").agg(
        F.sum("__pos").cast("long").alias("c_p"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    scanned = ordered_prefix_scan(
        per_v,
        ["__v"],
        ["c_p", "t"],
        out_col=["p_below", "t_below"],
        strict=True,
    )
    totals = per_v.agg(
        F.sum("c_p").cast("long").alias("__np"),
        F.sum("t").cast("long").alias("__nt"),
    )
    counted = scanned.join(F.broadcast(totals)).select(
        F.col("__v").alias("thr"),
        (F.col("__np") - F.col("p_below")).cast("long").alias("tp"),
        (
            F.col("__nt") - F.col("__np")
            - (F.col("t_below") - F.col("p_below"))
        ).cast("long").alias("fp"),
        F.col("p_below").cast("long").alias("fn"),
        (F.col("t_below") - F.col("p_below")).cast("long").alias("tn"),
    )

    return counted.select(
        "thr", "tp", "fp", "fn", "tn",
        _bp_floor(F.col("tp"), F.col("tp") + F.col("fn"))
        .alias("tpr_bp"),
        _bp_floor(F.col("fp"), F.col("fp") + F.col("tn"))
        .alias("fpr_bp"),
        _bp_floor(F.col("tp"), F.col("tp") + F.col("fp"))
        .alias("prec_bp"),
    )


def fairness_panel(
    df: DataFrame,
    group_col: str,
    label: Column,
    pred: Column,
) -> DataFrame:
    """Group-fairness audit panel: per-group selection rate, TPR and
    FPR, plus the demographic-parity and equalized-odds gaps against
    the best-treated group — the pre-deployment screen that catches a
    classifier systematically under-selecting or under-recalling one
    slice (the complement to :func:`auc_by_group`, which slices the
    threshold-FREE ranking quality; this slices the DEPLOYED
    threshold's decisions).

    Scale shape: ONE scan with map-combined conditional counts per
    group (the confusion-quadrant trick of :func:`mcc_binary`,
    grouped); the cross-group maxima close via a broadcast 1-row
    aggregate join — never a window over the group rows, so group
    cardinality only bounds the OUTPUT, not any task.

    Exactness: counts BIGINT; rates close as ``floor(x*10000/d)``
    int64 subtract-mod division (engine-portable floor with
    nonnegative operands).  A NULL label or pred drops the row (an
    unlabeled or unscored example carries no decision evidence).
    Gap columns are NULL for groups where the underlying rate is
    NULL (empty class), and the maxima ignore NULL rates.

    Output: one row per group —
    ``(group, n, n_pos, sel_bp, tpr_bp, fpr_bp, dp_gap_bp,
    eo_gap_bp)`` where ``dp_gap_bp = max(sel_bp) - sel_bp`` and
    ``eo_gap_bp = max(tpr_bp) - tpr_bp``.
    """
    lab = label.cast("boolean")
    prd = pred.cast("boolean")
    base = df.filter(lab.isNotNull() & prd.isNotNull()).select(
        F.col(group_col).alias("grp"),
        lab.alias("__y"),
        prd.alias("__p"),
    )
    per = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__y"), 1).otherwise(0))
        .cast("long").alias("n_pos"),
        F.sum(F.when(F.col("__y") & F.col("__p"), 1).otherwise(0))
        .cast("long").alias("__tp"),
        F.sum(F.when(~F.col("__y") & F.col("__p"), 1).otherwise(0))
        .cast("long").alias("__fp"),
        F.sum(F.when(F.col("__p"), 1).otherwise(0))
        .cast("long").alias("__sel"),
    )

    rated = per.select(
        "grp", "n", "n_pos",
        _bp_floor(F.col("__sel"), F.col("n")).alias("sel_bp"),
        _bp_floor(F.col("__tp"), F.col("n_pos")).alias("tpr_bp"),
        _bp_floor(F.col("__fp"), F.col("n") - F.col("n_pos"))
        .alias("fpr_bp"),
    )
    tops = rated.agg(
        F.max("sel_bp").alias("__max_sel"),
        F.max("tpr_bp").alias("__max_tpr"),
    )
    return rated.join(F.broadcast(tops)).select(
        F.col("grp").alias(group_col),
        "n", "n_pos", "sel_bp", "tpr_bp", "fpr_bp",
        (F.col("__max_sel") - F.col("sel_bp"))
        .cast("long").alias("dp_gap_bp"),
        (F.col("__max_tpr") - F.col("tpr_bp"))
        .cast("long").alias("eo_gap_bp"),
    )


def mrr_exact(
    df: DataFrame,
    query_col: str,
    item_col: str,
    is_relevant: Column,
    score_col: str,
) -> DataFrame:
    """EXACT Mean Reciprocal Rank — the first-hit ranking metric
    (navigational search, retrieval-augmented lookup: "how deep does
    the user scroll before the right answer"), completing the ranking
    eval triad beside :func:`ndcg_exact` (graded, position-weighted)
    and :func:`recall_at_k` (set overlap at depth k).

    Per query, items rank by ``score_col`` DESC with the item id as
    the deterministic tiebreak (the :func:`ndcg_exact` convention);
    the reciprocal rank of the FIRST relevant item lands on the 1e9
    lattice as ``floor(1e9 / rank)``; a query with no relevant item
    contributes 0 (the standard MRR convention, stated in the
    oracle).  The mean closes as one int64 floor division.

    Scale shape: ONE window pass partitioned by query (per-query
    frames bounded by that query's candidate count), one per-query
    MIN aggregate, one 1-row close — no global sort, no driver-side
    loop.  NULL/NaN scores and NULL query/item ids are excluded.

    Output: one row ``(n_queries, n_hit, mean_rr_nano)`` — MRR x 1e9
    floored, with no-hit queries counted in the denominator.
    """
    from pyspark.sql.window import Window

    sc = F.col(score_col)
    keep = (
        sc.isNotNull()
        & F.col(query_col).isNotNull()
        & F.col(item_col).isNotNull()
    )
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        keep = keep & ~F.isnan(sc)
    base = df.filter(keep).select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__it"),
        F.when(is_relevant, 1).otherwise(0).cast("long").alias("__rel"),
        sc.alias("__s"),
    )
    w = Window.partitionBy("__q").orderBy(
        F.col("__s").desc(), F.col("__it").asc()
    )
    ranked = base.select(
        "__q", "__rel", F.row_number().over(w).cast("long").alias("__rn")
    )
    per_q = ranked.groupBy("__q").agg(
        F.min(F.when(F.col("__rel") > 0, F.col("__rn"))).alias("__first")
    )
    rr = per_q.select(
        F.coalesce(
            (
                F.lit(1_000_000_000)
                - F.lit(1_000_000_000) % F.col("__first")
            )
            / F.col("__first"),
            F.lit(0),
        )
        .cast("long")
        .alias("__rr")
    )
    return rr.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(F.col("__rr") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_hit"),
        F.expr(
            "CAST(CASE WHEN COUNT(1) > 0 THEN"
            " (SUM(__rr) - SUM(__rr) % COUNT(1)) / COUNT(1)"
            " END AS BIGINT)"
        ).alias("mean_rr_nano"),
    )


def bcubed(
    df: DataFrame, gold_col: str, pred_col: str
) -> DataFrame:
    """B-cubed extrinsic clustering evaluation (Bagga & Baldwin
    1998; the Amigo et al. 2009 survey's recommended metric) — the
    standard scorecard for a DEDUP clustering against gold duplicate
    groups: per item, precision is the fraction of its PREDICTED
    cluster sharing its gold label, recall the fraction of its GOLD
    cluster sharing its predicted label; the corpus scores are the
    item means.  Unlike pair-counting (Rand), B-cubed weights every
    ITEM equally, so exploding one mega-cluster is punished
    proportionally to its size — the failure mode that matters when
    an LSH threshold is too loose.

    Scale shape: three map-combined size aggregates — per (pred),
    per (gold), per (pred, gold) — joined back onto items by their
    (bounded-cardinality) cluster keys, then one 1-row mean; no
    window, no pair materialization (pair-counting metrics are
    quadratic in cluster size, B-cubed is linear — that IS the
    100 TB argument for it).

    Exactness: per-item ratios floor onto the bp lattice
    (``n_both·10^4 div n_side``), the means floor once more —
    deterministic and engine-portable (documented as the
    double-floor lattice convention; NULL gold or pred drops the
    item).

    Output: one row
    ``(n_items, bcubed_p_bp, bcubed_r_bp, bcubed_f_bp)`` with F the
    harmonic mean of the two floored means, itself floored.
    """
    base = df.filter(
        F.col(gold_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        F.col(gold_col).alias("__g"), F.col(pred_col).alias("__p")
    )
    both = base.groupBy("__g", "__p").agg(
        F.count(F.lit(1)).cast("long").alias("__nb")
    )
    per_p = base.groupBy("__p").agg(
        F.count(F.lit(1)).cast("long").alias("__np")
    )
    per_g = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("__ng")
    )
    items = (
        base.join(both, ["__g", "__p"])
        .join(per_p, "__p")
        .join(per_g, "__g")
    )

    def bp(num, den):
        n4 = num * 10000
        return ((n4 - n4 % den) / den).cast("long")

    scored = items.select(
        bp(F.col("__nb"), F.col("__np")).alias("__pi"),
        bp(F.col("__nb"), F.col("__ng")).alias("__ri"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("__pi").cast("long").alias("__sp"),
        F.sum("__ri").cast("long").alias("__sr"),
    )
    p_mean = (
        (F.col("__sp") - F.col("__sp") % F.col("n_items"))
        / F.col("n_items")
    ).cast("long")
    r_mean = (
        (F.col("__sr") - F.col("__sr") % F.col("n_items"))
        / F.col("n_items")
    ).cast("long")
    num_f = F.lit(2) * p_mean * r_mean
    den_f = p_mean + r_mean
    return agg.select(
        "n_items",
        p_mean.alias("bcubed_p_bp"),
        r_mean.alias("bcubed_r_bp"),
        F.when(
            den_f > 0,
            ((num_f - num_f % den_f) / den_f).cast("long"),
        ).alias("bcubed_f_bp"),
    )
