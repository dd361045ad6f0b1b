"""Relational, grouped, aggregate, and window operators."""

from .aggregates import (
    agg,
    agg_state,
    cube,
    finalize_agg_state,
    grouping_sets,
    merge_agg_states,
    rollup,
    top_k_per_group,
)
from .groupby import sql_groupby_apply, whole_frame_apply_distributed
from .asof import asof_join
from .scd import merge_upsert, scd2_apply
from .rangejoin import tolerance_join
from .skew import adaptive_salted_join, salted_join
from .sort import limit, order_by, stable_row_ids, top_k
from .relational import (
    drop_duplicates,
    except_df,
    filter_df,
    intersect,
    join,
    parse_join_type,
    union,
)
from .window import window_spec, with_lag_lead, with_ranking, with_running

__all__ = [
    "agg",
    "asof_join",
    "scd2_apply",
    "merge_upsert",
    "adaptive_salted_join",
    "salted_join",
    "tolerance_join",
    "cube",
    "drop_duplicates",
    "except_df",
    "filter_df",
    "grouping_sets",
    "intersect",
    "join",
    "limit",
    "order_by",
    "stable_row_ids",
    "top_k",
    "parse_join_type",
    "rollup",
    "sql_groupby_apply",
    "whole_frame_apply_distributed",
    "top_k_per_group",
    "agg_state",
    "merge_agg_states",
    "finalize_agg_state",
    "union",
    "window_spec",
    "with_lag_lead",
    "with_ranking",
    "with_running",
]
