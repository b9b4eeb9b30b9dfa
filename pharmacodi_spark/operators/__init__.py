"""Operator library — each op is a pure ``DataFrame -> DataFrame`` transform
implementing one row of SURVEY.md §2's inventory, Spark-first."""

from pharmacodi_spark.operators.keys import surrogate_key, remap_fk, rename_and_key
from pharmacodi_spark.operators.dedup import distinct_rows, first_per_group, distinct_dim
from pharmacodi_spark.operators.joins import broadcast_left_join, update_join, lookup_map
from pharmacodi_spark.operators.reshape import melt_wide, explode_list, flatten_struct, group_concat_pivot
from pharmacodi_spark.operators.sets import union_all, union_distinct

__all__ = [
    "surrogate_key",
    "remap_fk",
    "rename_and_key",
    "distinct_rows",
    "first_per_group",
    "distinct_dim",
    "broadcast_left_join",
    "update_join",
    "lookup_map",
    "melt_wide",
    "explode_list",
    "flatten_struct",
    "group_concat_pivot",
    "union_all",
    "union_distinct",
]
