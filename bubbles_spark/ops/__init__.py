"""Operator catalog: pure ``DataFrame -> DataFrame`` functions.

One implementation per operator (the reference ships one per
*representation* — rows/sql/mongo — and dispatches at runtime;
Catalyst is our single representation, so dispatch disappears.
SURVEY.md §2/§3.2).
"""

from bubbles_spark.ops.core import (
    added_keys,
    added_rows,
    aggregate,
    append,
    changed_rows,
    derive,
    distinct,
    duplicate_stats,
    duplicates,
    field_filter,
    filter_by_predicate,
    filter_by_range,
    filter_by_set,
    filter_by_value,
    filter_not_empty,
    fuzzy_join,
    join_details,
    range_join,
    rename_fields,
    sample,
    scd2_merge,
    sort,
    top_k,
)
from bubbles_spark.ops.reshape import histogram, unpivot, zscore_normalize
from bubbles_spark.ops.text import (
    empty_to_missing,
    split_date,
    string_strip,
    text_substitute,
    threshold,
    transliterate,
)
from bubbles_spark.ops.audit import basic_audit, infer_types
from bubbles_spark.ops import affinity, dedup, drift, events, graph, insights, privacy, sketch, spatial, textan, textprep, vector, multimodal

__all__ = [
    "added_keys",
    "added_rows",
    "affinity",
    "aggregate",
    "append",
    "basic_audit",
    "changed_rows",
    "dedup",
    "derive",
    "distinct",
    "duplicate_stats",
    "drift",
    "duplicates",
    "empty_to_missing",
    "events",
    "field_filter",
    "filter_by_predicate",
    "filter_by_range",
    "filter_by_set",
    "filter_by_value",
    "filter_not_empty",
    "histogram",
    "infer_types",
    "insights",
    "fuzzy_join",
    "graph",
    "join_details",
    "multimodal",
    "privacy",
    "range_join",
    "rename_fields",
    "sample",
    "scd2_merge",
    "sketch",
    "sort",
    "spatial",
    "unpivot",
    "zscore_normalize",
    "split_date",
    "string_strip",
    "text_substitute",
    "textan",
    "textprep",
    "threshold",
    "top_k",
    "transliterate",
    "vector",
]
