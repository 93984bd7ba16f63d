"""Data-quality probes (SURVEY.md §2.10; bubbles/ops/rows.py::
assert_unique/assert_contains/assert_missing,
bubbles/errors.py::ProbeAssertionError).

Each probe is a pass-through operator: it validates and returns the
input DataFrame unchanged, so probes drop into a pipeline between any
two steps.  Validation is a Spark action (one aggregate job) — probes
are the only operators in the engine that eagerly execute, exactly
like the reference, where a failed probe must stop the pipeline.
Each check is expressed to aggregate before collecting (no row
materialization on the driver beyond one count).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ProbeAssertionError(AssertionError):
    """Raised when a data-quality probe fails
    (bubbles/errors.py::ProbeAssertionError)."""


def assert_unique(df: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """Fail if ``key`` has duplicate values
    (bubbles/ops/rows.py::assert_unique)."""
    keys = [key] if isinstance(key, str) else list(key)
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ProbeAssertionError(f"key {keys} is not unique")
    return df


def assert_contains(df: DataFrame, field: str, value: Any) -> DataFrame:
    """Fail unless some row has ``field == value``
    (bubbles/ops/rows.py::assert_contains)."""
    if df.filter(F.col(field) == F.lit(value)).limit(1).isEmpty():
        raise ProbeAssertionError(f"no row with {field} == {value!r}")
    return df


def assert_missing(df: DataFrame, field: str, value: Any) -> DataFrame:
    """Fail if any row has ``field == value``
    (bubbles/ops/rows.py::assert_missing)."""
    if not df.filter(F.col(field) == F.lit(value)).limit(1).isEmpty():
        raise ProbeAssertionError(f"found forbidden {field} == {value!r}")
    return df
