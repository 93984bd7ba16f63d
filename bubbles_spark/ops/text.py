"""Scalar string/date transforms (SURVEY.md §2.9).

All per-row map operators in the reference (no expression engine);
here each compiles to built-in Column expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _string_fields(df: DataFrame) -> list[str]:
    return [name for name, dtype in df.dtypes if dtype == "string"]


def string_strip(
    df: DataFrame,
    strip_fields: Sequence[str] | None = None,
    chars: str | None = None,
) -> DataFrame:
    """Strip whitespace (or ``chars``) on selected string fields; all
    string fields if none given (bubbles/ops/rows.py::string_strip)."""
    fields = list(strip_fields) if strip_fields else _string_fields(df)
    cols = {}
    for f in fields:
        if chars:
            cols[f] = F.btrim(F.col(f), F.lit(chars))
        else:
            cols[f] = F.trim(F.col(f))
    return df.withColumns(cols)


def text_substitute(
    df: DataFrame, field: str, substitutions: Sequence[tuple[str, str]]
) -> DataFrame:
    """Apply (regex, replacement) pairs in order to ``field``
    (bubbles/ops/rows.py::text_substitute).  Chained regexp_replace —
    each replaces ALL occurrences (reference uses re.sub, same)."""
    col = F.col(field)
    for pattern, replacement in substitutions:
        col = F.regexp_replace(col, pattern, replacement)
    return df.withColumn(field, col)


_DATE_PART_FNS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "quarter": F.quarter,
    "week": F.weekofyear,
    "dayofweek": F.dayofweek,
}


def split_date(
    df: DataFrame,
    fields: str | Sequence[str],
    parts: Sequence[str] = ("year", "month", "day"),
) -> DataFrame:
    """Explode date/timestamp fields into ``{field}_{part}`` integer
    columns (bubbles/ops/rows.py::split_date)."""
    field_list = [fields] if isinstance(fields, str) else list(fields)
    cols = {}
    for f in field_list:
        for part in parts:
            try:
                fn = _DATE_PART_FNS[part]
            except KeyError:
                raise ValueError(f"unknown date part: {part!r}")
            cols[f"{f}_{part}"] = fn(F.col(f))
    return df.withColumns(cols)


def empty_to_missing(
    df: DataFrame, fields: Sequence[str] | None = None, strict: bool = False
) -> DataFrame:
    """Empty string → NULL on string fields
    (bubbles/ops/rows.py — SURVEY.md §2.9 T4).  ``strict=True`` also
    nullifies whitespace-only strings."""
    target = list(fields) if fields else _string_fields(df)
    cols = {}
    for f in target:
        col = F.col(f)
        test = F.trim(col) == "" if strict else col == ""
        cols[f] = F.when(test, F.lit(None)).otherwise(col)
    return df.withColumns(cols)


def threshold(
    df: DataFrame,
    field: str,
    low: float,
    high: float,
    bin_names: Sequence[str] = ("low", "normal", "high"),
    output_field: str | None = None,
) -> DataFrame:
    """Numeric → 3-way bin label: x < low → bin_names[0],
    low <= x < high → bin_names[1], x >= high → bin_names[2]
    (bubbles/ops/rows.py::threshold; bound closure pinned half-open,
    NULL stays NULL)."""
    out = output_field or f"{field}_bin"
    col = F.col(field)
    binned = (
        F.when(col.isNull(), F.lit(None))
        .when(col < low, F.lit(bin_names[0]))
        .when(col < high, F.lit(bin_names[1]))
        .otherwise(F.lit(bin_names[2]))
    )
    return df.withColumn(out, binned)


# Minimal ASCII-fold table: the reference's transliterate normalizes
# accented text (bubbles/ops/rows.py — SURVEY.md §2.9 T6 [L]).
_ACCENTS = "áàâäãåéèêëíìîïóòôöõúùûüýÿçñÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÝÇÑ"
_PLAIN = "aaaaaaeeeeiiiiooooouuuuyycnAAAAAAEEEEIIIIOOOOOUUUUYCN"


def transliterate(df: DataFrame, fields: str | Sequence[str]) -> DataFrame:
    """ASCII-fold accented characters on string fields via a
    translate table (JVM-side; no ICU dependency)."""
    field_list = [fields] if isinstance(fields, str) else list(fields)
    cols = {f: F.translate(F.col(f), _ACCENTS, _PLAIN) for f in field_list}
    return df.withColumns(cols)


def fill_missing(df: DataFrame, values: dict) -> DataFrame:
    """Substitute each field's declared missing value for NULLs —
    the operator form of the reference's ``Field.missing_value``
    metadata (bubbles/metadata.py::Field carries missing_value per
    field; the reference applies it inside sources).  One coalesce
    per field, map-only."""
    cols = {f: F.coalesce(F.col(f), F.lit(v)) for f, v in values.items()}
    return df.withColumns(cols)


def retype(df: DataFrame, types: dict) -> DataFrame:
    """Cast fields to new storage types (the reference's ``retype``
    metadata operation — bubbles field storage_type changes; Spark
    ANSI mode makes bad casts ERRORS, so ``try_cast`` keeps the
    reference's lenient coerce-or-None semantics).  Map-only."""
    cols = {f: F.col(f).try_cast(t) for f, t in types.items()}
    return df.withColumns(cols)


def parse_date(
    df: DataFrame, field: str, fmt: str = "yyyy-MM-dd", out: str | None = None
) -> DataFrame:
    """Parse a string field into a date with an explicit format —
    lenient (NULL on mismatch, matching the reference's coercion
    behavior; ``to_date`` under ANSI raises, so try_to_date)."""
    return df.withColumn(
        out or field, F.expr(f"try_to_date({field}, '{fmt}')")
    )
