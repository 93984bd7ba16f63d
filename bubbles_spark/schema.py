"""Field metadata: the bubbles schema model re-expressed on Spark types.

Parity: bubbles/metadata.py::Field, FieldList, FieldFilter, to_field
(SURVEY.md §1.2).  The reference binds row tuples positionally to a
FieldList; here a FieldList is a thin, declarative veneer that
compiles to a ``StructType`` — Spark's own schema machinery does the
binding.  The reference's *analytical type* (a Cubes heritage:
measure/nominal/ordinal/flag/...) is preserved as StructField
metadata so downstream analytics can still introspect it.

Extensions over the reference: nested/array/map/binary storage types
(the reference is flat scalar rows only — SURVEY.md §1.2), used by
the embeddings (`array<float>`) and multimodal columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field, replace
from typing import Any, Iterable, Iterator

from pyspark.sql import types as T

# --- storage types ------------------------------------------------------
# bubbles/metadata.py storage types → Spark types (SURVEY.md §1.2 table).
STORAGE_TO_SPARK: dict[str, T.DataType] = {
    "unknown": T.StringType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "time": T.StringType(),  # Spark has no TimeType
    "datetime": T.TimestampType(),
    # extensions (absent in the flat-scalar reference)
    "binary": T.BinaryType(),
    "array_float": T.ArrayType(T.FloatType()),
    "array_string": T.ArrayType(T.StringType()),
    "map": T.MapType(T.StringType(), T.StringType()),
}

_SPARK_TO_STORAGE: dict[str, str] = {
    "string": "string",
    "long": "integer",
    "bigint": "integer",
    "int": "integer",
    "integer": "integer",
    "short": "integer",
    "byte": "integer",
    "double": "number",
    "float": "number",
    "decimal": "number",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "datetime",
    "binary": "binary",
}

ANALYTICAL_TYPES = {
    "default",
    "typeless",
    "flag",
    "discrete",
    "measure",
    "nominal",
    "ordinal",
}


@dataclass(frozen=True)
class Field:
    """One column's metadata (bubbles/metadata.py::Field)."""

    name: str
    storage_type: str = "unknown"
    analytical_type: str = "default"
    concrete_storage_type: Any = None
    size: int | None = None
    missing_value: Any = None
    label: str | None = None
    info: dict = dc_field(default_factory=dict)

    def spark_type(self) -> T.DataType:
        if self.concrete_storage_type is not None and isinstance(
            self.concrete_storage_type, T.DataType
        ):
            return self.concrete_storage_type
        try:
            return STORAGE_TO_SPARK[self.storage_type]
        except KeyError:
            raise ValueError(f"unknown storage type: {self.storage_type!r}")

    def to_struct_field(self) -> T.StructField:
        meta = {"analytical_type": self.analytical_type}
        if self.label:
            meta["label"] = self.label
        if self.info:
            meta["info"] = self.info
        return T.StructField(self.name, self.spark_type(), nullable=True, metadata=meta)

    def renamed(self, name: str) -> "Field":
        return replace(self, name=name)


def to_field(obj: Any) -> Field:
    """Coerce str / tuple / dict / Field into Field
    (bubbles/metadata.py::to_field)."""
    if isinstance(obj, Field):
        return obj
    if isinstance(obj, str):
        return Field(obj)
    if isinstance(obj, (tuple, list)):
        return Field(*obj)
    if isinstance(obj, dict):
        return Field(**obj)
    raise TypeError(f"cannot coerce {type(obj).__name__} to Field")


class FieldList:
    """Ordered collection of Fields (bubbles/metadata.py::FieldList)."""

    def __init__(self, *fields: Any):
        # A single list argument is a list of field specs; tuples are
        # individual (name, storage_type, ...) specs handled by to_field.
        if len(fields) == 1 and isinstance(fields[0], list):
            fields = tuple(fields[0])
        self._fields: list[Field] = [to_field(f) for f in fields]
        self._index = {f.name: i for i, f in enumerate(self._fields)}
        if len(self._index) != len(self._fields):
            raise ValueError("duplicate field names in FieldList")

    # -- introspection (reference API surface) --
    def names(self) -> list[str]:
        return [f.name for f in self._fields]

    def field(self, name: str) -> Field:
        try:
            return self._fields[self._index[name]]
        except KeyError:
            raise KeyError(f"no field named {name!r}")

    def index(self, name: str) -> int:
        return self._index[name]

    def indexes(self, names: Iterable[str]) -> list[int]:
        return [self._index[n] for n in names]

    def clone(self) -> "FieldList":
        return FieldList(list(self._fields))

    def __iter__(self) -> Iterator[Field]:
        return iter(self._fields)

    def __len__(self) -> int:
        return len(self._fields)

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def __getitem__(self, i):
        return self._fields[i]

    def __add__(self, other: "FieldList") -> "FieldList":
        return FieldList(list(self._fields) + list(other._fields))

    def __eq__(self, other) -> bool:
        return isinstance(other, FieldList) and self._fields == other._fields

    def __repr__(self) -> str:
        return f"FieldList({', '.join(self.names())})"

    # -- Spark bridge --
    def to_struct(self) -> T.StructType:
        return T.StructType([f.to_struct_field() for f in self._fields])

    @classmethod
    def from_struct(cls, struct: T.StructType) -> "FieldList":
        fields = []
        for sf in struct.fields:
            storage = _SPARK_TO_STORAGE.get(sf.dataType.typeName(), "unknown")
            meta = sf.metadata or {}
            fields.append(
                Field(
                    sf.name,
                    storage,
                    analytical_type=meta.get("analytical_type", "default"),
                    concrete_storage_type=sf.dataType,
                    label=meta.get("label"),
                )
            )
        return cls(fields)


class FieldFilter:
    """Declarative keep/drop/rename projection
    (bubbles/metadata.py::FieldFilter + RowFieldFilter).

    In the reference this compiles to kept-tuple-indexes applied per
    row; here it compiles to a single ``df.select`` so Catalyst prunes
    the scan down to the kept columns (ReadSchema pushdown).
    """

    def __init__(
        self,
        keep: Iterable[str] | None = None,
        drop: Iterable[str] | None = None,
        rename: dict[str, str] | None = None,
    ):
        if keep is not None and drop is not None:
            raise ValueError("specify keep= or drop=, not both")
        self.keep = list(keep) if keep is not None else None
        self.drop = list(drop) if drop is not None else None
        self.rename = dict(rename) if rename else {}

    def filter(self, fields: FieldList) -> FieldList:
        """Apply to a FieldList (reference behavior)."""
        names = self.output_names(fields.names())
        out = []
        inverse = {}
        for f in fields:
            new = self.rename.get(f.name, f.name)
            inverse[new] = f
        for n in names:
            src = inverse[n]
            out.append(src.renamed(n))
        return FieldList(out)

    def output_names(self, names: list[str]) -> list[str]:
        if self.keep is not None:
            missing = [n for n in self.keep if n not in names]
            if missing:
                raise KeyError(f"keep refers to unknown fields: {missing}")
            selected = list(self.keep)
        elif self.drop is not None:
            selected = [n for n in names if n not in set(self.drop)]
        else:
            selected = list(names)
        return [self.rename.get(n, n) for n in selected]

    def apply(self, df):
        """Compile to a Spark projection."""
        from pyspark.sql import functions as F

        names = df.columns
        if self.keep is not None:
            selected = list(self.keep)
        elif self.drop is not None:
            selected = [n for n in names if n not in set(self.drop)]
        else:
            selected = list(names)
        cols = [
            F.col(n).alias(self.rename[n]) if n in self.rename else F.col(n)
            for n in selected
        ]
        return df.select(*cols)
