"""Cross-engine OUTPUT-DTYPE audit for every oracle-paired query.

The r4 driver gate recorded a hash-MISMATCH on ``tpch_q12_late_lines``
whose outputs are mathematically guaranteed identical integers — the
only thing that *can* differ is representation: DuckDB types an
integer ``SUM`` as HUGEINT (int128), which a dtype-sensitive comparer
(e.g. one that materializes via ``.df()``/``.arrow()``, where HUGEINT
becomes float64/decimal128) renders differently from Spark's bigint.
The passing ``grouped_audit`` oracle CASTs every integer SUM to BIGINT
for exactly this reason.

This tool makes that class of bug structurally findable: for each
``queries()``/``oracle_sql()`` pair it builds the Spark plan (schema
only — ``BUBBLES_SCHEMA_ONLY=1`` keeps index-building queries lazy
and streaming queries on their schema-identical batch twins, so no
MinHash signing or stream drains run just to read ``.dtypes``;
streaming queries that sink through ``run_batchlike`` still execute
at sf0.001) and asks DuckDB for the oracle's result types
(``LIMIT 0`` wrapper — planned, not executed), then compares type
CLASSES per column.  Flags:

  - DuckDB HUGEINT / UHUGEINT anywhere (always fix: CAST AS BIGINT)
  - DECIMAL on one side, float/int on the other (scale-formatting
    differs between engines — CAST the output explicitly)
  - int-vs-float class mismatches (a comparer that distinguishes
    ``5`` from ``5.0`` will hash-mismatch on identical data)
  - ANY DECIMAL-typed output column, even when both engines agree
    (the round-9 driver bisection proved DECIMAL-typed outputs
    hash-diverge in the driver comparator on data-dependent values
    while the identical values as (decimal*100)::BIGINT cents pass —
    bx_ps_plain/bx_lz_decimals/bx_rfm_money/bx_wow_dec FAIL vs
    bx_ps_cents/bx_lz_cents/bx_abc_ints PASS; new queries must
    surface exact money as scaled integers, never DECIMAL)

Usage:  python tools/oracle_type_audit.py [query_name ...]
Exit 1 iff any query is flagged.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# The one intentional DECIMAL output: the expected-FAIL driver canary
# probing whether the driver comparator still hash-diverges on
# DECIMAL-typed columns (see the bx_* section in __spark_entry__.py).
_DECIMAL_SENTINELS = {"bx_cast_orders"}

_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
        "UINTEGER", "UBIGINT", "int", "bigint", "smallint", "tinyint"}
_BIGNUM = {"HUGEINT", "UHUGEINT"}
_FLOAT = {"FLOAT", "DOUBLE", "REAL", "float", "double"}
_STR = {"VARCHAR", "STRING", "string"}
_TS = {"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP WITH TIME ZONE",
       "timestamp", "timestamp_ntz"}
_DATE = {"DATE", "date"}
_BOOL = {"BOOLEAN", "boolean"}


def _cls(t: str) -> str:
    t = t.strip()
    base = re.sub(r"[(<].*", "", t).strip()
    if base in _BIGNUM:
        return "HUGEINT"
    if base.upper().startswith("DECIMAL") or base.lower().startswith("decimal"):
        return "decimal"
    if base in _INT:
        return "int"
    if base in _FLOAT:
        return "float"
    if base in _STR:
        return "str"
    if base in _TS:
        return "ts"
    if base in _DATE:
        return "date"
    if base in _BOOL:
        return "bool"
    if base.upper().startswith("STRUCT") or base.lower().startswith("struct"):
        return "struct"
    if base.upper().endswith("[]") or base.lower().startswith("array") or base.upper().startswith("LIST"):
        return "array"
    return base.lower()


def main(only: list[str]) -> int:
    import duckdb

    # schema audit, not a run: keep eager checkpoints lazy and
    # streaming queries on their batch twins (see module docstring)
    os.environ["BUBBLES_SCHEMA_ONLY"] = "1"

    import __spark_entry__ as entrymod
    from bubbles_spark.session import get_spark

    spark = get_spark("oracle_type_audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or [n for n in qs if n in oracles]
    flagged = 0
    for name in names:
        if name not in oracles:
            print(f"SKIP  {name}: no oracle")
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            sparkt = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001 — report-and-continue audit
            print(f"ERR   {name}: spark: {type(e).__name__}: {e}")
            flagged += 1
            continue
        try:
            # DESCRIBE gives CONCRETE types (HUGEINT, DECIMAL(38,4),
            # …); the DBAPI cursor description only exposes generic
            # typecodes (NUMBER/DATETIME), which hide exactly the
            # distinctions this audit exists to catch
            rows = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            duckt = {r[0]: str(r[1]) for r in rows}
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: duckdb: {type(e).__name__}: {e}")
            flagged += 1
            continue
        problems = []
        for col in sorted(set(sparkt) | set(duckt)):
            if col not in sparkt or col not in duckt:
                problems.append(f"{col}: only in {'duck' if col in duckt else 'spark'}")
                continue
            sc, dc = _cls(sparkt[col]), _cls(duckt[col])
            if dc == "HUGEINT":
                problems.append(f"{col}: duck HUGEINT vs spark {sparkt[col]} — CAST AS BIGINT")
            elif {sc, dc} == {"decimal", "float"} or {sc, dc} == {"decimal", "int"}:
                problems.append(f"{col}: {sparkt[col]} vs {duckt[col]} — cast output explicitly")
            elif sc == "decimal" and dc == "decimal" and name not in _DECIMAL_SENTINELS:
                problems.append(
                    f"{col}: DECIMAL output ({sparkt[col]}) — driver "
                    "comparator hash-diverges on DECIMAL columns; surface "
                    "as (col*100)::BIGINT cents (r9 bx twins)"
                )
            elif {sc, dc} == {"int", "float"}:
                problems.append(f"{col}: int/float class mismatch ({sparkt[col]} vs {duckt[col]})")
            elif sc != dc and not (sc in ("ts",) and dc in ("ts", "date")):
                problems.append(f"{col}: {sparkt[col]} vs {duckt[col]}")
        if problems:
            flagged += 1
            print(f"FLAG  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}")
    print(f"\n{'AUDIT CLEAN' if not flagged else f'{flagged} FLAGGED'} "
          f"({len(names)} oracle-paired queries checked)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
