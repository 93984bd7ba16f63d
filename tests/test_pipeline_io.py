"""Pipeline facade + stores: fluent chaining, safe run(), fork,
register_operation, CSV/memory round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bubbles_spark import io as bio
from bubbles_spark.pipeline import Pipeline, register_operation


def test_fluent_chain(spark, people):
    p = Pipeline(spark=spark).source_df(people)
    p.filter_not_empty("label").aggregate("label", [("amount", "sum")])
    rows = {r["label"]: r["amount_sum"] for r in p.fetch_all()}
    assert rows["a"] == 50.0


def test_run_returns_count_not_rows(spark, people):
    p = Pipeline(spark=spark).source_df(people)
    out = p.run()
    assert out == people.count()  # a count, never a collected row list


def test_unknown_operation_raises(spark, people):
    p = Pipeline(spark=spark).source_df(people)
    with pytest.raises(AttributeError):
        p.no_such_operation()


def test_register_operation(spark, people):
    register_operation("double_amount", lambda df: df.withColumn(
        "amount", F.col("amount") * 2
    ))
    p = Pipeline(spark=spark).source_df(people)
    got = {r["id"]: r["amount"] for r in p.double_amount().fetch_all()}
    assert got[1] == 20.0


def test_fork(spark, people):
    p = Pipeline(spark=spark).source_df(people)
    q = p.fork()
    p.filter_by_value("label", "a")
    q.filter_by_value("label", "b")
    assert p.df.count() == 3 and q.df.count() == 1


def test_as_dict_guard(spark, people):
    p = Pipeline(spark=spark).source_df(people)
    d = p.as_dict("id", "label", max_rows=10)
    assert d[1] == "a"
    with pytest.raises(ValueError):
        Pipeline(spark=spark).source_df(people).as_dict("id", "label", max_rows=2)


def test_parquet_store_roundtrip(spark, people, tmp_path):
    store = bio.open_store("parquet", path=str(tmp_path), spark=spark)
    p = Pipeline(stores={"out": store}, spark=spark).source_df(people)
    n = p.filter_not_empty("label").run(store="out", name="clean")
    assert n == 5
    assert store.exists("clean")
    assert store.get_object("clean").count() == 5


def test_csv_store_roundtrip(spark, people, tmp_path):
    store = bio.open_store("csv", path=str(tmp_path), spark=spark)
    store.create("people", from_obj=people, replace=True)
    back = store.get_object("people")
    assert back.count() == people.count()


def test_memory_store(spark):
    from bubbles_spark.schema import FieldList

    store = bio.open_store("memory", spark=spark)
    fields = FieldList(("id", "integer"), ("v", "string"))
    store.create("t", fields=fields, from_obj=[(1, "a"), (2, "b")])
    assert store.get_object("t").count() == 2
    with pytest.raises(ValueError):
        store.create("t", fields=fields, from_obj=[(3, "c")])  # no replace


def test_pipeline_dispatches_round2_ops(spark):
    """The catalog-driven __getattr__ surface picks up every new
    operator module (reshape/textprep/sketch) without registration."""
    from bubbles_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, g string, x double",
    )
    p = Pipeline(spark=spark).source_df(df)
    out = p.histogram("x", 0.0, 40.0, 4).zscore_normalize("x", by="g").df
    assert "bin" in out.columns and "x_z" in out.columns
    assert out.count() == 3

    docs = spark.createDataFrame(
        [(1, "mail a@b.com here")], "doc_id long, text string"
    )
    masked = Pipeline(spark=spark).source_df(docs).pii_mask().fetch_all()
    assert masked[0]["text"] == "mail <EMAIL> here"


def test_execution_context_direct_calls(spark):
    from bubbles_spark.pipeline import ExecutionContext

    ctx = ExecutionContext()
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string")
    out = ctx.op.distinct(df, "g")
    assert sorted(r["g"] for r in out.collect()) == ["a", "b"]
    assert "aggregate" in ctx.operation_names()
    import pytest

    with pytest.raises(AttributeError):
        ctx.op.no_such_operation


def test_pipeline_from_spec_end_to_end(spark, tmp_path):
    """Declarative spec: source from a store, catalog-name dispatch,
    target write; unknown ops raise by name, never eval."""
    import pytest as _pytest

    from bubbles_spark.io import FileStore
    from bubbles_spark.pipeline import Pipeline

    store = FileStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "a", None)],
        "id long, g string, v double",
    )
    store.create("src", from_obj=df)
    spec = {
        "source": {"store": "s", "name": "src"},
        "steps": [
            {"op": "filter_by_value", "args": ["g", "a"]},
            {"op": "aggregate", "args": ["g", [["v", "sum"]]]},
        ],
        "target": {"store": "s", "name": "out"},
    }
    p = Pipeline.from_spec(spec, stores={"s": store}, spark=spark)
    got = store.get_object("out").collect()
    assert len(got) == 1
    assert got[0]["v_sum"] == 30.0 and got[0]["record_count"] == 3
    assert p.df.columns == ["g", "v_sum", "record_count"]
    with _pytest.raises(AttributeError, match="no operation named"):
        Pipeline.from_spec(
            {"steps": [{"op": "not_an_op"}]}, spark=spark, df=df
        )
    with _pytest.raises(ValueError, match="no source"):
        Pipeline.from_spec({"steps": []}, spark=spark)
