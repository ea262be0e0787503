"""Dataset push/export/pagination + label Router."""

import json
import os

import pytest
from pyspark.sql import functions as F

from crawlee_spark.functions.keying import salted_unique_key_col, unique_key_col
from crawlee_spark.operators.dataset import Dataset, route_by_label


def test_dataset_push_and_pagination(spark, tmp_store_dir):
    ds = Dataset(spark, os.path.join(tmp_store_dir, "ds"))
    df = spark.createDataFrame([(i, f"u{i}") for i in range(10)], "seq long, url string")
    ds.push_data(df, order_from="seq")
    page = ds.get_data(offset=3, limit=4).collect()
    assert [r["seq"] for r in page] == [3, 4, 5, 6]
    # append preserves earlier rows
    ds.push_data(spark.createDataFrame([(10, "u10")], "seq long, url string"), order_from="seq")
    assert ds.read().count() == 11


def test_dataset_export_json_single_file(spark, tmp_store_dir):
    ds = Dataset(spark, os.path.join(tmp_store_dir, "ds2"))
    ds.push_data(
        spark.createDataFrame([(1, "a"), (2, "b")], "seq long, v string"), order_from="seq"
    )
    out = os.path.join(tmp_store_dir, "export")
    ds.export_to(out, fmt="json", single_file=True)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    rows = [json.loads(l) for l in open(os.path.join(out, parts[0]))]
    assert {r["v"] for r in rows} == {"a", "b"}


def test_router_dispatch(spark):
    df = spark.createDataFrame(
        [("detail", 1), ("list", 2), ("detail", 3)], "label string, x long"
    )
    out = route_by_label(
        df,
        {
            "detail": lambda d: d.withColumn("x", F.col("x") * 10),
            "list": lambda d: d.withColumn("x", F.col("x") * 100),
        },
    )
    got = {r["label"]: [] for r in out.collect()}
    for r in out.collect():
        got[r["label"]].append(r["x"])
    assert sorted(got["detail"]) == [10, 30]
    assert got["list"] == [200]


def test_router_null_label_goes_to_default(spark):
    """Reference Router: a request with no userData.label runs the default
    handler — null labels must not vanish into NULL-false predicates."""
    df = spark.createDataFrame([(None, 1), ("detail", 2)], "label string, x long")
    out = route_by_label(
        df,
        {"detail": lambda d: d.withColumn("x", F.col("x") * 10)},
        default_handler=lambda d: d.withColumn("x", F.lit(-1).cast("long")),
    )
    got = {r["label"]: r["x"] for r in out.collect()}
    assert got == {"detail": 20, None: -1}


def test_router_null_label_raises_without_default(spark):
    df = spark.createDataFrame([(None, 1)], "label string, x long")
    with pytest.raises(ValueError, match="no route"):
        route_by_label(df, {"detail": lambda d: d})


def test_dataset_push_seq_deterministic_without_order(spark, tmp_store_dir):
    """Default push_seq must be stable across identical runs (never
    monotonically_increasing_id, which depends on partition layout)."""
    rows = [(i, f"u{i}") for i in range(20)]

    def run(name):
        ds = Dataset(spark, os.path.join(tmp_store_dir, name))
        ds.push_data(spark.createDataFrame(rows, "a long, url string").repartition(7))
        return [(r["a"], r["push_seq"]) for r in ds.read().orderBy("push_seq").collect()]

    assert run("d1") == run("d2")


def test_router_unrouted_raises_without_default(spark):
    df = spark.createDataFrame([("unknown", 1)], "label string, x long")
    with pytest.raises(ValueError, match="no route"):
        route_by_label(df, {"detail": lambda d: d})


def test_router_default_handler(spark):
    df = spark.createDataFrame([("unknown", 1), ("detail", 2)], "label string, x long")
    out = route_by_label(
        df,
        {"detail": lambda d: d.withColumn("x", F.col("x") * 10)},
        default_handler=lambda d: d.withColumn("x", F.lit(-1).cast("long")),
    )
    got = {r["label"]: r["x"] for r in out.collect()}
    assert got == {"detail": 20, "unknown": -1}


def test_extended_unique_key(spark):
    df = spark.createDataFrame(
        [("HTTP://Example.com/a/", "post", "body")], "url string, method string, payload string"
    )
    plain = df.select(unique_key_col("url").alias("k")).collect()[0]["k"]
    assert plain == "http://example.com/a"
    ext = df.select(
        unique_key_col("url", "method", "payload", use_extended=True).alias("k")
    ).collect()[0]["k"]
    # METHOD(payloadHash):normalizedUrl (request.ts:418-440)
    assert ext.startswith("POST(") and ext.endswith("):http://example.com/a")
    from crawlee_spark.functions.keying import hash_payload_py

    assert ext == f"POST({hash_payload_py('body')}):http://example.com/a"


def test_salted_unique_key_keeps_duplicates(spark):
    df = spark.createDataFrame([("http://a.com/x",), ("http://a.com/x",)], "url string")
    keys = [
        r["k"]
        for r in df.select(salted_unique_key_col(unique_key_col("url")).alias("k")).collect()
    ]
    assert len(set(keys)) == 2  # duplicates survive as distinct keys
    assert all(k.startswith("http://a.com/x|") for k in keys)


def test_dataset_info_iterate_map_reduce_drop(spark, tmp_path):
    """Dataset.getInfo/forEach/map/reduce/drop surface (dataset.ts:458-689)."""
    from crawlee_spark.operators.dataset import Dataset

    ds = Dataset(spark, str(tmp_path / "ds"))
    ds.push_data(
        spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "k int, v string"),
        order_from="k",
    )
    assert ds.get_info() == {"itemCount": 3}

    # iterate: push order, streamed
    assert [r["v"] for r in ds.iterate()] == ["a", "b", "c"]
    assert [r["v"] for r in ds.iterate(offset=1, limit=1)] == ["b"]

    # map: set-wise transform, stays a DataFrame
    doubled = ds.map_items(lambda df: df.selectExpr("k * 2 as k2", "push_seq"))
    assert [r["k2"] for r in doubled.orderBy("push_seq").collect()] == [2, 4, 6]

    # reduce: sequential driver fold in push order
    concat = ds.reduce_items(lambda acc, row: acc + row["v"], memo="")
    assert concat == "abc"
    first = ds.reduce_items(lambda acc, row: acc)  # no memo: first row seeds
    assert first["v"] == "a"

    # second push continues the sequence across pushes
    ds.push_data(spark.createDataFrame([(9, "z")], "k int, v string"), order_from="k")
    assert ds.get_info() == {"itemCount": 4}
    assert [r["v"] for r in ds.iterate()] == ["a", "b", "c", "z"]

    ds.drop()
    assert ds.get_info() == {"itemCount": 0}
