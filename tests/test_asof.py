"""Unit tests for the generic as-of join edge semantics."""

from __future__ import annotations

from shards_prometheus_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_latest_preceding(spark):
    probe = _df(
        spark,
        [(1, "u", 100), (2, "u", 250), (3, "u", 50)],
        "id long, k string, ts long",
    )
    ref = _df(
        spark,
        [("u", 100, 10.0), ("u", 200, 20.0)],
        "k string, ts long, v double",
    )
    got = {
        r["id"]: r["asof_value"]
        for r in asof_join(probe, ref, "k", "ts", "v").collect()
    }
    # ts=100 matches the equal-ts ref (>= semantics); ts=250 takes the
    # later ref; ts=50 precedes everything -> NULL
    assert got == {1: 10.0, 2: 20.0, 3: None}


def test_asof_keys_do_not_leak(spark):
    probe = _df(spark, [(1, "a", 10), (2, "b", 10)], "id long, k string, ts long")
    ref = _df(spark, [("a", 5, 1.0)], "k string, ts long, v double")
    got = {
        r["id"]: r["asof_value"]
        for r in asof_join(probe, ref, "k", "ts", "v").collect()
    }
    assert got == {1: 1.0, 2: None}


def test_asof_probe_columns_preserved(spark):
    probe = _df(
        spark, [(1, "a", 10, "payload")], "id long, k string, ts long, extra string"
    )
    ref = _df(spark, [("a", 5, 7.5)], "k string, ts long, v double")
    row = asof_join(probe, ref, "k", "ts", "v").collect()[0]
    assert row["extra"] == "payload"
    assert row["asof_value"] == 7.5
