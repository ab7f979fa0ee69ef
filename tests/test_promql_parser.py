"""PromQL evaluator tests: grammar errors, and compiled plans checked
against hand-built DataFrame twins (the registered demo expressions are
oracle-checked in the parity sweep)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shards_prometheus_spark.functions.promql_parser import (
    PromQLSyntaxError,
    parse,
    promql_eval,
)
from shards_prometheus_spark.model import samples_multi
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize(
    "bad",
    [
        "sum by (user (rate(click[1h]))",   # unbalanced
        "rate(click)",                       # range fn without [d]
        "click{user=unquoted}",              # unquoted matcher
        "topk(5, click) extra",              # trailing tokens
        "1 + 2",                             # scalar-scalar
        "rate(click[1h]) > view",            # comparison needs scalar
    ],
)
def test_syntax_errors(spark, bad):
    with pytest.raises(PromQLSyntaxError):
        promql_eval(spark, SF_SMOKE, bad)


def test_parse_shapes():
    ast = parse('sum by (user) (rate(click{shard!="9"}[30m] offset 1h))')
    assert ast.op == "sum" and ast.by == ["user"]
    sel = ast.expr.sel
    assert sel.range_us == 1_800_000_000 and sel.offset_us == 3_600_000_000
    assert sel.matchers == [("shard", "!=", "9")]


def test_count_over_time_matches_hand_twin(spark):
    got = {
        (r["labels"], r["value"])
        for r in promql_eval(
            spark, SF_SMOKE, "count_over_time(click[720h])"
        ).collect()
    }
    s = samples_multi(spark, SF_SMOKE)
    tmax = s.agg(F.max("ts_us").alias("t")).first()["t"]
    want = {
        (
            f"shard={r['shard']},user={r['user']}",
            float(r["n"]),
        )
        for r in s.filter(
            (F.col("metric") == "click")
            & (F.col("ts_us") > tmax - 720 * 3_600_000_000)
            & (F.col("ts_us") <= tmax)
        )
        .select(
            F.element_at("labels", F.lit("user")).alias("user"),
            F.element_at("labels", F.lit("shard")).alias("shard"),
        )
        .groupBy("user", "shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_vector_scalar_arithmetic(spark):
    base = {
        r["labels"]: r["value"]
        for r in promql_eval(
            spark, SF_SMOKE, "sum by (user) (increase(click[720h]))"
        ).collect()
    }
    doubled = {
        r["labels"]: r["value"]
        for r in promql_eval(
            spark, SF_SMOKE, "sum by (user) (increase(click[720h])) * 2"
        ).collect()
    }
    assert set(base) == set(doubled) and len(base) > 0
    for k, v in base.items():
        assert doubled[k] == pytest.approx(2 * v, abs=2e-4)


def test_offset_shifts_the_window(spark):
    plain = promql_eval(spark, SF_SMOKE, "sum_over_time(view[240h])")
    offs = promql_eval(
        spark, SF_SMOKE, "sum_over_time(view[240h] offset 240h)"
    )
    a = {(r["labels"], r["value"]) for r in plain.collect()}
    b = {(r["labels"], r["value"]) for r in offs.collect()}
    assert a and b and a != b


def test_group_left_share_sums_to_one(spark):
    """on(user) group_left: shares within each user must sum to ~1."""
    rows = promql_eval(
        spark,
        SF_SMOKE,
        "sum by (user, shard) (increase(click[720h])) / on (user) "
        "group_left sum by (user) (increase(click[720h]))",
    ).collect()
    assert rows
    per_user: dict[str, float] = {}
    for r in rows:
        user = dict(
            kv.split("=", 1) for kv in r["labels"].split(",")
        )["user"]
        per_user[user] = per_user.get(user, 0.0) + r["value"]
    for total in per_user.values():
        assert total == pytest.approx(1.0, abs=1e-2)


def test_ignoring_matches_complement_labels(spark):
    """ignoring(shard) must equal on(user) here (labels = {user, shard});
    both sides keep only the match labels."""
    a = {
        (r["labels"], r["value"])
        for r in promql_eval(
            spark,
            SF_SMOKE,
            "sum_over_time(click[720h]) + ignoring (shard) "
            "sum by (user) (sum_over_time(click[720h]))",
        ).collect()
    }
    b = {
        (r["labels"], r["value"])
        for r in promql_eval(
            spark,
            SF_SMOKE,
            "sum_over_time(click[720h]) + on (user) "
            "sum by (user) (sum_over_time(click[720h]))",
        ).collect()
    }
    assert a == b and len(a) > 0


def test_without_equals_complement_by(spark):
    """without (shard) ≡ by (user) when labels = {user, shard}."""
    a = {
        (r["labels"], r["value"])
        for r in promql_eval(
            spark, SF_SMOKE, "sum without (shard) (sum_over_time(click[720h]))"
        ).collect()
    }
    b = {
        (r["labels"], r["value"])
        for r in promql_eval(
            spark, SF_SMOKE, "sum by (user) (sum_over_time(click[720h]))"
        ).collect()
    }
    assert a == b and len(a) > 0


def test_absent_semantics(spark):
    """absent() of a missing metric yields one row valued 1 carrying
    the equality matchers; of a present metric, no rows."""
    missing = promql_eval(
        spark, SF_SMOKE, 'absent(nonexistent_metric{user="7"})'
    ).collect()
    assert [(r["labels"], r["value"]) for r in missing] == [("user=7", 1.0)]
    # the metric owning the max-ts sample is inside the lookback at T
    # by construction (sparse smoke data may have no 'click' there)
    s = samples_multi(spark, SF_SMOKE)
    present = (
        s.orderBy(F.desc("ts_us")).select("metric").first()["metric"]
    )
    assert promql_eval(spark, SF_SMOKE, f"absent({present})").count() == 0
