"""Reference-shaped golden tests (FIXTURES.md §A).

The reference's only test (test.edn:1-8) increments
`test_counter{Label1=...}` at relative rates 1:2:4 per 0.2s tick.
After N ticks of unit increments the counter totals must be exactly
N, 2N, 4N — the first golden fact of the engine (SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from shards_prometheus_spark.registry_api import (
    MetricsRegistry,
    NegativeIncrementError,
    observed,
)

N_TICKS = 50


@pytest.fixture(scope="module")
def reference_samples(spark):
    # One row per increment, mirroring test.edn:4-6 (Value1 ×1,
    # Value2 ×2, Value3 ×4 per tick), unit increments.
    rows = []
    event_id = 0
    for tick in range(N_TICKS):
        ts_us = 200_000 * tick  # 0.2 s cadence (test.edn:8)
        for label, reps in (("Value1", 1), ("Value2", 2), ("Value3", 4)):
            for _ in range(reps):
                rows.append((event_id, "test_counter", label, ts_us, 1.0))
                event_id += 1
    return spark.createDataFrame(
        rows, "event_id long, metric string, label_user string, ts_us long, value double"
    )


def test_counter_ratio_1_2_4(reference_samples):
    reg = MetricsRegistry(reference_samples)
    totals = {
        r["label_user"]: r["total"] for r in reg.counter_total().collect()
    }
    assert totals == {
        "Value1": float(N_TICKS),
        "Value2": float(2 * N_TICKS),
        "Value3": float(4 * N_TICKS),
    }


def test_negative_increment_rejected_strict(spark, reference_samples):
    bad = spark.createDataFrame(
        [(10_000, "test_counter", "Value1", 1, -5.0)],
        "event_id long, metric string, label_user string, ts_us long, value double",
    )
    reg = MetricsRegistry(reference_samples).ingest(bad)
    with pytest.raises(NegativeIncrementError):
        reg.counter_total(strict=True)
    # non-strict drops the poisoned row, totals unchanged
    totals = {
        r["label_user"]: r["total"] for r in reg.counter_total().collect()
    }
    assert totals["Value1"] == float(N_TICKS)


def test_gauge_last_write_wins(spark):
    rows = [
        (1, "g", "a", 100, 1.0),
        (2, "g", "a", 300, 3.0),  # latest ts wins
        (3, "g", "a", 200, 2.0),
        (4, "g", "b", 100, 9.0),
    ]
    reg = MetricsRegistry(
        spark.createDataFrame(
            rows,
            "event_id long, metric string, label_user string, ts_us long, value double",
        )
    )
    last = {r["label_user"]: r["last"] for r in reg.gauge_last().collect()}
    assert last == {"a": 3.0, "b": 9.0}


def test_histogram_cumulative_buckets(spark):
    rows = [
        (i, "h", "x", i, v)
        for i, v in enumerate([0.5, 2.0, 2.5, 7.0, 100.0])
    ]
    reg = MetricsRegistry(
        spark.createDataFrame(
            rows,
            "event_id long, metric string, label_user string, ts_us long, value double",
        )
    )
    hist = {
        r["le"]: (r["bucket_count"], r["cum_count"])
        for r in reg.histogram([1.0, 5.0, 10.0]).collect()
    }
    # le-convention: cumulative counts, +Inf catches the rest
    assert hist["1"] == (1, 1)
    assert hist["5"] == (2, 3)
    assert hist["10"] == (1, 4)
    assert hist["+Inf"] == (1, 5)


def test_observed_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "m", "a", 1, 2.0), (2, "m", "a", 2, -1.0)],
        "event_id long, metric string, label_user string, ts_us long, value double",
    )
    tapped, obs = observed(df)
    # pass-through contract: rows unchanged (prometheus.cpp:92,213,250,304)
    assert sorted(tuple(r) for r in tapped.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    got = obs.get
    assert got["n_rows"] == 2
    assert got["sum_pos"] == 2.0
    assert got["n_negative"] == 1


def test_snapshot_kinds(reference_samples):
    snap = MetricsRegistry(reference_samples).snapshot([1.0, 10.0])
    kinds = {r["kind"] for r in snap.collect()}
    assert kinds == {"counter", "gauge", "histogram"}


def test_parameterized_api_matches_fixed_queries(spark):
    """The parameterized PromQL API (registry.increase/rate/top_k with
    arbitrary windows) agrees with the oracle-checked fixed-window
    queries at window=3600."""
    from shards_prometheus_spark.model import samples
    from shards_prometheus_spark.operators.counters import counter_increase, counter_rate
    from tests.conftest import SF_SMOKE

    reg = MetricsRegistry(samples(spark, SF_SMOKE))
    got_inc = {
        (r["metric"], r["window_ts"]): round(r["increase"], 4)
        for r in reg.increase(3600).collect()
    }
    want_inc = {
        (r["metric"], r["hour_ts"]): r["increase"]
        for r in counter_increase(spark, SF_SMOKE).collect()
    }
    assert got_inc == want_inc
    got_rate = {
        (r["metric"], r["window_ts"]): round(r["rate"], 6)
        for r in reg.rate(3600).collect()
    }
    want_rate = {
        (r["metric"], r["hour_ts"]): r["rate"]
        for r in counter_rate(spark, SF_SMOKE).collect()
    }
    assert got_rate == want_rate
    # a different window is a strictly coarser partition of the deltas
    day = reg.increase(86400)
    assert abs(
        sum(r["increase"] for r in day.collect())
        - sum(want_inc.values())
    ) < 1e-6
    assert reg.top_k(3).count() == 3
