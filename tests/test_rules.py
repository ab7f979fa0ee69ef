"""Rule-group chaining semantics (the registered groups themselves are
oracle-checked in the parity sweep; these tests pin what the oracle
cannot see — that layer 2 is resolvable ONLY through the chain)."""

from __future__ import annotations

import pytest

from shards_prometheus_spark.functions.promql_parser import (
    PromQLEvaluator,
)
from shards_prometheus_spark.model import samples_multi
from shards_prometheus_spark.operators.rules import (
    CHAINED_RULE_GROUP,
    eval_rule_group_chained,
)
from tests.conftest import SF_SMOKE


def test_group_query_offset_shifts_evaluation(spark):
    """`query_offset:` (public group knob, ≥2.53): every rule in the
    group evaluates that far behind the store's now — the recorded
    value AND its timestamp shift by the offset, while an offset-free
    group on the same file still reads the newest sample."""
    from shards_prometheus_spark.operators.rules import (
        eval_rule_file,
        load_rule_groups,
    )

    _US = 1_000_000
    rows = [
        (1, 10, "g", {"user": "u"}, 100 * _US, 1.0),
        (2, 10, "g", {"user": "u"}, 200 * _US, 2.0),
    ]
    samples = spark.createDataFrame(
        rows,
        "event_id long, series_id long, metric string, "
        "labels map<string,string>, ts_us long, value double",
    )
    yml = """
groups:
  - name: now
    rules:
      - record: "g:rec"
        expr: g
  - name: behind
    query_offset: 100s
    rules:
      - record: "g:rec:off"
        expr: g
"""
    assert load_rule_groups(yml)[1]["query_offset_us"] == 100 * _US
    got = {
        r["rule"]: r["value"] for r in eval_rule_file(samples, yml).collect()
    }
    # now-group reads the 200s sample; the offset group evaluates at
    # 200s - 100s and reads the 100s sample
    assert got == {"g:rec": 2.0, "g:rec:off": 1.0}


def test_chained_layer_needs_the_chain(spark):
    """A record selector against the RAW store is empty — the layered
    expression only resolves because eval_rule_group_chained writes
    each record's vector back before the next rule runs."""
    samples = samples_multi(spark, SF_SMOKE)
    plain = PromQLEvaluator(samples).eval("user:click:rate720h * 86400")
    assert plain.count() == 0
    chained = eval_rule_group_chained(samples, CHAINED_RULE_GROUP)
    by_rule = {}
    for r in chained.collect():
        by_rule.setdefault(r["rule"], {})[r["labels"]] = r["value"]
    l1 = by_rule["user:click:rate720h"]
    l2 = by_rule["user:click:rate720h:daily"]
    # layer 2 = layer 1 × 86400, re-rounded on write-back, per label
    assert set(l1) == set(l2) and len(l1) > 0
    for k, v in l1.items():
        assert l2[k] == pytest.approx(round(v * 86400, 4))
    # the alert consumes layer 2: it fires on a strict subset (the
    # above-average users) and reports layer-2 values
    alert = by_rule["AboveAverageDailyClickRate"]
    assert set(alert) < set(l2) and len(alert) > 0
    avg = sum(l2.values()) / len(l2)
    assert set(alert) == {k for k, v in l2.items() if v > avg}
