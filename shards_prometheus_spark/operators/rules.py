"""Recording and alerting rules — the Prometheus-server surface the
reference delegates to its paired server (the reference's shards only
*feed* a Prometheus instance, prometheus.cpp:27-93; rule evaluation is
what that server runs against the scraped store).

- `recording_rules`: a fixed rule group evaluated through the PromQL
  string evaluator; each rule's result vector is re-labeled with the
  rule's record name (`level:metric:operation` naming convention) and
  unioned — the derived-series relation a scheduler would append back
  to the store each interval.
- `alert_rules`: alert definitions (name, expr) whose expr is a PromQL
  comparison; surviving series are the FIRING set. The demo group has
  a scale-invariant threshold (above-average user click volume — a
  vector > scalar(avg(...)) comparison, so the rule is meaningful at
  every SF) and an `absent()` liveness alert (fires while the probed
  metric has no samples — the standard dead-exporter page).

Scale shape: each rule is one evaluator plan (one scan per selector
leaf joined to broadcast t_max); the union is plan-level, not a
driver loop over collected results. Rule GROUPS evaluate independently
— on a cluster each group is its own job, exactly how a Prometheus
server schedules them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.functions.promql_parser import (
    SAMPLES_MULTI_CTE,
    _H720_US,
    _T_CTE,
    PromQLEvaluator,
    _increase_cte,
)
from shards_prometheus_spark.model import dround

#: (record_name, expr) — the Prometheus `record:` rule group.
RECORDING_RULES: list[tuple[str, str]] = [
    ("user:click:rate720h", "sum by (user) (rate(click[720h]))"),
    (
        "user:purchase:increase720h",
        "sum by (user) (increase(purchase[720h]))",
    ),
]

#: (alertname, expr) — `alert:` rules; expr is a PromQL comparison
#: whose surviving series are the firing set.
ALERT_RULES: list[tuple[str, str]] = [
    (
        "AboveAverageClickVolume",
        "sum by (user) (increase(click[720h])) > "
        "scalar(avg(sum by (user) (increase(click[720h]))))",
    ),
    ("MissingTemperatureMetric", "absent(temperature)"),
]


def eval_rule_group(
    ev: PromQLEvaluator,
    rules: list[tuple[str, str]],
    name_col: str,
) -> DataFrame:
    """Evaluate a rule group against ANY samples relation (batch
    parquet or a streamed sink table) — each rule's result vector
    labeled with its rule name, unioned plan-level."""
    parts = [
        ev.eval(expr).select(
            F.lit(name).alias(name_col), "labels", "value"
        )
        for name, expr in rules
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def recording_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the recording-rule group: (metric, labels, value) —
    each rule's vector labeled with its record name."""
    return eval_rule_group(
        PromQLEvaluator.from_dir(spark, sf_dir), RECORDING_RULES, "metric"
    )


def alert_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the alert group: (alertname, labels, value) for every
    FIRING series (the comparison already filtered non-firing ones)."""
    return eval_rule_group(
        PromQLEvaluator.from_dir(spark, sf_dir), ALERT_RULES, "alertname"
    )


QUERIES = {
    "recording_rules": recording_rules,
    "alert_rules": alert_rules,
}

_REC_SQL = (
    f"{SAMPLES_MULTI_CTE}, {_T_CTE}, "
    + _increase_cte("click", _H720_US, "ci")
    + ", "
    + _increase_cte("purchase", _H720_US, "pi")
    + " SELECT 'user:click:rate720h' AS metric, "
    "'user=' || l_user AS labels, "
    + dround(f"SUM(inc / {_H720_US / 1e6})", 4)
    + " AS value FROM ci GROUP BY l_user "
    "UNION ALL "
    "SELECT 'user:purchase:increase720h' AS metric, "
    "'user=' || l_user AS labels, "
    + dround("SUM(inc)", 4)
    + " AS value FROM pi GROUP BY l_user"
)

_ALERT_SQL = (
    f"{SAMPLES_MULTI_CTE}, {_T_CTE}, "
    + _increase_cte("click", _H720_US, "ci")
    + ", per_user AS (SELECT l_user, SUM(inc) AS v FROM ci "
    "GROUP BY l_user), "
    "thr AS (SELECT AVG(v) AS a FROM per_user) "
    "SELECT 'AboveAverageClickVolume' AS alertname, "
    "'user=' || l_user AS labels, "
    + dround("v", 4)
    + " AS value FROM per_user, thr WHERE "
    + dround("v", 6)
    + " > a "
    "UNION ALL "
    "SELECT 'MissingTemperatureMetric' AS alertname, '' AS labels, "
    "1.0 AS value WHERE NOT EXISTS "
    "(SELECT 1 FROM samples_multi WHERE metric = 'temperature')"
)

ORACLES = {
    "recording_rules": _REC_SQL,
    "alert_rules": _ALERT_SQL,
}
