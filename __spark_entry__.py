"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``shards_prometheus_spark`` (see SURVEY.md §2
for the operator inventory and ARCHITECTURE.md for the scale design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 phase 1): hourly counter-rate report.

    Scan → series lag window (counter-reset clamp) → hour bucket → agg,
    over sf0.001 — the Spark restatement of what the reference plus its
    Prometheus scraper compute (counter deltas over scrape intervals).
    """
    from shards_prometheus_spark.operators.counters import counter_rate
    from shards_prometheus_spark.session import prepare_session

    prepare_session(spark)
    return counter_rate(spark, "/root/testdata/sf0.001").orderBy(
        "metric", "hour_ts"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from shards_prometheus_spark.registry import all_queries
    from shards_prometheus_spark.session import prepare_session

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL oracle per query (keys without one get the
    weaker rows-only check — reserved for genuinely non-SQL ops)."""
    from shards_prometheus_spark.registry import all_oracles

    return all_oracles()
