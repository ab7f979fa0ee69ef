"""Query registry: aggregates every operator module's QUERIES/ORACLES.

This is the engine's analog of the reference's shard registration table
(registerExternalShards, prometheus.cpp:309-314) — the single place
where every exposed operator is declared.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from shards_prometheus_spark.functions import promql as promql_functions
from shards_prometheus_spark.sources import exposition
from shards_prometheus_spark.operators import (
    aggregations,
    asof,
    binop,
    counters,
    dedup,
    gauges,
    histograms,
    multimodal,
    olap,
    pipeline,
    quality,
    range_functions,
    rollup,
    selectors,
    similarity,
    snapshot,
    text,
    tpch,
)

_MODULES = [
    counters,
    gauges,
    histograms,
    range_functions,
    rollup,
    selectors,
    aggregations,
    asof,
    binop,
    olap,
    pipeline,
    quality,
    promql_functions,
    snapshot,
    exposition,
    dedup,
    similarity,
    text,
    multimodal,
    tpch,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
