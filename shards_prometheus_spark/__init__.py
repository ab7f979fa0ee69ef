"""shards_prometheus_spark — a PySpark-native metrics/analytics engine.

A from-scratch re-expression of the capabilities of
fragcolor-xyz/shards-prometheus (a Shards plugin wrapping prometheus-cpp;
see /root/reference/prometheus.cpp) as an idiomatic Spark engine:

- Tier A: the four reference operators (Exposer registry, Counter
  Increment, Gauge Set, Histogram Observe — reference prometheus.cpp:309-314)
  re-expressed as declarative DataFrame aggregations over a tall
  ``samples`` table.
- Tier B: the PromQL-core query surface the reference's data is consumed
  through (instant vectors, label matchers, rate/increase, aggregations,
  topk, quantiles, binary ops — public Prometheus semantics).
- Tier C: LLM-data-pipeline operators (dedup exact/minhash/simhash/
  jaccard/embedding, similarity search, text analysis, multimodal
  plumbing) designed for 100 TB scale.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning,
join strategy and codegen; no RDDs, no row-at-a-time Python UDFs in hot
paths.
"""

from shards_prometheus_spark.session import get_spark, prepare_session

__all__ = ["get_spark", "prepare_session"]
__version__ = "0.1.0"
