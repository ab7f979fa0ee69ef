"""Structured Streaming ingest — the reference's execution model.

The reference's runtime is an unbounded loop of ticks updating running
metric state (test.edn:2-8, 0.2 s cadence) with processing-time
semantics and no late-data concept. Our analog is Structured Streaming
micro-batches updating the same declarative aggregations in update
mode, plus watermarked event-time windows — strictly stronger (late
data handled; the reference cannot).
"""

from shards_prometheus_spark.streaming.ingest import (
    countmin_cells_stream,
    counter_totals_stream,
    gauge_last_stream,
    histogram_buckets_stream,
    interval_join_stream,
    run_to_memory,
    samples_multi_stream,
    samples_stream,
    session_windows_stream,
    stream_events,
    windowed_sums_stream,
)
from shards_prometheus_spark.streaming.rollup import (
    compact_rollup,
    continuous_rollup,
    dedup_events_stream,
    read_rollup,
)
from shards_prometheus_spark.streaming.stateful import (
    stateful_increase_stream,
    use_rocksdb_state_store,
)

__all__ = [
    "stream_events",
    "samples_stream",
    "samples_multi_stream",
    "counter_totals_stream",
    "countmin_cells_stream",
    "gauge_last_stream",
    "histogram_buckets_stream",
    "windowed_sums_stream",
    "session_windows_stream",
    "interval_join_stream",
    "run_to_memory",
    "stateful_increase_stream",
    "use_rocksdb_state_store",
    "continuous_rollup",
    "compact_rollup",
    "read_rollup",
    "dedup_events_stream",
]
