"""MetricsRegistry — the user-facing Tier A surface.

The reference registers four dataflow operators
(registerExternalShards, prometheus.cpp:309-314):

- `Prometheus.Exposer`  → ``MetricsRegistry`` (owns the samples
  relation and serves reads; prometheus.cpp:27-93)
- `Prometheus.Increment`→ ``counter_total`` + the negative-increment
  guard (prometheus.cpp:177-215, guard :209-212)
- `Prometheus.Gauge`    → ``gauge_last`` last-write-wins
  (prometheus.cpp:217-252)
- `Prometheus.Histogram`→ ``histogram`` with explicit static bounds
  (prometheus.cpp:256-306, bounds :264-269)

The reference's operators are pass-through taps: they return their
input unchanged and mutate metric state as a side effect
(prometheus.cpp:92, :213, :250, :304). The Spark-idiomatic analog is
``observed()`` — `df.observe(...)` instruments a flowing DataFrame
without altering it, which is exactly the same contract.

A registry here is declarative: it holds a samples DataFrame (any
relation with (metric, label_user, ts_us, value)) and derives metric
state as queries — the "warmup-time series resolution" of the
reference (prometheus.cpp:185-199) becomes Catalyst analysis, and the
"atomic add" hot path becomes a map-side-combined hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

SERIES_KEY = ["metric", "label_user"]


class NegativeIncrementError(ValueError):
    """Raised in strict mode for negative counter increments
    (reference behavior: prometheus.cpp:209-212 errors the wire)."""


class MetricsRegistry:
    """A declarative metric registry over a tall samples relation."""

    def __init__(self, samples: DataFrame):
        self._samples = samples

    @property
    def samples(self) -> DataFrame:
        return self._samples

    def ingest(self, more: DataFrame) -> "MetricsRegistry":
        """Append a batch (the activate path, prometheus.cpp:212)."""
        return MetricsRegistry(self._samples.unionByName(more))

    # -- counter ---------------------------------------------------------
    def counter_total(self, strict: bool = False) -> DataFrame:
        """Counter state: running sum per series.

        strict=True mirrors the reference's hard error on negative
        input (prometheus.cpp:209-212); strict=False drops them (the
        batch-friendly form — a poisoned row shouldn't fail a 100 TB
        job; dropped rows are countable via `observed`).
        """
        s = self._samples
        if strict:
            n_neg = s.filter(F.col("value") < 0).limit(1).count()
            if n_neg:
                raise NegativeIncrementError(
                    "Prometheus Increment should be a positive number"
                )
        return (
            s.filter(F.col("value") >= 0)
            .groupBy(*SERIES_KEY)
            .agg(F.sum("value").alias("total"))
        )

    # -- gauge -----------------------------------------------------------
    def gauge_last(self) -> DataFrame:
        """Gauge state: last write per series (prometheus.cpp:248-251)."""
        w = Window.partitionBy(*SERIES_KEY).orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        return (
            self._samples.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(*SERIES_KEY, F.col("value").alias("last"))
        )

    # -- histogram -------------------------------------------------------
    def histogram(self, bounds: list[float]) -> DataFrame:
        """Histogram state: cumulative le counts + _sum/_count per
        series, with explicit static bounds (prometheus.cpp:264-293).

        Bounds are validated at build time like the reference's
        per-element float assertion (prometheus.cpp:266-267), plus
        strictly-increasing order (prometheus-cpp requires sorted
        BucketBoundaries, public)."""
        if not bounds:
            raise ValueError("histogram requires at least one bound")
        vals = [float(b) for b in bounds]
        if any(b >= a for b, a in zip(vals, vals[1:])):
            raise ValueError(f"bounds must be strictly increasing: {vals}")
        idx = None
        for i, b in enumerate(bounds):
            cond = F.col("value") <= F.lit(float(b))
            idx = F.when(cond, i) if idx is None else idx.when(cond, i)
        idx = idx.otherwise(len(bounds)).alias("bucket_idx")
        le = F.element_at(
            F.array(*[F.lit(f"{b:g}") for b in bounds] + [F.lit("+Inf")]),
            F.col("bucket_idx") + 1,
        )
        counts = (
            self._samples.select(*SERIES_KEY, idx)
            .groupBy(*SERIES_KEY, "bucket_idx")
            .agg(F.count(F.lit(1)).alias("bucket_count"))
        )
        w = Window.partitionBy(*SERIES_KEY).orderBy("bucket_idx")
        sums = self._samples.groupBy(*SERIES_KEY).agg(
            F.sum("value").alias("hist_sum"),
            F.count(F.lit(1)).alias("hist_count"),
        )
        return (
            counts.withColumn("le", le)
            .withColumn("cum_count", F.sum("bucket_count").over(w))
            .join(sums, SERIES_KEY)
        )

    # -- PromQL-core reads (parameterized; the fixed-window queries()
    #    entries exist for oracle determinism, these are the general
    #    user API) ------------------------------------------------------
    def increase(self, window_s: int = 3600) -> DataFrame:
        """PromQL ``increase(…[window])``: per-metric counter growth per
        aligned window, with reset clamping (a decrease contributes the
        post-reset value — the decrease the reference's guard forbids,
        prometheus.cpp:209-212)."""
        w = Window.partitionBy(*SERIES_KEY).orderBy("ts_us", "event_id")
        bucket = (
            F.expr(f"ts_us div {int(window_s) * 1_000_000}")
            * int(window_s)
        ).alias("window_ts")
        prev = F.lag("value").over(w)
        return (
            self._samples.withColumn("prev", prev)
            .filter(F.col("prev").isNotNull())
            .withColumn(
                "delta",
                F.when(F.col("value") < F.col("prev"), F.col("value"))
                .otherwise(F.col("value") - F.col("prev")),
            )
            .groupBy("metric", bucket)
            .agg(F.sum("delta").alias("increase"))
        )

    def rate(self, window_s: int = 3600) -> DataFrame:
        """PromQL ``rate``: increase / window seconds."""
        return self.increase(window_s).select(
            "metric",
            "window_ts",
            (F.col("increase") / F.lit(float(window_s))).alias("rate"),
        )

    def instant(self, at_ts_us: int, lookback_us: int = 300_000_000) -> DataFrame:
        """Instant-vector selector: latest sample per series at
        evaluation time, within the staleness lookback."""
        w = Window.partitionBy(*SERIES_KEY).orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        return (
            self._samples.filter(
                (F.col("ts_us") <= at_ts_us)
                & (F.col("ts_us") > at_ts_us - lookback_us)
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(*SERIES_KEY, "ts_us", "value")
        )

    def top_k(self, k: int) -> DataFrame:
        """PromQL ``topk(k, sum by (series)(…))``."""
        totals = self.counter_total()
        w = Window.orderBy(F.desc("total"), *SERIES_KEY)
        return (
            totals.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= int(k))
        )

    # -- exposer read path ----------------------------------------------
    def snapshot(self, bounds: list[float]) -> DataFrame:
        """Registry::Collect() analog (prometheus.cpp:80): one tall
        exposition relation over all three kinds."""
        counters = self.counter_total().select(
            F.lit("counter").alias("kind"),
            *SERIES_KEY,
            F.lit("total").alias("stat"),
            F.col("total").alias("value"),
        )
        gauges = self.gauge_last().select(
            F.lit("gauge").alias("kind"),
            *SERIES_KEY,
            F.lit("last").alias("stat"),
            F.col("last").alias("value"),
        )
        hist = self.histogram(bounds).select(
            F.lit("histogram").alias("kind"),
            *SERIES_KEY,
            F.concat(F.lit("le_"), F.col("le")).alias("stat"),
            F.col("cum_count").cast("double").alias("value"),
        )
        return counters.unionByName(gauges).unionByName(hist)


def observed(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Pass-through instrumentation: the reference's activate contract
    (return input unchanged, prometheus.cpp:92,213,250,304) as
    `df.observe`. Returns (same rows, observation handle); after an
    action on the returned DataFrame, ``obs.get`` carries counter-style
    aggregates without a second scan."""
    obs = Observation(name)
    tapped = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value") >= 0, F.col("value"))).alias("sum_pos"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("n_negative"),
    )
    return tapped, obs
