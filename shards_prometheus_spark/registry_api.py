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

from shards_prometheus_spark.functions.labelset import label_col, label_str

#: Output identity columns every registry read carries: the metric
#: name, the FULL label map, and the flattened primary label (oracle-
#: friendly projection kept for single-label consumers).
SERIES_KEY = ["metric", "label_user"]

#: Internal grouping spine: metric + the canonical sorted k=v
#: rendering of the WHOLE label map (maps aren't groupable columns;
#: the canonical string is, and is deterministic across engines).
_SERIES_COLS = ["metric", "_series"]


class NegativeIncrementError(ValueError):
    """Raised in strict mode for negative counter increments
    (reference behavior: prometheus.cpp:209-212 errors the wire)."""


class MetricsRegistry:
    """A declarative metric registry over a tall samples relation.

    Series identity is the FULL label map (SURVEY §1.2 generalizes the
    reference's single Label/Value pair, prometheus.cpp:105-110): every
    state read groups/partitions on (metric, canonical-label-string),
    so series differing in ANY label key are distinct. Single-label
    relations (a flat `label_user` column, the reference's shape) are
    normalized on the way in — `labels := map('user', label_user)` —
    so both models flow through one spine (functions.labelset, shared
    with the PromQL evaluator's matchers)."""

    def __init__(self, samples: DataFrame):
        cols = set(samples.columns)
        if "labels" not in cols:
            samples = samples.withColumn(
                "labels",
                F.create_map(
                    F.lit("user"),
                    F.coalesce(F.col("label_user"), F.lit("")),
                ),
            )
        elif "label_user" in cols:
            # a labels-bearing relation may carry NULL-map rows (the
            # scrape loop's stale markers ride flattened): normalize
            # them to their user/le pair map so series identity stays
            # one spine
            samples = samples.withColumn(
                "labels",
                F.coalesce(
                    F.col("labels"),
                    F.map_filter(
                        F.create_map(
                            F.lit("user"),
                            F.col("label_user"),
                            *(
                                [F.lit("le"), F.col("le")]
                                if "le" in cols
                                else []
                            ),
                        ),
                        lambda _k, v: v.isNotNull(),
                    ),
                ),
            )
        if "label_user" not in cols:
            samples = samples.withColumn("label_user", label_col("user"))
        self._samples = samples

    @property
    def samples(self) -> DataFrame:
        return self._samples

    def _series(self) -> DataFrame:
        """Samples plus the canonical series-identity string. A row
        carrying a `_series_str` column (a stale marker for a
        multi-label series — the marker's flattened pair cannot
        reconstruct the full map) keeps its carried key."""
        series = label_str("labels")
        if "_series_str" in self._samples.columns:
            series = F.coalesce(F.col("_series_str"), series)
        return self._samples.withColumn("_series", series)

    def ingest(self, more: DataFrame) -> "MetricsRegistry":
        """Append a batch (the activate path, prometheus.cpp:212)."""
        more = MetricsRegistry(more)._samples
        return MetricsRegistry(
            self._samples.unionByName(more, allowMissingColumns=True)
        )

    # -- counter ---------------------------------------------------------
    def counter_total(self, strict: bool = False) -> DataFrame:
        """Counter state: running sum per series.

        strict=True mirrors the reference's hard error on negative
        input (prometheus.cpp:209-212); strict=False drops them (the
        batch-friendly form — a poisoned row shouldn't fail a 100 TB
        job; dropped rows are countable via `observed`).
        """
        s = self._series()
        if strict:
            n_neg = s.filter(F.col("value") < 0).limit(1).count()
            if n_neg:
                raise NegativeIncrementError(
                    "Prometheus Increment should be a positive number"
                )
        return (
            s.filter(F.col("value") >= 0)
            .groupBy(*_SERIES_COLS)
            .agg(
                F.first("labels").alias("labels"),
                F.first("label_user").alias("label_user"),
                F.sum("value").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n_samples"),
            )
            .select("metric", "labels", "label_user", "total", "n_samples")
        )

    # -- gauge -----------------------------------------------------------
    def gauge_last(self) -> DataFrame:
        """Gauge state: last write per series (prometheus.cpp:248-251)."""
        w = Window.partitionBy(*_SERIES_COLS).orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        return (
            self._series().withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "metric",
                "labels",
                "label_user",
                F.col("value").alias("last"),
                "ts_us",
            )
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
        s = self._series()
        counts = (
            s.select(*_SERIES_COLS, "labels", "label_user", idx)
            .groupBy(*_SERIES_COLS, "bucket_idx")
            .agg(
                F.first("labels").alias("labels"),
                F.first("label_user").alias("label_user"),
                F.count(F.lit(1)).alias("bucket_count"),
            )
        )
        w = Window.partitionBy(*_SERIES_COLS).orderBy("bucket_idx")
        sums = s.groupBy(*_SERIES_COLS).agg(
            F.sum("value").alias("hist_sum"),
            F.count(F.lit(1)).alias("hist_count"),
        )
        return (
            counts.withColumn("le", le)
            .withColumn("cum_count", F.sum("bucket_count").over(w))
            .join(sums, _SERIES_COLS)
            .drop("_series")
        )

    # -- PromQL-core reads (parameterized; the fixed-window queries()
    #    entries exist for oracle determinism, these are the general
    #    user API) ------------------------------------------------------
    def increase(self, window_s: int = 3600) -> DataFrame:
        """PromQL ``increase(…[window])``: per-metric counter growth per
        aligned window, with reset clamping (a decrease contributes the
        post-reset value — the decrease the reference's guard forbids,
        prometheus.cpp:209-212)."""
        w = Window.partitionBy(*_SERIES_COLS).orderBy("ts_us", "event_id")
        bucket = (
            F.expr(f"ts_us div {int(window_s) * 1_000_000}")
            * int(window_s)
        ).alias("window_ts")
        prev = F.lag("value").over(w)
        return (
            self._series().withColumn("prev", prev)
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

    def instant(
        self,
        at_ts_us: int | None = None,
        lookback_us: int = 300_000_000,
        offset_us: int = 0,
    ) -> DataFrame:
        """Instant-vector selector: latest sample per series at
        evaluation time, within the staleness lookback.

        at_ts_us=None derives T = max(ts) from the data via a 1-row
        broadcast cross join (never a driver collect), so the same
        query text is meaningful at every scale factor; ``offset_us``
        shifts T back (PromQL ``offset``).

        Staleness markers: if the samples relation carries a ``stale``
        boolean column (the scrape loop's `scraped_with_staleness`),
        the selector picks the newest in-lookback sample per series
        INCLUDING markers, then drops series whose pick is a marker —
        upstream's cut-lookback-at-StaleNaN rule (a dead series
        disappears at the next scrape, not after the lookback)."""
        has_stale = "stale" in self._samples.columns
        w = Window.partitionBy(*_SERIES_COLS).orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        s = self._series()
        if at_ts_us is None:
            t_eval = s.agg(
                (F.max("ts_us") - F.lit(offset_us)).alias("t_eval")
            )
            s = s.join(F.broadcast(t_eval))
        else:
            s = s.withColumn(
                "t_eval", F.lit(int(at_ts_us) - int(offset_us))
            )
        out = (
            s.filter(
                (F.col("ts_us") <= F.col("t_eval"))
                & (F.col("ts_us") > F.col("t_eval") - F.lit(lookback_us))
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        if has_stale:
            out = out.filter(
                ~F.coalesce(F.col("stale"), F.lit(False))
            )
        return out.select(
            "metric", "labels", "label_user", "ts_us", "value"
        )

    def top_k(self, k: int) -> DataFrame:
        """PromQL ``topk(k, sum by (series)(…))``."""
        totals = self.counter_total()
        w = Window.orderBy(
            F.desc("total"), F.col("metric"), label_str("labels")
        )
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
