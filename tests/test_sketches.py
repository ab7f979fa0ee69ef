"""Deterministic-sketch semantics: DDSketch relative-accuracy bound
and count-min's overestimate-only guarantee, against exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from shards_prometheus_spark.model import samples
from shards_prometheus_spark.operators.sketches import (
    CM_TOP,
    DD_GAMMA,
    countmin_heavy_hitters,
    ddsketch_quantile,
)
from tests.conftest import SF_SMOKE


def test_ddsketch_relative_accuracy(spark):
    est = {
        (r["metric"], r["phi"]): r["est"]
        for r in ddsketch_quantile(spark, SF_SMOKE).collect()
    }
    # exact twin uses the sketch's own rank definition (the k-th order
    # statistic, k = floor(phi*(n-1)) + 1) — interpolated percentiles
    # can land far from ANY sample across heavy-tail gaps, which is a
    # property of interpolation, not sketch error
    from pyspark.sql import Window

    s = samples(spark, SF_SMOKE)
    w = Window.partitionBy("metric").orderBy("value")
    ranked = s.select(
        "metric",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("metric")).alias("n"),
    )
    exact = {}
    for phi in (0.5, 0.95, 0.99):
        k = F.floor(F.lit(phi) * (F.col("n") - 1)) + 1
        for r in ranked.filter(F.col("rk") == k).collect():
            exact[(r["metric"], phi)] = r["value"]
    assert set(est) == set(exact)
    for key, e in est.items():
        x = exact[key]
        if x > 1e-9:
            # γ-bucket midpoint: relative error ≤ (γ-1)/(γ+1) by the
            # DDSketch guarantee; 2(γ-1) leaves slack for the 9dp pin
            assert abs(e - x) / x < 2 * (DD_GAMMA - 1), (key, e, x)


def test_countmin_overestimates_and_ranks(spark):
    hh = countmin_heavy_hitters(spark, SF_SMOKE).collect()
    assert len(hh) == CM_TOP
    s = samples(spark, SF_SMOKE)
    exact = {
        int(r["label_user"]): r["n"]
        for r in s.groupBy("label_user")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in hh:
        # count-min never underestimates
        assert r["est"] >= exact[r["uid"]], (r, exact[r["uid"]])
    # the estimated top-1 is the true top-1 (1024 cells, light load)
    true_top = max(exact.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    assert hh[0]["uid"] == true_top


def test_sketches_merge_across_partitions(spark):
    """The 100 TB property: sketch states built per day then MERGED
    equal the sketch built globally — counts merge by addition
    (DDSketch buckets), count-min cells likewise."""
    from shards_prometheus_spark.operators.sketches import (
        DD_GAMMA,
        DD_ZERO_EPS,
        DD_ZERO_IDX,
    )

    s = samples(spark, SF_SMOKE).withColumn(
        "day", F.floor(F.col("ts_us") / F.lit(86_400_000_000))
    )
    idx = (
        F.when(F.col("value") <= F.lit(DD_ZERO_EPS), F.lit(DD_ZERO_IDX))
        .otherwise(
            F.ceil(F.round(F.log("value") / F.log(F.lit(DD_GAMMA)), 9))
        )
        .cast("long")
    )
    per_day = (
        s.select("metric", "day", idx.alias("idx"))
        .groupBy("metric", "day", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = {
        (r["metric"], r["idx"]): r["c"]
        for r in per_day.groupBy("metric", "idx")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    global_ = {
        (r["metric"], r["idx"]): r["c"]
        for r in s.select("metric", idx.alias("idx"))
        .groupBy("metric", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert merged == global_


def test_pca_power_is_near_top_eigenvector(spark):
    """Power iteration guarantees: unit norm, and a Rayleigh quotient
    that does not decrease from the init and beats the spectrum mean.
    (The synthetic embeddings are near-isotropic — lambda2/lambda1 =
    0.93 — so closeness to the exact top eigenvector is NOT a property
    3 iterations can promise and is deliberately not asserted.)"""
    import numpy as np

    from shards_prometheus_spark.model import load_table
    from shards_prometheus_spark.operators.similarity import (
        embedding_pca_power,
    )

    got = {
        r["dim"]: r["loading"]
        for r in embedding_pca_power(spark, SF_SMOKE).collect()
    }
    v = np.array([got[d] for d in sorted(got)])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    X = np.array(
        [
            r["embedding"]
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False, bias=True)
    d = C.shape[0]
    v0 = np.ones(d) / np.sqrt(d)
    rq = float(v @ C @ v)
    assert rq >= float(v0 @ C @ v0) - 1e-9
    assert rq >= np.trace(C) / d  # beats the spectrum mean
    w = np.linalg.eigvalsh(C)
    assert rq <= w[-1] + 1e-9  # bounded by the top eigenvalue
