"""Mergeable sketches beyond HLL (SURVEY §2 C#23).

The reference wraps prometheus-cpp accumulators (prometheus.cpp:177-306)
and derives quantiles at query time from explicit buckets; at the
100 TB north-star scale the same role is played by mergeable sketches.
Two DETERMINISTIC sketches live here — unlike HLL (whose Spark/DuckDB
implementations differ by construction, aggregations.py:215), both are
pure integer/float arithmetic from a fixed spec, so each carries a real
DuckDB oracle:

- ``ddsketch_quantile``: DDSketch-style log-γ bucketed quantiles
  (relative-accuracy guarantee; the public DDSketch paper's bucket
  rule). Sketch state = (metric, bucket) counts — tiny, mergeable,
  exactly the shape a 1000-executor rollup would combine map-side.
- ``countmin_heavy_hitters``: count-min (depth 3 × width 1024, affine
  hashes mod a Mersenne prime) with min-over-rows estimates for the
  top users. Portable-hash convention of tierc_common: arithmetic over
  integers, never an engine-native hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, dround, samples

#: DDSketch relative-accuracy parameter: buckets grow by γ.
DD_GAMMA = 1.02
#: values ≤ this land in the zero bucket (DDSketch convention)
DD_ZERO_EPS = 1e-9
#: sentinel bucket index for the zero bucket (orders below all real)
DD_ZERO_IDX = -(10**9)
DD_PHIS = [0.5, 0.95, 0.99]

#: count-min: depth-3 affine hashes (a·x + b) mod P mod W.
CM_P = 2_147_483_647
CM_W = 1024
CM_PARAMS = [(0, 104_729, 7_919), (1, 130_363, 15_485), (2, 175_447, 20_359)]
CM_TOP = 10


def ddsketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric p50/p95/p99 from a DDSketch-style log-bucket sketch.

    Bucket index = ceil(ln(v)/ln(γ)) — pinned at 9dp before the ceil so
    the discrete bucket decision cannot flip on engine libm noise; the
    estimate for bucket i is the bucket midpoint 2γ^i/(γ+1). Sketch
    state is O(metrics × ~500 buckets): the count aggregation is the
    only corpus-sized pass, the quantile walk runs on the tiny sketch.
    """
    s = samples(spark, sf_dir)
    idx = (
        F.when(F.col("value") <= F.lit(DD_ZERO_EPS), F.lit(DD_ZERO_IDX))
        .otherwise(
            F.ceil(
                F.round(
                    F.log(F.col("value")) / F.log(F.lit(DD_GAMMA)), 9
                )
            )
        )
        .cast("long")
    )
    counts = (
        s.select("metric", idx.alias("idx"))
        .groupBy("metric", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = Window.partitionBy("metric").orderBy("idx")
    cum = counts.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("metric"))
    )
    phis = spark.createDataFrame([(p,) for p in DD_PHIS], "phi double")
    rank = F.floor(F.col("phi") * (F.col("n") - 1)) + 1
    hit = cum.join(F.broadcast(phis)).filter(F.col("cum") >= rank)
    pick = Window.partitionBy("metric", "phi").orderBy("idx")
    est = F.when(F.col("idx") == DD_ZERO_IDX, F.lit(0.0)).otherwise(
        F.lit(2.0)
        * F.pow(F.lit(DD_GAMMA), F.col("idx"))
        / (F.lit(DD_GAMMA) + F.lit(1.0))
    )
    return (
        hit.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("metric", "phi", F.round(est, 4).alias("est"))
    )


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by count-min estimated sample count.

    One corpus pass builds the 3×1024-cell table; the estimate probe
    joins the distinct-user relation to the (broadcast-sized) cell
    table and takes the min across depths — the classic conservative
    count-min read. Exact integer arithmetic end to end.
    """
    s = samples(spark, sf_dir)
    uid = F.col("label_user").cast("long")
    params = spark.createDataFrame(CM_PARAMS, "j int, a long, b long")
    cell = (F.col("a") * F.col("uid") + F.col("b")) % F.lit(CM_P) % F.lit(
        CM_W
    )
    cells = (
        s.select(uid.alias("uid"))
        .crossJoin(F.broadcast(params))
        .select("j", cell.alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        s.select(uid.alias("uid"))
        .distinct()
        .crossJoin(F.broadcast(params))
        .select("uid", "j", cell.alias("cell"))
    )
    est = (
        probes.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("uid")
        .agg(F.min("c").cast("long").alias("est"))
    )
    # orderBy().limit() compiles to TakeOrderedAndProject — no global
    # sort exchange; ties broken on uid for determinism
    return est.orderBy(F.desc("est"), F.asc("uid")).limit(CM_TOP)


QUERIES = {
    "ddsketch_quantile": ddsketch_quantile,
    "countmin_heavy_hitters": countmin_heavy_hitters,
}

_CM_VALUES = ", ".join(f"({j}, {a}, {b})" for j, a, b in CM_PARAMS)
_DD_PHI_VALUES = ", ".join(f"({p})" for p in DD_PHIS)

ORACLES = {
    "ddsketch_quantile": (
        f"{SAMPLES_CTE}, "
        "b AS (SELECT metric, CASE WHEN value <= 1e-9 "
        f"THEN {DD_ZERO_IDX} ELSE CAST(CEIL(ROUND("
        f"LN(value) / LN({DD_GAMMA}), 9)) AS BIGINT) END AS idx "
        "FROM samples), "
        "c AS (SELECT metric, idx, COUNT(*) AS c FROM b "
        "GROUP BY metric, idx), "
        "cum AS (SELECT metric, idx, c, "
        "SUM(c) OVER (PARTITION BY metric ORDER BY idx) AS cum, "
        "SUM(c) OVER (PARTITION BY metric) AS n FROM c), "
        f"p(phi) AS (VALUES {_DD_PHI_VALUES}), "
        "hit AS (SELECT cum.metric, p.phi, cum.idx, "
        "ROW_NUMBER() OVER (PARTITION BY cum.metric, p.phi "
        "ORDER BY cum.idx) AS rn FROM cum, p "
        "WHERE cum.cum >= FLOOR(p.phi * (cum.n - 1)) + 1) "
        "SELECT metric, CAST(phi AS DOUBLE) AS phi, "
        + dround(
            f"CASE WHEN idx = {DD_ZERO_IDX} THEN 0.0 ELSE "
            f"2.0 * POWER({DD_GAMMA}, idx) / "
            f"(CAST({DD_GAMMA} AS DOUBLE) + 1.0) END",
            4,
        )
        + " AS est FROM hit WHERE rn = 1"
    ),
    "countmin_heavy_hitters": (
        f"{SAMPLES_CTE}, "
        f"params(j, a, b) AS (VALUES {_CM_VALUES}), "
        "u AS (SELECT CAST(label_user AS BIGINT) AS uid FROM samples), "
        "cells AS (SELECT p.j, (p.a * u.uid + p.b) "
        f"% {CM_P} % {CM_W} AS cell, COUNT(*) AS c "
        "FROM u CROSS JOIN params p GROUP BY p.j, cell), "
        "du AS (SELECT DISTINCT uid FROM u), "
        "est AS (SELECT du.uid, CAST(MIN(c.c) AS BIGINT) AS est "
        "FROM du CROSS JOIN params p JOIN cells c ON c.j = p.j "
        f"AND c.cell = (p.a * du.uid + p.b) % {CM_P} % {CM_W} "
        "GROUP BY du.uid) "
        "SELECT uid, est FROM est "
        f"ORDER BY est DESC, uid ASC LIMIT {CM_TOP}"
    ),
}
