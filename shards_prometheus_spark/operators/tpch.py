"""TPC-H-shaped analytics queries over the driver's star schema.

The reference has no joins at all (SURVEY.md §2a "explicit absences");
these queries exist to exercise — and benchmark — the join/agg
machinery a complete analytics engine needs at 100 TB:

- q1: pricing summary — the canonical wide scan + hash aggregate
  (map-side combine; no join);
- q3: shipping priority — selective dim filter → fact join → top-k
  (broadcast the filtered customer side);
- q5: local supplier volume — the 6-table join tree (region→nation→
  customer/supplier→orders→lineitem); small dims broadcast, the two
  fact relations join on their natural keys.

Date literals target the driver data's 1995–2001 range. All money
aggregates ROUND(…,2): inputs have 2-decimal precision, magnitudes
≤1e10, so float noise (~1e-5 absolute) can't straddle a half-cent
boundary at the 2-decimal rounding grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import dround, load_table

Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-03-15"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1997-01-01"
Q3_TOP_N = 10


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (scan + hash aggregate, no join)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: filtered dim → fact joins → top-10 revenue."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp_ntz")
    )
    revenue = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        joined.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= Q3_TOP_N)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
            "rk",
        )
    )


Q6_FROM, Q6_TO = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY = 24


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: the pure pushdown query — every
    predicate reaches the parquet scan (range on shipdate, band on
    discount, bound on quantity), one map-side-combined aggregate,
    zero shuffled rows beyond partial sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp_ntz"))
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: the 6-table join tree, dims broadcast."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q5_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    # TPC-H q5 requires customer and supplier in the SAME nation.
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nr), supp.s_nationkey == nr.n_nationkey)
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return joined.groupBy("n_name").agg(
        F.round(revenue, 2).alias("revenue")
    )


Q10_FROM, Q10_TO = "1996-01-01", "1996-04-01"
Q10_TOP_N = 20
Q18_MIN_QTY = 180


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (q10 shape): revenue lost to returns per
    customer over a quarter — fact⋈fact on the order key with the
    customer/nation dims broadcast, top-20 by revenue."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # exact integer-cents arithmetic: price and discount are 2-decimal,
    # so the per-item revenue is an exact integer in 10^-4 dollars and
    # the SUM is order-independent — this group count is large enough
    # that float accumulation would otherwise straddle half-cent
    # rounding boundaries between engines
    pe = F.round(F.col("l_extendedprice") * 100).cast("long")
    pd = F.round((1 - F.col("l_discount")) * 100).cast("long")
    revenue = F.sum(pe * pd) / 10_000.0
    grouped = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        grouped.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= Q10_TOP_N)
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (q18 shape): orders whose total quantity
    exceeds the threshold — the aggregate-then-semi-join pattern (the
    HAVING relation is small and broadcasts back against the facts)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


Q4_QTY = 45.0
Q12_FROM, Q12_TO = "1996-01-01", "1997-01-01"
Q14_FROM, Q14_TO = "1996-01-01", "1997-01-01"
#: (brand, qty_lo, qty_hi) disjuncts for the q19 shape
Q19_BANDS = [
    ("Brand#11", 1.0, 11.0),
    ("Brand#12", 10.0, 20.0),
    ("Brand#13", 20.0, 30.0),
]


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 SHAPE — EXISTS → left-semi join → priority counts. (The
    driver schema has no commit/receipt dates, so the EXISTS predicate
    is a quantity threshold; the plan shape — dedup-free semi join,
    then a tiny hash aggregate — is what q4 exercises.)"""
    orders = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= Q4_QTY
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 SHAPE — fact-fact join + dual conditional counts per group
    (no l_shipmode in the driver schema; the urgent/non-urgent split
    keys on o_orderpriority instead)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q12_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q12_TO).cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 — promo revenue share: broadcast part dim, one global
    conditional aggregate."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp_ntz"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo) / F.sum(disc), 4
            ).alias("promo_revenue_pct")
        )
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 — disjunctive brand/quantity-band predicates across the
    part join; one revenue row. The OR of ANDs stays a single join
    predicate (no union of scans)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = None
    for brand, lo, hi in Q19_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
        )
        cond = c if cond is None else (cond | c)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(disc), 2).alias("revenue"))
    )


QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q10": tpch_q10,
    "tpch_q18": tpch_q18,
    "tpch_q4": tpch_q4,
    "tpch_q12": tpch_q12,
    "tpch_q14": tpch_q14,
    "tpch_q19": tpch_q19,
}

_Q19_SQL_COND = " OR ".join(
    f"(p_brand = '{b}' AND l_quantity >= {lo} AND l_quantity <= {hi})"
    for b, lo, hi in Q19_BANDS
)

ORACLES = {
    "tpch_q4": (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count "
        "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem "
        f"WHERE l_orderkey = o_orderkey AND l_quantity >= {Q4_QTY}) "
        "GROUP BY o_orderpriority"
    ),
    "tpch_q12": (
        "SELECT l_returnflag, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE l_shipdate >= TIMESTAMP '{Q12_FROM} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q12_TO} 00:00:00' "
        "GROUP BY l_returnflag"
    ),
    "tpch_q14": (
        "SELECT "
        + dround(
            "100.0 * SUM(CASE WHEN p_type = 'PROMO' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
            "/ SUM(l_extendedprice * (1 - l_discount))",
            4,
        )
        + " AS promo_revenue_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q14_TO} 00:00:00'"
    ),
    "tpch_q19": (
        "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) "
        "AS revenue FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE {_Q19_SQL_COND}"
    ),
    "tpch_q6": (
        "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue, "
        "CAST(COUNT(*) AS BIGINT) AS n_items FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q6_TO} 00:00:00' "
        f"AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI} "
        f"AND l_quantity < {Q6_QTY}"
    ),
    "tpch_q1": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "ROUND(AVG(l_quantity), 4) AS avg_qty, "
        "ROUND(AVG(l_extendedprice), 4) AS avg_price, "
        "ROUND(AVG(l_discount), 4) AS avg_disc, "
        "CAST(COUNT(*) AS BIGINT) AS count_order "
        f"FROM lineitem WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "tpch_q3": (
        "WITH joined AS (SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        f"WHERE c.c_mktsegment = '{Q3_SEGMENT}' "
        f"AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00' "
        f"AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority) "
        "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
        "o_orderpriority, revenue, CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rk "
        f"FROM joined) WHERE rk <= {Q3_TOP_N}"
    ),
    "tpch_q5": (
        "SELECT n.n_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "AND c.c_nationkey = s.s_nationkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        f"WHERE r.r_name = '{Q5_REGION}' "
        f"AND o.o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00' "
        f"AND o.o_orderdate < TIMESTAMP '{Q5_TO} 00:00:00' "
        "GROUP BY n.n_name"
    ),
    "tpch_q10": (
        "WITH g AS (SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name, "
        + dround(
            "SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(ROUND((1 - l.l_discount) * 100) AS BIGINT)) / 10000.0",
            2,
        )
        + " AS revenue "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE l.l_returnflag = 'R' "
        f"AND o.o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00' "
        f"AND o.o_orderdate < TIMESTAMP '{Q10_TO} 00:00:00' "
        "GROUP BY 1, 2, 3, 4) "
        "SELECT c_custkey, c_name, c_acctbal, n_name, revenue, "
        "CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC) "
        f"AS rk FROM g) WHERE rk <= {Q10_TOP_N}"
    ),
    "tpch_q18": (
        "WITH big AS (SELECT l_orderkey, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem "
        f"GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 2) > {Q18_MIN_QTY}) "
        "SELECT c.c_name, c.c_custkey, o.o_orderkey, "
        "strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, "
        "ROUND(o.o_totalprice, 2) AS o_totalprice, big.sum_qty "
        "FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey"
    ),
}
