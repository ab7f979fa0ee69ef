"""TPC-H-shaped analytics queries, part 2: the remaining 12 canonical
shapes (q2, q7, q8, q9, q11, q13, q15, q16, q17, q20, q21, q22).

Like operators/tpch.py, these exist because the reference engine has no
join machinery at all (SURVEY.md §2a "explicit absences") while a
complete analytics engine at 100 TB is mostly joins + aggregates. Each
query keeps its canonical TPC-H *shape* — the join tree, the correlated
/ scalar subquery pattern, the distinct-agg, the anti-join — adapted
where the driver schema lacks a column (no partsupp table, no
l_commitdate / l_receiptdate / c_phone / p_container / p_mfgr):

- q2  min-cost supplier per part — argmin-per-group; the per-(part,
  supplier) price relation is derived from lineitem (no partsupp).
- q7  volume shipping between two nations — double nation join on both
  the customer and supplier axes.
- q8  national market share — 7-table join + conditional-share agg.
- q9  product-type profit — profit per (supplier nation, year) with a
  pseudo supply cost of 0.5 × p_retailprice (no ps_supplycost).
- q11 important stock — global scalar-subquery threshold over a
  grouped value relation.
- q13 customer order-count distribution — left outer join with an
  ON-clause filter, then a histogram of group sizes.
- q15 top supplier — scalar max over an aggregated revenue relation.
- q16 supplier count per (brand, type, size) — COUNT(DISTINCT) over a
  join (supplier set from lineitem, no partsupp).
- q17 small-quantity revenue — correlated per-part AVG threshold.
- q20 part promotion — nested agg → IN semi-join on suppliers.
- q21 waiting orders — multi-supplier orders whose latest shipment has
  a sole responsible supplier ("late" keys on l_shipdate; the driver
  schema has no commit/receipt dates).
- q22 dormant high-balance customers — scalar AVG subquery + NOT
  EXISTS anti-join (dormant = no order in the trailing 18 months; the
  sf0.01 corpus has no order-less customers at all).

Scale notes: dims (region, nation, supplier, part at 2k rows/SF·20k)
broadcast; fact-fact joins (lineitem↔orders) shuffle on the order key;
every scalar-subquery threshold is a 1-row aggregate joined by
broadcast — no corpus-sized collect anywhere. Money aggregates follow
tpch.py's rounding discipline (2-decimal inputs, ROUND at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import dround, load_table

Q2_TYPE, Q2_MAX_SIZE = "STANDARD", 10
Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_FROM, Q7_TO = "1996-01-01", "1998-01-01"
Q8_REGION, Q8_TYPE, Q8_NATION = "ASIA", "ECONOMY", "NATION_3"
Q9_NAME_PREFIX = "red "
Q9_COST_FACTOR = 0.5
Q11_REGION, Q11_FRACTION = "EUROPE", 0.001
Q13_EXCLUDED_PRIORITY = "1-URGENT"
Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"
Q16_EXCL_BRAND, Q16_EXCL_TYPE = "Brand#1", "PROMO"
Q16_SIZES = [1, 4, 9, 16, 25, 36, 49]
Q17_BRAND = "Brand#5"
Q20_PREFIX, Q20_FROM, Q20_TO, Q20_MIN_QTY = "red ", "1996-01-01", "1997-01-01", 100
Q21_TOP_N = 10
Q22_CUTOFF = "2000-02-01"


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 SHAPE — min-cost supplier per qualifying part (argmin per
    group). The per-(part, supplier) unit-price relation is derived
    from lineitem (the driver schema has no partsupp); ties break on
    the smaller s_suppkey, matching the oracle's ORDER BY."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    )
    supp = load_table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "unit_price"
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_price"), F.asc("l_suppkey")
    )
    best = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return best.join(
        F.broadcast(supp), best.l_suppkey == supp.s_suppkey
    ).select(
        "p_partkey",
        "p_name",
        "s_name",
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "unit_price",
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 — volume shipping between two nations: the double nation
    join (supplier axis and customer axis), revenue per
    (supp_nation, cust_nation, year)."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q7_FROM)) & (F.col("l_shipdate") < _ts(Q7_TO))
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A)
        & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B)
        & (F.col("cust_nation") == Q7_NATION_A)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 — national market share: 7-table join tree, then one
    conditional-share aggregate per order year."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    )
    cust_nation = F.broadcast(
        nation.join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = load_table(spark, sf_dir, "customer").join(
        cust_nation, F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 SHAPE — product-type profit by (supplier nation, year). The
    supply cost is 0.5 × p_retailprice (no ps_supplycost in the driver
    schema); the join tree and the name-LIKE part filter are q9's."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q9_NAME_PREFIX)
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        Q9_COST_FACTOR
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 SHAPE — important stock: per-part value from one region's
    suppliers, kept where value > fraction × total. The threshold is a
    1-row aggregate joined back by broadcast (never a collect)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q11_REGION
    )
    supp_keys = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    value = (
        li.join(supp_keys, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("value")
        )
    )
    threshold = value.agg(
        (F.lit(Q11_FRACTION) * F.sum("value")).alias("_thr")
    )
    return (
        value.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thr"))
        .select("l_partkey", "value")
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 — customer order-count distribution: LEFT OUTER join with
    an ON-clause predicate (so order-less customers keep count 0),
    then a histogram of the per-customer counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 — top supplier: quarterly revenue per supplier, keep the
    max (scalar-subquery max as a broadcast 1-row aggregate; rounding
    BEFORE the max comparison mirrors the oracle exactly)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q15_FROM)) & (F.col("l_shipdate") < _ts(Q15_TO))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("s_suppkey"),
            "s_name",
            "total_revenue",
        )
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 SHAPE — supplier count per (brand, type, size):
    COUNT(DISTINCT) over the part join, with NOT-IN / <> exclusion
    filters pushed to the broadcast part side (supplier set derived
    from lineitem; no partsupp in the driver schema)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(Q16_SIZES)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 — small-quantity-order revenue: the correlated per-part
    AVG threshold becomes an aggregate relation joined back (broadcast
    — part-sized, not lineitem-sized). Threshold rounded to 6dp in
    both engines so the < comparison is decided identically."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND
    )
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(F.lit(0.2) * F.avg("l_quantity"), 6).alias("qty_thr")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(thr), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly")
        )
    )


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 SHAPE — part promotion: suppliers who shipped more than a
    threshold quantity of the target parts in the window; the nested
    aggregate feeds an IN-list semi-join on supplier."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_PREFIX)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q20_FROM)) & (F.col("l_shipdate") < _ts(Q20_TO))
    )
    supp = load_table(spark, sf_dir, "supplier")
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    return supp.join(
        qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 SHAPE — suppliers who kept orders waiting: finished orders
    with ≥2 distinct suppliers where exactly ONE supplier owns the
    latest ship date ("late" keys on l_shipdate; the driver schema has
    no commit/receipt dates). The canonical EXISTS / NOT-EXISTS pair
    becomes two aggregate levels — per-(order, supplier) max, then a
    per-order winner count — all decided on exact timestamp equality."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    f = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = f.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.max("s_max").alias("o_max"),
        F.count(F.lit(1)).alias("ns"),
    )
    winners = (
        per_supp.join(per_order, "l_orderkey")
        .filter((F.col("s_max") == F.col("o_max")) & (F.col("ns") >= 2))
    )
    sole = (
        winners.withColumn(
            "n_winners", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey"))
        )
        .filter(F.col("n_winners") == 1)
    )
    numwait = sole.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    w = Window.orderBy(F.desc("numwait"), F.asc("s_name"))
    return (
        numwait.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= Q21_TOP_N)
        .select("s_name", "numwait", "rk")
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 SHAPE — dormant high-balance customers per nation: scalar
    AVG subquery (broadcast 1-row agg) + NOT EXISTS anti-join
    (dormant = no order on/after the cutoff; at sf0.01 every customer
    has SOME order, so the pure no-order predicate is vacuous)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts(Q22_CUTOFF)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


QUERIES = {
    "tpch_q2": tpch_q2,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q11": tpch_q11,
    "tpch_q13": tpch_q13,
    "tpch_q15": tpch_q15,
    "tpch_q16": tpch_q16,
    "tpch_q17": tpch_q17,
    "tpch_q20": tpch_q20,
    "tpch_q21": tpch_q21,
    "tpch_q22": tpch_q22,
}

_Q16_SIZE_LIST = ", ".join(str(s) for s in Q16_SIZES)

ORACLES = {
    "tpch_q2": (
        "WITH ps AS (SELECT l_partkey, l_suppkey, "
        "ROUND(AVG(l_extendedprice / l_quantity), 4) AS unit_price "
        "FROM lineitem GROUP BY 1, 2), "
        "best AS (SELECT p_partkey, p_name, l_suppkey, unit_price, "
        "ROW_NUMBER() OVER (PARTITION BY p_partkey "
        "ORDER BY unit_price ASC, l_suppkey ASC) AS rk "
        "FROM part JOIN ps ON p_partkey = l_partkey "
        f"WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}) "
        "SELECT p_partkey, p_name, s_name, ROUND(s_acctbal, 2) AS s_acctbal, "
        "unit_price FROM best JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE rk = 1"
    ),
    "tpch_q7": (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "EXTRACT(year FROM l_shipdate) AS l_year, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        f"WHERE ((sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}') "
        f"OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}')) "
        f"AND l_shipdate >= TIMESTAMP '{Q7_FROM} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q7_TO} 00:00:00' "
        "GROUP BY 1, 2, 3"
    ),
    "tpch_q8": (
        "SELECT EXTRACT(year FROM o_orderdate) AS o_year, "
        + dround(
            f"SUM(CASE WHEN sn.n_name = '{Q8_NATION}' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
            "/ SUM(l_extendedprice * (1 - l_discount))",
            6,
        )
        + " AS mkt_share "
        "FROM lineitem l "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
        "JOIN region r ON cn.n_regionkey = r.r_regionkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        f"WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}' "
        "GROUP BY 1"
    ),
    "tpch_q9": (
        "SELECT sn.n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount) "
        f"- {Q9_COST_FACTOR} * p_retailprice * l_quantity), 2) AS sum_profit "
        "FROM lineitem l "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        f"WHERE p.p_name LIKE '{Q9_NAME_PREFIX}%' "
        "GROUP BY 1, 2"
    ),
    "tpch_q11": (
        "WITH v AS (SELECT l_partkey, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS value "
        "FROM lineitem "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        f"WHERE r_name = '{Q11_REGION}' GROUP BY 1) "
        "SELECT l_partkey, value FROM v "
        f"WHERE value > (SELECT {Q11_FRACTION} * SUM(value) FROM v)"
    ),
    "tpch_q13": (
        "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
        "SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        f"AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}' "
        "GROUP BY c_custkey) GROUP BY c_count"
    ),
    "tpch_q15": (
        "WITH rev AS (SELECT l_suppkey, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q15_TO} 00:00:00' GROUP BY 1) "
        "SELECT s_suppkey, s_name, total_revenue "
        "FROM rev JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)"
    ),
    "tpch_q16": (
        "SELECT p_brand, p_type, p_size, "
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}' "
        f"AND p_size IN ({_Q16_SIZE_LIST}) "
        "GROUP BY 1, 2, 3"
    ),
    "tpch_q17": (
        "SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly "
        "FROM lineitem l "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN (SELECT l_partkey AS t_partkey, "
        "ROUND(0.2 * AVG(l_quantity), 6) AS qty_thr "
        "FROM lineitem GROUP BY 1) t ON l.l_partkey = t.t_partkey "
        f"WHERE p.p_brand = '{Q17_BRAND}' AND l.l_quantity < t.qty_thr"
    ),
    "tpch_q20": (
        "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN ("
        "SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE p_name LIKE '{Q20_PREFIX}%' "
        f"AND l_shipdate >= TIMESTAMP '{Q20_FROM} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q20_TO} 00:00:00' "
        f"GROUP BY 1 HAVING SUM(l_quantity) > {Q20_MIN_QTY})"
    ),
    "tpch_q21": (
        "WITH f AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'), "
        "per_supp AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS s_max "
        "FROM f GROUP BY 1, 2), "
        "per_order AS (SELECT l_orderkey, MAX(s_max) AS o_max, "
        "COUNT(*) AS ns FROM per_supp GROUP BY 1), "
        "winners AS (SELECT per_supp.l_orderkey, l_suppkey FROM per_supp "
        "JOIN per_order ON per_supp.l_orderkey = per_order.l_orderkey "
        "WHERE s_max = o_max AND ns >= 2), "
        "sole AS (SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey FROM winners "
        "GROUP BY 1 HAVING COUNT(*) = 1), "
        "numwait AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait "
        "FROM sole GROUP BY 1) "
        "SELECT s_name, numwait, CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT s_name, numwait, ROW_NUMBER() OVER "
        "(ORDER BY numwait DESC, s_name ASC) AS rk "
        "FROM numwait JOIN supplier ON l_suppkey = s_suppkey) "
        f"WHERE rk <= {Q21_TOP_N}"
    ),
    "tpch_q22": (
        "SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust, "
        "ROUND(SUM(c_acctbal), 2) AS totacctbal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer "
        "WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        f"AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00') "
        "GROUP BY 1"
    ),
}
