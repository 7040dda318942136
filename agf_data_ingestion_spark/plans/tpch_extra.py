"""Additional TPC-H-shaped relational queries (adapted to the driver's
star schema, which has no partsupp table): bidirectional nation trade
flows, grouped HAVING, scalar-subquery comparisons, correlated min-per-
group.  These exercise join/aggregation shapes the reference never needed
but any analytics engine replacing it must supply (SURVEY.md §2.6 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, bdim, dsum, o_dsum, t

# ---------------------------------------------------------------------------
# Q7-style: trade volume between two nations, by direction and year
# ---------------------------------------------------------------------------


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bdim(c), o.o_custkey == c.c_custkey)
        .join(bdim(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .filter(
            (
                (F.col("cust_nation") == "NATION_3") & (F.col("supp_nation") == "NATION_7")
            )
            | ((F.col("cust_nation") == "NATION_7") & (F.col("supp_nation") == "NATION_3"))
        )
    )
    return joined.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


_Q7_SQL = f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
"""


# ---------------------------------------------------------------------------
# Q10-style: top 20 customers by returned-item revenue in a quarter
# ---------------------------------------------------------------------------


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bdim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q18-style: orders whose total quantity exceeds a threshold (HAVING)
# ---------------------------------------------------------------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 120.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(bdim(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {o_dsum('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {o_dsum('l_quantity')} > 120.0
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Q22-style: well-funded customers with no recent orders (scalar subquery + anti)
# ---------------------------------------------------------------------------


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    # scalar subquery: average positive balance, exact decimal avg -> double
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


_Q22_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
"""


# ---------------------------------------------------------------------------
# Q2-style: cheapest part per type (correlated min-per-group)
# ---------------------------------------------------------------------------


def q2_cheapest_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
    )


_Q2_SQL = """
SELECT p_type, p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = part.p_type)
"""


# ---------------------------------------------------------------------------
# Q6-style, through the SQL API: the engine's spark.sql surface
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implemented via ``spark.sql`` over registered temp views — the same
    catalog plan is reachable through either API (Catalyst compiles both to
    the identical physical plan)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE)
                 AS forecast_revenue,
               COUNT(*) AS n_lines
        FROM v_lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24.0
        """
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE)
         AS forecast_revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


QUERIES: dict[str, QuerySpec] = {
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, _Q6_SQL, ("OP-AGG-SUM", "OP-FIL-TIME")),
    "q7_nation_trade": QuerySpec(q7_nation_trade, _Q7_SQL, ("OP-JOIN-ENRICH", "OP-AGG-SUM")),
    "q10_returned_revenue": QuerySpec(
        q10_returned_revenue, _Q10_SQL, ("OP-JOIN-ENRICH", "OP-SORT-LIMIT", "OP-FIL-CHOICE")
    ),
    "q18_large_orders": QuerySpec(q18_large_orders, _Q18_SQL, ("OP-AGG-SUM", "OP-JOIN-ENRICH")),
    "q22_idle_rich_customers": QuerySpec(
        q22_idle_rich_customers, _Q22_SQL, ("OP-JOIN-ANTI-S3", "OP-MATH")
    ),
    "q2_cheapest_per_type": QuerySpec(q2_cheapest_per_type, _Q2_SQL, ("OP-WIN-DEDUPNAME",)),
}
