"""The remainder of the TPC-H query-shape family, adapted to the driver's
star schema (no partsupp / l_shipmode / l_commitdate columns — where the
original query depends on one, the closest join/subquery shape over the
available columns is used instead).  Together with plans/analytics.py and
plans/tpch_extra.py this covers every TPC-H query archetype: EXISTS
semi-joins (Q4), multi-way profit rollups (Q9), conditional counts over
joins (Q12), outer-join histogram aggregation (Q13), scalar-max subquery
(Q15), distinct-count grouping (Q16), correlated per-group average (Q17),
disjunctive pushdown predicates (Q19), nested HAVING semi-chain (Q20), and
multi-predicate per-group existence attribution (Q21).

Scale notes: every per-order / per-part / per-supplier aggregation here
keys on the high-cardinality join key, so the shuffles partition evenly;
dimension joins (part, supplier, nation, customer) are broadcast to keep
the big fact scan shuffle-free until the final keyed aggregation.
Determinism follows plans/base.py: decimal-cast sums, exact integer
counts, unique sort tiebreakers before every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import (
    DEC_MONEY,
    QuerySpec,
    bdim,
    davg,
    dsum,
    o_davg,
    o_dsum,
    t,
)

# ---------------------------------------------------------------------------
# Q4-style: order-priority checking via EXISTS (late-shipment semi-join)
# ---------------------------------------------------------------------------


def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed in 1997H1 with at least one line shipped more than 30
    days after the order date, counted by priority.  The EXISTS becomes a
    left-semi join on (key, inequality) — Spark evaluates the extra
    predicate as a join residual, so the fact table is scanned once."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q9-style: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from 'red'-named parts grouped by the supplier's nation and
    ship year (profit proxy: the schema has no ps_supplycost).  Part and
    supplier/nation dimensions broadcast; the only shuffle is the final
    (nation, year) aggregation."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(bdim(p), l.l_partkey == p.p_partkey)
        .join(bdim(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_profit"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
       {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(year(l_shipdate) AS INT)
"""


# ---------------------------------------------------------------------------
# Q12-style: late lines split by order priority class (conditional counts)
# ---------------------------------------------------------------------------


def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines shipped more than 60 days after the order date during 1997,
    per linestatus: how many belonged to urgent/high-priority orders vs
    the rest (the original's shipmode axis replaced by linestatus)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13-style: customer order-count distribution (outer join → histogram)
# ---------------------------------------------------------------------------


def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by number of non-urgent orders — a left
    outer join (keeping order-less customers at c_count=0) feeding a second
    aggregation.  The first groupBy keys on c_custkey (high cardinality,
    even); the histogram regroup is tiny."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q15-style: top supplier(s) by quarterly revenue (scalar-max subquery)
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) achieving the maximum revenue in 1997Q1.  The revenue
    view is computed once and self-compared against its broadcast max —
    both engines compute the identical decimal-exact revenue, so the
    equality match is bit-faithful."""
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(bdim(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q16-style: how many distinct suppliers ship each part category
# ---------------------------------------------------------------------------


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size) for selected sizes,
    excluding one brand and the PROMO type — the partsupp association is
    derived from observed lineitem shipments.  count_distinct shuffles on
    the grouping key with the suppkey carried; cardinality stays bounded
    by |part| × suppliers-per-part."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(bdim(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17-style: revenue lost to small-quantity orders (correlated avg)
# ---------------------------------------------------------------------------


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For one brand, total revenue of lines whose quantity is below half
    the part's average quantity.  The correlated scalar subquery becomes a
    per-part aggregate joined back to the same scan; the avg is the
    deterministic decimal-sum/count divide from plans/base.py."""
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    l = t(spark, sf_dir, "lineitem")
    lp = l.join(bdim(p), l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        lp.join(bdim(avg_qty), lp.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum(F.col("l_extendedprice")).alias("small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


_Q17_SQL = f"""
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
), avg_qty AS (
  SELECT l_partkey AS a_partkey, {o_davg('l_quantity')} AS avg_qty
  FROM lp GROUP BY l_partkey
)
SELECT {o_dsum('l_extendedprice')} AS small_qty_revenue, COUNT(*) AS n_lines
FROM lp JOIN avg_qty ON l_partkey = a_partkey
WHERE l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# Q19-style: disjunctive brand/size/quantity predicate revenue
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three (brand, size-range, quantity-range) alternatives OR-ed into one
    scan — Catalyst pushes the common l_partkey join and per-branch
    predicates into a single broadcast-hash-join pass."""
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem")
    j = l.join(bdim(p), l.l_partkey == p.p_partkey)
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_Q19_SQL = f"""
SELECT {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20-style: suppliers shipping bulk volumes of a part family (HAVING chain)
# ---------------------------------------------------------------------------


def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than 300 units of 'small'-named parts
    during 1997, with their nation — the original's partsupp availability
    check becomes a shipments-derived threshold.  Aggregation keys on
    l_suppkey; supplier and nation join after reduction (tiny side)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    bulk = (
        l.join(bdim(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("qty_shipped"))
        .filter(F.col("qty_shipped") > 300.0)
    )
    return (
        bulk.join(bdim(s), bulk.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name", "qty_shipped")
    )


_Q20_SQL = f"""
SELECT s_name, n_name, qty_shipped
FROM (
  SELECT l_suppkey, {o_dsum('l_quantity')} AS qty_shipped
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING {o_dsum('l_quantity')} > 300.0
) bulk
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


# ---------------------------------------------------------------------------
# Q8-style: national market share inside a region
# ---------------------------------------------------------------------------


def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_7's share of ECONOMY-part revenue sold to ASIA-region
    customers, per order year (TPC-H Q8 verbatim shape — every table it
    needs exists in the driver schema).  The nation axis is the SUPPLIER's
    nation; the region filter applies to the CUSTOMER's nation.  All five
    dimension joins broadcast, so the fact scan reaches the final
    (o_year) aggregation with zero pre-shuffles; the share is one IEEE
    double division of two order-independent decimal sums."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").alias("n1")  # customer side → region
    n2 = t(spark, sf_dir, "nation").alias("n2")  # supplier side → share axis
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC_MONEY)
    joined = (
        l.join(bdim(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(bdim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey, "left_semi")
        .join(bdim(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.sum(F.when(F.col("n2.n_name") == "NATION_7", vol).otherwise(F.lit(0).cast(DEC_MONEY))).cast("double").alias("nation_volume"),
        F.sum(vol).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    )


_Q8_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_7' THEN vol ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
       / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) AS vol,
         n2.n_name AS nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
) shares
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q11-style: important stock (per-part value above a global-share threshold)
# ---------------------------------------------------------------------------


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue from AMERICA-region suppliers exceeds twice the
    MEAN per-part share of that market (TPC-H Q11's
    HAVING-against-a-scalar-subquery shape; the schema has no partsupp,
    so ps_supplycost*ps_availqty becomes lineitem revenue, and the
    original's 0.0001/SF fraction becomes the scale-free 2/n_parts — the
    kept-set stays non-trivial at every sf).  One shuffle on l_partkey;
    the global (total, n_parts) is a 1-row aggregate broadcast back as a
    cross join.  The threshold compare runs in EXACT decimal/integer
    arithmetic on both engines (v·n_parts > 2·total — no division, no
    rounding), so the kept-set is bit-stable; only the output column is
    cast to double."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    l = t(spark, sf_dir, "lineitem")
    amer_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey, "left_semi")
        .select("s_suppkey")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC_MONEY)
    per_part = (
        l.join(bdim(amer_supp), l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(vol).alias("v_dec"))
    )
    total = per_part.agg(
        F.sum("v_dec").alias("t_dec"), F.count("*").alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("v_dec") * F.col("n_parts") > F.col("t_dec") * F.lit(2))
        .select("l_partkey", F.col("v_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


_Q11_SQL = """
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS v_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA')
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(v_dec AS DOUBLE) AS part_value
FROM pv
WHERE v_dec * (SELECT COUNT(*) FROM pv) > (SELECT SUM(v_dec) FROM pv) * 2
ORDER BY part_value DESC, l_partkey ASC
"""


# ---------------------------------------------------------------------------
# Q21-style: the one supplier to blame per multi-supplier order
# ---------------------------------------------------------------------------


def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For finalized orders served by ≥2 distinct suppliers where EXACTLY
    one supplier had returned lines, charge that supplier; rank suppliers
    by orders blamed.  The original's double EXISTS/NOT-EXISTS collapses
    into one per-order aggregation: count distinct suppliers overall and
    among returns, keep groups with (≥2, ==1), and the blamed supplier is
    then recoverable as max(returned suppkey).  One shuffle on l_orderkey
    (natural even key), then a broadcast name join on the reduced set."""
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = t(spark, sf_dir, "lineitem")
    # pre-aggregate to one row per (order, supplier) FIRST: two
    # count_distincts in one agg would plan a 3-way Expand that triples
    # every lineitem row through the l_orderkey shuffle (the CLAUDE.md
    # multi-distinct trap); after the keyed pre-agg the distinct counts
    # are plain counts over an already-distinct key
    per_supp = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("ret").alias("n_ret_supp"),
            F.max(F.when(F.col("ret") == 1, F.col("l_suppkey"))).alias(
                "blamed_suppkey"
            ),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    )
    return (
        per_order.groupBy("blamed_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(bdim(s), F.col("blamed_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q21_SQL = """
SELECT s_name, numwait
FROM (
  SELECT blamed_suppkey, COUNT(*) AS numwait
  FROM (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp,
           MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS blamed_suppkey
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    GROUP BY l_orderkey
  ) per_order
  WHERE n_supp >= 2 AND n_ret_supp = 1
  GROUP BY blamed_suppkey
) blamed
JOIN supplier ON blamed_suppkey = s_suppkey
ORDER BY numwait DESC, s_name ASC LIMIT 20
"""


QUERIES: dict[str, QuerySpec] = {
    "q4_priority_late_ship": QuerySpec(
        q4_priority_late_ship, _Q4_SQL, ("OP-JOIN-SEMI", "OP-AGG-COUNT", "OP-FIL-TIME")
    ),
    "q8_national_market_share": QuerySpec(
        q8_national_market_share, _Q8_SQL, ("OP-JOIN-ENRICH", "OP-AGG-SUM", "OP-MATH")
    ),
    "q9_product_profit": QuerySpec(
        q9_product_profit, _Q9_SQL, ("OP-JOIN-ENRICH", "OP-AGG-SUM")
    ),
    "q11_important_parts": QuerySpec(
        q11_important_parts, _Q11_SQL, ("OP-AGG-SUM", "OP-JOIN-SEMI", "OP-SORT-LIMIT")
    ),
    "q12_late_lines_by_status": QuerySpec(
        q12_late_lines_by_status, _Q12_SQL, ("OP-AGG-CONDCOUNT", "OP-JOIN-ENRICH")
    ),
    "q13_custdist": QuerySpec(
        q13_custdist, _Q13_SQL, ("OP-JOIN-ENRICH", "OP-AGG-COUNT")
    ),
    "q15_top_supplier": QuerySpec(
        q15_top_supplier, _Q15_SQL, ("OP-AGG-SUM", "OP-MATH")
    ),
    "q16_supplier_cnt": QuerySpec(
        q16_supplier_cnt, _Q16_SQL, ("OP-AGG-SETUNION", "OP-FIL-CHOICE")
    ),
    "q17_small_qty_revenue": QuerySpec(
        q17_small_qty_revenue, _Q17_SQL, ("OP-AGG-SUM", "OP-MATH")
    ),
    "q19_disjunctive_revenue": QuerySpec(
        q19_disjunctive_revenue, _Q19_SQL, ("OP-FIL-CHOICE", "OP-AGG-SUM")
    ),
    "q20_bulk_suppliers": QuerySpec(
        q20_bulk_suppliers, _Q20_SQL, ("OP-AGG-SUM", "OP-JOIN-SEMI")
    ),
    "q21_sole_blame_supplier": QuerySpec(
        q21_sole_blame_supplier, _Q21_SQL, ("OP-AGG-SETUNION", "OP-SORT-LIMIT")
    ),
}
