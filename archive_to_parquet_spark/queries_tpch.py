"""TPC-H-pattern relational queries adapted to the driver testdata.

The testdata is TPC-H-shaped but trimmed (no partsupp, no
commit/receipt dates, single-word p_type), so these implement the
*query patterns* of the classic suite — the plan shapes a warehouse
engine must get right — against the columns that exist:

- Q1  pricing summary     : full-scan rollup, 8 map-side aggregates
- Q2  min-cost supplier   : per-group-min join-back over a dim chain
- Q3  shipping priority   : selective dim filter → big-big join → top-k
- Q4  priority checking   : EXISTS semi join with non-equi residual
- Q5  local supplier vol  : residual equality BETWEEN two dim chains
- Q6  forecast revenue    : pure scan-filter-agg (pushdown showcase)
- Q7  volume shipping     : two independent dim lookups on one fact row
- Q8  market share        : conditional share-of-total by year
- Q9  product type profit : broadcast part/supp chains, year rollup
- Q10 returned items      : filtered fact → customer rollup → top-k
- Q11 important balances  : group agg vs scalar-subquery global total
- Q12 priority split      : CASE two-way counts per category
- Q13 cust distribution   : outer join → two-level aggregation
- Q14 promo revenue       : conditional numerator over joined dim
- Q15 top supplier        : agg → max-equality scalar subquery
- Q16 brand supplier cnt  : count-distinct per group with NOT-IN dim
- Q17 small-quantity rev  : per-group avg threshold (correlated agg)
- Q18 large orders        : having-filtered agg joined back to facts
- Q19 disjunctive join    : OR-of-conjuncts pushdown over a dim join
- Q20 supplier semi chain : semi join into a having-filtered agg
- Q21 multi-exists        : exists + not-exists on the same fact table
- Q22 idle customers      : scalar avg threshold + anti join + rollup

Every Spark plan broadcasts dimension tables explicitly and keeps the
single big-big shuffle (lineitem ⨝ orders) as the only exchange wher
the pattern needs one; aggregates are map-side-combinable. Floats are
rounded identically on both sides before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CATALOG"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _revenue():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# -- exact money arithmetic ----------------------------------------------------
#
# Every money column in the testdata is 2dp-discrete, so revenue
# l_extendedprice·(1−l_discount) is EXACT in integer 1e-4 units:
# cents × (100 − discount_percent). Summing doubles instead is
# accumulation-order-dependent — a different partition count can flip
# the rounded cent (caught live by tools/preflight_vanilla.py on
# round(avg(double),4)) — while integer sums are identical on every
# engine, partitioning, and executor count. The Spark and DuckDB
# fragments below are maintained as twins; `div` is Spark's integer
# division, `//` DuckDB's. Final half-up rounding is integer math too.
# int64 headroom: 1e-4-unit revenue sums reach ~1.5e15 per group at
# sf1; at extreme corpus scale switch the sum to DECIMAL(38,0) on both
# engines before int64 saturates (~sf1000 per group).

_REV_E4 = (
    "(cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
    " * (100 - cast(floor(l_discount * 100 + 0.5) as bigint)))"
)
_REV_E4_SQL = (
    "(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
)


def _rev_sum(alias: str, cond: str | None = None):
    """Σ revenue as exact integer 1e-4 units, half-up to 2dp."""
    term = _REV_E4 if cond is None else f"(case when {cond} then {_REV_E4} else 0 end)"
    return F.expr(
        f"cast((sum({term}) + 50) div 100 as double) / 100.0"
    ).alias(alias)


def _rev_sum_sql(cond: str | None = None) -> str:
    term = (
        _REV_E4_SQL
        if cond is None
        else f"(CASE WHEN {cond} THEN {_REV_E4_SQL} ELSE 0 END)"
    )
    return f"((CAST(SUM({term}) AS BIGINT) + 50) // 100) / 100.0"


from archive_to_parquet_spark.functions.exactnum import (  # noqa: E402
    cents_avg as _cents_avg,
    cents_avg_sql as _cents_avg_sql,
    cents_sum as _cents_sum,
    cents_sum_sql as _cents_sum_sql,
)


# -- Q3: shipping priority -----------------------------------------------------


def tpch_q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective segment filter broadcast against orders, big-big join to
    lineitem on orderkey, revenue rollup per order, top-10 via
    TakeOrderedAndProject (no global sort)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_sum("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


TPCH_Q03_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_rev_sum_sql()} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# -- Q6: forecast revenue ------------------------------------------------------


def tpch_q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan→filter→agg; every predicate reaches the parquet scan
    (PushedFilters) and the single agg is map-side partial."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # discount revenue = cents × discount_percent, exact e4 units
            F.expr(
                "cast((sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
                " * cast(floor(l_discount * 100 + 0.5) as bigint)) + 50)"
                " div 100 as double) / 100.0"
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


TPCH_Q06_SQL = """
SELECT ((CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
              * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         + 50) // 100) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


# -- Q7: volume shipping -------------------------------------------------------


def tpch_q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent dimension resolutions on one fact row: supplier
    nation via l_suppkey, customer nation via orders→customer. Both dim
    chains broadcast; the only shuffle is lineitem ⨝ orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(_rev_sum("revenue"))
    )


TPCH_Q07_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS ship_year,
       {_rev_sum_sql()} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# -- Q8: market share ----------------------------------------------------------


def tpch_q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total per year: conditional numerator (supplier from the
    target nation) over total regional revenue — one pass, two
    conditional aggregates, no second join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust_region = (
        _t(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = (
        _t(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_region), orders.o_custkey == cust_region.c_custkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            # exact integer numerator/denominator; the 6dp share is
            # half-up integer math on the e4 sums (identical on both
            # engines regardless of partitioning). The scaled numerator
            # goes through DECIMAL(38,0) (HUGEINT on the oracle side)
            # so the ×1e6 never saturates int64.
            F.expr(
                "cast((2 * cast(sum(case when supp_nation = 'NATION_3' then "
                + _REV_E4
                + f" else 0 end) as decimal(38,0)) * 1000000 + sum({_REV_E4}))"
                f" div (2 * sum({_REV_E4})) as double) / 1000000.0"
            ).alias("mkt_share"),
            _rev_sum("total_revenue"),
        )
    )


TPCH_Q08_SQL = f"""
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       CAST((2 * SUM(CASE WHEN sn.n_name = 'NATION_3'
                      THEN {_REV_E4_SQL} ELSE 0 END) * 1000000
         + SUM({_REV_E4_SQL}))
        // (2 * SUM({_REV_E4_SQL})) AS BIGINT) / 1000000.0 AS mkt_share,
       {_rev_sum_sql()} AS total_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


# -- Q10: returned items -------------------------------------------------------


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-line revenue per customer: filtered big-big join, dims
    broadcast, top-20 TakeOrdered."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _rev_sum("revenue"),
            F.count("*").alias("n_returned_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {_rev_sum_sql()} AS revenue,
       COUNT(*) AS n_returned_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# -- Q11: important balances ---------------------------------------------------


def tpch_q11_important_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group totals kept only above a fraction of the global total — the
    scalar global is a one-row broadcast (cross join), never a
    collect()."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    bal_cents = "sum(cast(floor(s_acctbal * 100 + 0.5) as bigint))"
    per_nation = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr(bal_cents).alias("bal_c"),
            F.count("*").alias("n_suppliers"),
        )
    )
    total = supp.agg(F.expr(bal_cents).alias("global_c"))
    return (
        per_nation.join(F.broadcast(total))
        # exact threshold: cents·100 > global_cents·3 — no doubles in
        # the comparison, so a boundary nation can't flip with
        # accumulation order
        .filter(F.col("bal_c") * 100 > F.col("global_c") * 3)
        .select(
            "n_name",
            (F.col("bal_c") / 100.0).alias("nation_balance"),
            "n_suppliers",
        )
    )


TPCH_Q11_SQL = """
SELECT n_name,
       CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS nation_balance,
       COUNT(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) * 100
     > (SELECT CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
        FROM supplier) * 3
"""


# -- Q13: customer order-count distribution ------------------------------------


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation with an outer join: orders are pre-aggregated
    per customer BEFORE the join (smallest possible shuffle), customers
    with no orders enter at count 0 via the left join."""
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("n_customers"))
    )


TPCH_Q13_SQL = """
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


# -- Q14: promo revenue --------------------------------------------------------


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-numerator ratio per month over a broadcast dim join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(
            # 100·num/den at 6dp == num·1e8/den in 1e-6-of-a-percent
            # units — exact half-up integer math through DECIMAL(38,0)
            F.expr(
                "cast((2 * cast(sum(case when p_type = 'PROMO' then "
                + _REV_E4
                + f" else 0 end) as decimal(38,0)) * 100000000 + sum({_REV_E4}))"
                f" div (2 * sum({_REV_E4})) as double) / 1000000.0"
            ).alias("promo_pct"),
        )
    )


TPCH_Q14_SQL = f"""
SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
       EXTRACT(month FROM l_shipdate) AS ship_month,
       CAST((2 * SUM(CASE WHEN p_type = 'PROMO'
                          THEN {_REV_E4_SQL} ELSE 0 END) * 100000000
             + SUM({_REV_E4_SQL}))
            // (2 * SUM({_REV_E4_SQL})) AS BIGINT) / 1000000.0 AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
"""


# -- Q15: top supplier ---------------------------------------------------------


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg → scalar max → equality filter. Revenue is rounded BEFORE the
    max/compare on both engines so double accumulation order can't flip
    the winner."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(_rev_sum("revenue"))
    mx = rev.agg(F.max("revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "revenue")
    )


TPCH_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, {_rev_sum_sql()} AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue = (SELECT MAX(revenue) FROM rev)
"""


# -- Q16: brand supplier counts ------------------------------------------------


def tpch_q16_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) with a NOT-IN
    style dim exclusion; the distinct agg shuffles on the group key."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
GROUP BY 1, 2, 3
"""


# -- Q17: small-quantity revenue -----------------------------------------------


def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-part average threshold: the per-part avg is an
    aggregate joined back (broadcast — one row per part), not a window
    over the fact table. The threshold is rounded identically on both
    engines so boundary rows can't flip."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li_part = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    # avg(qty)·0.5 at 6dp, exact: qty cents summed as long, then
    # (2·S·5000 + n) div 2n in 1e-6 units — the threshold every
    # boundary row compares against is identical on both engines
    avg_qty = li_part.groupBy("p_partkey").agg(
        F.expr(
            "cast((2 * sum(cast(floor(l_quantity * 100 + 0.5) as bigint)) * 5000"
            " + count(*)) div (2 * count(*)) as double) / 1000000.0"
        ).alias("qty_threshold")
    )
    return (
        li_part.join(
            F.broadcast(avg_qty.withColumnRenamed("p_partkey", "t_partkey")),
            li_part.l_partkey == F.col("t_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            # round(Σprice/7, 2): with S = Σcents, the target cents
            # value is S/7 half-up = (2S + 7) div 14
            F.expr(
                "cast((2 * sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint))"
                " + 7) div 14 as double) / 100.0"
            ).alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


TPCH_Q17_SQL = """
WITH li_part AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), thr AS (
  SELECT l_partkey AS t_partkey,
         ((2 * CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           * 5000 + COUNT(*)) // (2 * COUNT(*))) / 1000000.0 AS qty_threshold
  FROM li_part GROUP BY 1
)
SELECT ((2 * CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         + 7) // 14) / 100.0 AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM li_part JOIN thr ON l_partkey = t_partkey
WHERE l_quantity < qty_threshold
"""


# -- Q18: large orders ---------------------------------------------------------


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Having-filtered agg (sum qty per order) joined back to orders and
    customers; the agg output is small → broadcast back against orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


TPCH_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS total,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# -- Q19: disjunctive predicate join -------------------------------------------


def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjuncts across the join: each disjunct pairs a dim
    predicate with a fact predicate — the shape that tests predicate
    normalization and partial pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    d1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    d2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    d3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(d1 | d2 | d3).agg(
        _rev_sum("revenue"),
        F.count("*").alias("n_items"),
    )


TPCH_Q19_SQL = f"""
SELECT {_rev_sum_sql()} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# -- Q20: supplier semi chain --------------------------------------------------


def tpch_q20_supplier_semi_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join into a having-filtered aggregate: suppliers that moved
    more than a threshold quantity of ECONOMY parts. The agg result is
    the semi side (small), so the supplier scan never widens."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    heavy = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 500)
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi"
        ).select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


TPCH_Q20_SQL = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'ECONOMY'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 500
)
"""


# -- Q21: multi-exists ---------------------------------------------------------


def tpch_q21_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS on the same fact table, expressed as one
    conditional aggregation over orders (single shuffle on custkey)
    instead of two correlated subquery joins."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    flags = orders.groupBy("o_custkey").agg(
        F.max((F.col("o_orderstatus") == "F").cast("int")).alias("has_f"),
        F.max((F.col("o_orderstatus") == "O").cast("int")).alias("has_o"),
        F.count("*").alias("n_orders"),
    )
    return (
        flags.filter((F.col("has_f") == 1) & (F.col("has_o") == 0))
        .join(F.broadcast(cust), flags.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "n_orders")
    )


TPCH_Q21_SQL = """
SELECT c_custkey, c_name, COUNT(*) AS n_orders
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE EXISTS (SELECT 1 FROM orders o2
              WHERE o2.o_custkey = c_custkey AND o2.o_orderstatus = 'F')
  AND NOT EXISTS (SELECT 1 FROM orders o3
                  WHERE o3.o_custkey = c_custkey AND o3.o_orderstatus = 'O')
GROUP BY 1, 2
"""


# -- Q22: idle customers -------------------------------------------------------


def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-average threshold + anti join + rollup: customers with an
    above-average positive balance and no RECENT orders (every customer
    in the testdata has some order, so the classic no-orders form would
    be vacuous), grouped by a derived code (custkey mod 10 stands in
    for the phone prefix)."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    # exact 6dp threshold over positive balances (cents are exact, the
    # half-up division is integer math — boundary customers can't flip)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        _cents_avg("c_acctbal", 6, "avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("int").alias("code"))
        .agg(
            F.count("*").alias("n_customers"),
            _cents_sum("c_acctbal", "total_bal"),
        )
    )


TPCH_Q22_SQL = f"""
SELECT CAST(c_custkey % 10 AS INTEGER) AS code,
       COUNT(*) AS n_customers,
       {_cents_sum_sql("c_acctbal")} AS total_bal
FROM customer
WHERE c_acctbal > (SELECT {_cents_avg_sql("c_acctbal", 6)} FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1
"""


# -- Q1: pricing summary -------------------------------------------------------


def tpch_q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic full-scan rollup: one shipdate predicate pushed to the
    scan, eight map-side-combinable aggregates, a 6-row result. The
    whole query is one stage + one tiny exchange on the 2-column key."""
    from archive_to_parquet_spark.functions.exactnum import (
        cents_col,
        iavg_cents,
        isum_2dp,
        isum_round,
    )

    li = _t(spark, sf_dir, "lineitem")
    # pre-project the integer units ONCE per row — aggregate update
    # expressions are not CSE'd, so inlining the floor-casts into all
    # 8 aggregates would evaluate them ~10× per row. charge =
    # price·(1−disc)·(1+tax), exact e6 units = rev_e4 · (100+tax%).
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz")
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            cents_col("l_quantity").alias("qty_c"),
            cents_col("l_extendedprice").alias("price_c"),
            cents_col("l_discount").alias("disc_p"),
            cents_col("l_tax").alias("tax_p"),
        )
        .withColumn("rev_e4", F.expr("price_c * (100 - disc_p)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            isum_2dp("qty_c", "sum_qty"),
            isum_2dp("price_c", "sum_base_price"),
            isum_round("rev_e4", 4, "sum_disc_price"),
            isum_round("rev_e4 * (100 + tax_p)", 6, "sum_charge"),
            iavg_cents("qty_c", 6, "avg_qty"),
            iavg_cents("price_c", 6, "avg_price"),
            iavg_cents("disc_p", 6, "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q01_CHARGE_E6_SQL = (
    "(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
    " * (100 + CAST(round(l_tax * 100) AS BIGINT)))"
)

TPCH_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_cents_sum_sql("l_quantity")} AS sum_qty,
       {_cents_sum_sql("l_extendedprice")} AS sum_base_price,
       {_rev_sum_sql()} AS sum_disc_price,
       ((CAST(SUM({_Q01_CHARGE_E6_SQL}) AS BIGINT) + 5000) // 10000) / 100.0
         AS sum_charge,
       {_cents_avg_sql("l_quantity", 6)} AS avg_qty,
       {_cents_avg_sql("l_extendedprice", 6)} AS avg_price,
       {_cents_avg_sql("l_discount", 6)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# -- Q2: minimum-cost supplier ------------------------------------------------


def tpch_q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group-minimum join-back (the testdata has no partsupp, so the
    'offer' relation is lineitem's observed (part, supplier, price)
    rows): filtered parts broadcast against lineitem, min price per
    part, equality join-back keeps every tied winner, then broadcast
    supplier→nation→region chain restricted to EUROPE. Two shuffles
    total (the min agg and its join-back on partkey)."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") < 10)
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name"))
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
            F.col("l_extendedprice").alias("price"),
        )
    )
    min_price = offers.groupBy(F.col("p_partkey").alias("mp_partkey")).agg(
        F.min("price").alias("min_price")
    )
    return (
        offers.join(
            min_price,
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("price") == F.col("min_price")),
        )
        .select(
            "p_partkey", "p_name", "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
            F.round("min_price", 2).alias("min_price"),
        )
        .distinct()
    )


TPCH_Q02_SQL = """
WITH offers AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name,
         l_extendedprice AS price
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'ECONOMY' AND p_size < 10 AND r_name = 'EUROPE'
)
SELECT DISTINCT p_partkey, p_name, s_name,
       round(s_acctbal, 2) AS s_acctbal, n_name,
       round(price, 2) AS min_price
FROM offers o
WHERE price = (SELECT MIN(price) FROM offers m
               WHERE m.p_partkey = o.p_partkey)
"""


# -- Q4: order priority checking ----------------------------------------------


def tpch_q04_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join with a non-equi residual (the testdata
    has no commit/receipt dates, so 'late' = shipped more than 60 days
    after ordering). Orders' date window is pushed to the scan; the
    semi join shuffles on orderkey and keeps no lineitem columns."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


TPCH_Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# -- Q5: local supplier volume -------------------------------------------------


def tpch_q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue where the customer and the line's supplier share a
    nation, per ASIA nation for one year. The distinguishing feature is
    the residual equality BETWEEN two dimension chains
    (c_nationkey = s_nationkey) on top of the fact joins: customer and
    supplier both resolve via broadcast, orders⨝lineitem is the one
    big-big shuffle, and the nation equality is applied as a post-join
    filter on broadcast-resolved columns."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(_rev_sum("revenue"))
    )


TPCH_Q05_SQL = f"""
SELECT n_name, {_rev_sum_sql()} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# -- Q9: product type profit ---------------------------------------------------


def tpch_q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year for a name-filtered part
    family (no partsupp → profit is discounted revenue). Part filter
    and the supplier→nation chain broadcast against lineitem; the only
    big-big shuffle is lineitem⨝orders for the year column."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_rev_sum("sum_profit"))
    )


TPCH_Q09_SQL = f"""
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       {_rev_sum_sql()} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


# -- Q12: shipping-priority split ----------------------------------------------


def tpch_q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional two-way counts per category (the testdata has no
    l_shipmode, so the category is l_returnflag): a date-windowed fact
    scan joined to orders, with CASE aggregation splitting critical
    (URGENT/HIGH) from other priorities. One shuffle on orderkey, one
    tiny agg exchange."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("low_line_count"),
        )
    )


TPCH_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


CATALOG: dict[str, tuple] = {
    "tpch_q01_pricing_summary": (tpch_q01_pricing_summary, TPCH_Q01_SQL),
    "tpch_q02_min_cost_supplier": (tpch_q02_min_cost_supplier, TPCH_Q02_SQL),
    "tpch_q03_shipping_priority": (tpch_q03_shipping_priority, TPCH_Q03_SQL),
    "tpch_q04_priority_checking": (tpch_q04_priority_checking, TPCH_Q04_SQL),
    "tpch_q05_local_supplier_volume": (
        tpch_q05_local_supplier_volume,
        TPCH_Q05_SQL,
    ),
    "tpch_q09_product_profit": (tpch_q09_product_profit, TPCH_Q09_SQL),
    "tpch_q12_priority_split": (tpch_q12_priority_split, TPCH_Q12_SQL),
    "tpch_q06_forecast_revenue": (tpch_q06_forecast_revenue, TPCH_Q06_SQL),
    "tpch_q07_volume_shipping": (tpch_q07_volume_shipping, TPCH_Q07_SQL),
    "tpch_q08_market_share": (tpch_q08_market_share, TPCH_Q08_SQL),
    "tpch_q10_returned_items": (tpch_q10_returned_items, TPCH_Q10_SQL),
    "tpch_q11_important_balances": (tpch_q11_important_balances, TPCH_Q11_SQL),
    "tpch_q13_customer_distribution": (
        tpch_q13_customer_distribution,
        TPCH_Q13_SQL,
    ),
    "tpch_q14_promo_revenue": (tpch_q14_promo_revenue, TPCH_Q14_SQL),
    "tpch_q15_top_supplier": (tpch_q15_top_supplier, TPCH_Q15_SQL),
    "tpch_q16_brand_supplier_counts": (
        tpch_q16_brand_supplier_counts,
        TPCH_Q16_SQL,
    ),
    "tpch_q17_small_quantity": (tpch_q17_small_quantity, TPCH_Q17_SQL),
    "tpch_q18_large_orders": (tpch_q18_large_orders, TPCH_Q18_SQL),
    "tpch_q19_disjunctive": (tpch_q19_disjunctive, TPCH_Q19_SQL),
    "tpch_q20_supplier_semi_chain": (
        tpch_q20_supplier_semi_chain,
        TPCH_Q20_SQL,
    ),
    "tpch_q21_multi_exists": (tpch_q21_multi_exists, TPCH_Q21_SQL),
    "tpch_q22_idle_customers": (tpch_q22_idle_customers, TPCH_Q22_SQL),
}
