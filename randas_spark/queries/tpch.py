"""Remaining TPC-H query shapes, adapted to the testdata schema.

The testdata star schema (TESTDATA.md) omits partsupp, commit/receipt
dates, phone, container and comment columns, so each query keeps its
canonical TPC-H *plan shape* (the part that exercises the engine:
correlated subqueries, EXISTS/NOT EXISTS, scalar subqueries, disjunctive
predicates, left-join distributions) with predicates rewritten onto the
columns that exist. q01/q03/q05/q06/q10 live in relational.py.

Scale notes sit on each query; the recurring themes at 100 TB:
- dimension sides broadcast (customer/supplier/nation/part after filters);
- correlated aggregates become one extra shuffle on the correlation key
  (Catalyst decorrelates to an aggregate + join — no per-row subquery);
- EXISTS/NOT EXISTS become left-semi/left-anti joins on the fact key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from randas_spark.queries import fround, register, sql_fround, t


@register(
    "q02_min_acctbal_supplier",
    oracle="""
    WITH shipped AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), ranked AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal,
               min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
        FROM part
        JOIN shipped ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_size = 25
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
    FROM ranked WHERE s_acctbal = min_bal
    """,
)
def q02_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part): the partsupp link is
    derived as DISTINCT (partkey, suppkey) pairs from lineitem; the
    correlated MIN becomes a window over the part key.

    Scale: the distinct pair-set shuffles once on partkey; part(filtered)
    and supplier broadcast. The window repartitions by p_partkey — same
    key as the join, so AQE reuses the exchange.
    """
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    s = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS over lineitem (ship-after-order replaces the
    absent commit/receipt comparison) → left-semi join.

    Scale: semi join shuffles both sides on orderkey but carries only the
    key + two columns; the 3-month filter prunes orders before the
    shuffle (pushed to the scan).
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q07_nation_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS l_year,
           {sql_fround('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey  = c_custkey
    JOIN supplier  ON l_suppkey  = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Scale: both nation filters broadcast down into customer/supplier,
    which then broadcast into the fact joins — the only shuffle is
    lineitem⋈orders on orderkey, then the final small groupBy.
    """
    nations = ["NATION_1", "NATION_2"]
    n = t(spark, sf_dir, "nation")
    cn = n.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk")
    )
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q08_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey  = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey  = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           {sql_fround("sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END) / sum(volume)", 6)} AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market by year —
    conditional aggregation over a 6-way join.

    Scale: every dimension chain (customer→nation→region, supplier→nation)
    broadcasts; lineitem⋈orders is the single big shuffle. The share
    division happens after a tiny per-year aggregate.
    """
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    c = t(spark, sf_dir, "customer").join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
    s = t(spark, sf_dir, "supplier").join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            fround(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {sql_fround('sum(l_extendedprice * (1 - l_discount))', 2)} AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_type = 'PROMO'
    GROUP BY 1, 2
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for one product
    line (no ps_supplycost column → profit is discounted revenue).

    Scale: part(filtered)/supplier/nation broadcast; lineitem⋈orders
    shuffles on orderkey; two-level group keys stay tiny.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "profit"
            )
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer count by number of (non-urgent) orders —
    left outer join preserving order-less customers, double aggregation.

    Scale: the left join shuffles on custkey; the first aggregate reuses
    that partitioning (same key → no second exchange); the second
    aggregate is tiny.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT {sql_fround("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount))", 6)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share for one month.

    Scale: part broadcasts (2M rows at SF100 still ~100MB of 2 columns —
    at true 100TB scale bump the broadcast threshold or pre-bucket both
    sides on partkey); the date filter prunes lineitem at the scan.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            fround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_fround('sum(l_extendedprice * (1 - l_discount))', 2)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — scalar
    subquery against a derived view.

    Scale: revenue aggregate shuffles on suppkey once; the global max is a
    single-row broadcast back; supplier joins by broadcast.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # window max over the aggregate: ONE pass, no .cache() pinning the
    # revenue frame in executor storage for the session's lifetime (the
    # old two-consumer agg+join form never unpersisted)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    m = F.max("total_revenue").over(Window.partitionBy())
    s = t(spark, sf_dir, "supplier")
    return (
        revenue.withColumn("__m__", m)
        .filter(F.col("total_revenue") == F.col("__m__"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_count",
    oracle="""
    WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM link
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per part attribute group, with a
    NOT IN exclusion subquery (negative-balance suppliers stand in for the
    absent complaint-comment filter).

    Scale: NOT IN over a non-null key → left-anti broadcast join; the
    count-distinct expands then collapses on the group keys (Spark plans
    a two-phase distinct aggregate).
    """
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 22])
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity",
    oracle=f"""
    SELECT {sql_fround('sum(l1.l_extendedprice) / 7.0', 2)} AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#23'
      AND l1.l_quantity < (SELECT avg(l2.l_quantity) * 0.2
                           FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated average-quantity subquery, decorrelated to a
    per-part aggregate joined back on partkey.

    Scale: the per-part avg shuffles lineitem once on partkey; the
    brand-filtered part broadcasts into both sides. Same rewrite Catalyst
    performs for the SQL form — written explicitly for plan clarity.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(fround(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_fround('sum(l_quantity)', 2)} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — IN over a grouped HAVING → semi
    join, then top-100.

    Scale: the HAVING aggregate and the semi join share the orderkey
    partitioning; customer broadcasts; top-100 is TakeOrderedAndProject.
    """
    return q18_core(
        t(spark, sf_dir, "lineitem"),
        t(spark, sf_dir, "orders"),
        t(spark, sf_dir, "customer"),
    )


def q18_core(li: DataFrame, o: DataFrame, c: DataFrame) -> DataFrame:
    """Q18 over caller-supplied frames (see q12_core — bucketed inputs
    make the HAVING agg and both orderkey joins Exchange-free)."""
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "inner")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fround(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_fround('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive mixed-table predicates over an equi-join —
    the classic test that OR-ed cross-table filters still use the hash
    join (with the disjunction evaluated as a post-join filter) instead
    of falling back to a nested-loop join.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone shipped late (>60 days after order
    date stands in for the absent receipt/commit comparison) on
    multi-supplier finalized orders — EXISTS + NOT EXISTS self-joins.

    Scale: all three lineitem legs shuffle on orderkey — one exchange
    reused across the semi and anti joins; supplier broadcasts.
    """
    return q21_core(
        t(spark, sf_dir, "lineitem"),
        t(spark, sf_dir, "orders"),
        t(spark, sf_dir, "supplier"),
    )


def q21_core(li: DataFrame, o: DataFrame, s: DataFrame) -> DataFrame:
    """Q21 over caller-supplied frames (see q12_core — bucketed lineitem
    makes all three orderkey legs reuse the stored clustering)."""
    o = o.filter(F.col("o_orderstatus") == "F")
    late_cut = F.expr("o_orderdate + INTERVAL 60 DAY")

    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    others = li.select(
        F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk"),
        F.col("l_shipdate").alias("x_sd"),
    )
    has_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("x_ok")) & (F.col("l_suppkey") != F.col("x_sk")),
        "left_semi",
    )
    sole_late = has_other.join(
        others,
        (F.col("l_orderkey") == F.col("x_ok"))
        & (F.col("l_suppkey") != F.col("x_sk"))
        & (F.col("x_sd") > F.expr("o_orderdate + INTERVAL 60 DAY")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_customers",
    oracle=f"""
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           {sql_fround('sum(c_acctbal)', 2)} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_fround('avg(c_acctbal)', 6)} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy customers gone idle — scalar AVG subquery +
    NOT EXISTS anti join (nationkey stands in for the absent phone
    country code; 'no orders since 1998' replaces 'no orders ever', which
    is empty on this fixture where every customer has ~10 orders).

    Scale: the scalar avg is a one-row broadcast; the anti join against
    orders' filtered custkey projection is the only shuffle.
    """
    c = t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        # rounded threshold (same rule as q11): avg is summation-order-
        # dependent in the last ulp across engines
        .filter(F.col("c_acctbal") > fround(F.col("ab"), 6))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q20_excess_shippers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM shipped
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
          AND qty > (SELECT 2.0 * avg(s2.qty) FROM shipped s2
                     WHERE s2.l_partkey = shipped.l_partkey)
    )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped a widget part at >2x the
    part's average per-supplier volume — doubly nested subqueries (IN over
    a derived aggregate with a correlated scalar AVG on the SAME derived
    table), partsupp replaced by the shipped-quantity rollup.

    Scale: `shipped` is aggregated once and reused for both the outer rows
    and the correlated average (decorrelated to a per-part avg joined
    back — both on the partkey partitioning); part(filtered) broadcasts;
    the final IN is a semi join on suppkey.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("qty"))
    part_avg = shipped.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("qty") * 2.0).alias("qty_cut")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    excess = (
        shipped.join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .join(part_avg, shipped.l_partkey == F.col("ap"))
        .filter(F.col("qty") > F.col("qty_cut"))
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    return s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH natval AS (
        SELECT l_partkey,
               l_extendedprice * (1 - l_discount) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
    )
    SELECT l_partkey AS ps_partkey, {sql_fround('sum(val)', 2)} AS part_value
    FROM natval
    GROUP BY l_partkey
    HAVING {sql_fround('sum(val)', 6)}
         > (SELECT {sql_fround('0.001 * sum(val)', 6)} FROM natval)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part shipped value from one
    nation's suppliers, kept only when it exceeds a fraction of that
    nation's TOTAL value — the scalar-subquery-in-HAVING plan shape
    (partsupp value replaced by lineitem revenue; reference has no HAVING
    or subqueries at all, SURVEY.md §2.12).

    Scale: nation-filtered supplier broadcasts into the lineitem scan, so
    the only shuffle is the partkey aggregation; the global total is a
    second pass over the SAME aggregated (small) result — computed from
    the per-part sums, not a rescan of lineitem — and broadcasts as one
    row into the HAVING filter.
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    per_part = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == s.s_suppkey)
        .withColumn("val", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum("val").alias("raw_value"))
    )
    total = per_part.agg((F.sum("raw_value") * 0.001).alias("cutoff"))
    # membership decided on 6-digit-rounded values on BOTH engines: the
    # two sides sum in different orders, so a raw float comparison could
    # flip a part sitting within an ulp of the threshold (the module's
    # float-boundary rule, applied to the one unrounded comparison left)
    return (
        per_part.join(F.broadcast(total))
        .filter(fround(F.col("raw_value"), 6) > fround(F.col("cutoff"), 6))
        .select("ps_partkey", fround(F.col("raw_value"), 2).alias("part_value"))
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag AS shipmode,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes vs priority): fact-to-fact join with
    conditional aggregation — count(CASE WHEN priority urgent/high)
    (l_returnflag stands in for the absent l_shipmode; shipdate range for
    the absent receiptdate).

    Scale: genuinely large-x-large join — both sides shuffle on orderkey
    (no broadcast possible at 100 TB); the date filter pushes into the
    lineitem scan to cut the shuffled volume first, and the conditional
    counts partial-aggregate map-side so the final groupBy moves only
    6 returnflag rows per partition.
    """
    return q12_core(t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders"))


def q12_core(li: DataFrame, o: DataFrame) -> DataFrame:
    """Q12 over caller-supplied fact frames — the seam that lets the
    same plan run over plain parquet OR bucketed tables (bucketed on
    the orderkey, the join runs Exchange-free; tools/bench_bucketed.py
    measures the trade, tests/test_layout.py pins the plan)."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )
