"""Corpus: adapted TPC-H query suite (relational completeness, SURVEY §2.3-§2.6).

The reference is an ETL replicator with no query engine (SURVEY §2.3); the
north star demands full relational capability, so the classic TPC-H shapes
enter the corpus, *adapted* to the driver's trimmed schemas (TESTDATA.md):
no partsupp table, no l_commitdate/l_receiptdate/l_shipmode, no
p_container, no c_phone — each query keeps its plan shape (the part that
matters for Catalyst) with filters rewritten to the columns that exist.
Q1/Q3/Q6/Q17 already live in corpus/relational.py.

Scale design (100 TB mindset):
- nation/region/supplier are broadcast explicitly — they are dimension-
  sized at every SF (supplier is SF*10k rows; a few hundred MB at SF100k,
  still broadcastable with a higher threshold, and AQE can demote).
- part and customer join WITHOUT an explicit hint: at bench SF AQE picks
  broadcast on its own; at 100 TB they are fact-sized and must shuffle —
  hard-coding broadcast() there would OOM the executors.
- fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE skew
  handling stays on.
- all aggregates are groupBy().agg() → map-side partial aggregation.
- doubles are rounded identically on both sides; CASE-sums cast to BIGINT
  (DuckDB sum(int) returns HUGEINT/double, Spark returns long).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from es_to_clickhouse_spark.corpus import query, t


def _rev(l):  # noqa: E741 - TPC-H convention
    return l.l_extendedprice * (1 - l.l_discount)


@query(
    "q2_min_acctbal_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
             min(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS min_bal
      FROM ps
      JOIN part p ON p.p_partkey = ps.l_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size = 15 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal, n_name
    FROM cand WHERE s_acctbal = min_bal
    """,
)
def q2_min_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 adapted (no partsupp: the part↔supplier relation is the
    DISTINCT (l_partkey,l_suppkey) projection of lineitem; min s_acctbal
    stands in for min ps_supplycost). The correlated-min becomes a window
    min over p_partkey — one shuffle, no self-join."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            "n_name",
        )
    )


@query(
    "q4_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 adapted (no commitdate/receiptdate: the EXISTS predicate is
    l_returnflag='R'). Semi-join then aggregate; the date filter prunes the
    orders scan before the join."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: six-way join where customer and supplier must share a
    nation. Facts shuffle on their keys; supplier/nation/region broadcast;
    customer joins un-hinted (fact-sized at 100 TB)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume between two nations by year. The
    disjunctive nation-pair predicate lands after both broadcast joins so
    Catalyst can still prune each nation scan to the two names. Pair
    (NATION_12, NATION_10) chosen because it trades at EVERY test SF
    (20/22/497 rows at sf0.001/0.01/0.1) — the old (1, 2) pair was
    empty below sf0.1, making the query vacuously green (r6 VERDICT)."""
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10")
    rpair = (F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
           region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share = conditional-sum / sum, one pass.
    part joins un-hinted (fact-sized at scale; AQE broadcasts at bench SF)."""
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_profit_by_nation_year",
    """
    SELECT nation, o_year,
           round(CAST(sum(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 adapted (no ps_supplycost: amount = revenue only). The
    LIKE filter on p_name is pushed into the part scan before its join.
    The summand is cast to DECIMAL(18,4) — cent-valued prices times
    2-decimal discounts are mathematically exact at 4 decimals, so the
    decimal sum is order-independent (float sums differ in the last ulp
    across partitionings and can round to different cents)."""
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ).cast("double"),
                2,
            ).alias("sum_profit")
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter.
    LIMIT carries c_custkey as the unique tiebreak (driver hashes are
    order-insensitive but the SET must be deterministic)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_by_linestatus",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark, sf_dir):
    """TPC-H Q12 adapted (no l_shipmode: grouped by l_linestatus).
    Conditional counts as CASE-sums, cast BIGINT on both sides."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13: histogram of orders-per-customer (two-level aggregate;
    the outer groupBy keys on the inner count)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    GROUP BY ALL
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo revenue share for one month — global scalar
    aggregate over a month-pruned lineitem scan."""
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with max quarterly revenue. The scalar-max
    subquery becomes a 1-row aggregate broadcast against the aggregated
    frame (q22's scalar pattern) — an empty-partition global window here
    would funnel every per-supplier row (SF-linear) through ONE task;
    the broadcast keeps the max fully map-side."""
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue.join(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        F.broadcast(top)
        .join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_count_by_part_attr",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_count_by_part_attr(spark, sf_dir):
    """TPC-H Q16 adapted (partsupp := DISTINCT lineitem pairs; the
    NOT-IN complaint filter keyed on negative s_acctbal). NOT IN over a
    non-null key column is a left-anti broadcast join."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 300. The IN-subquery
    is the same aggregate reused — expressed directly as agg → filter →
    join back, so lineitem aggregates once, not twice."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("sum_qty"),
        )
    )


@query(
    "q19_disjunctive_predicate",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
            AND l_quantity BETWEEN 20 AND 30))
    GROUP BY ALL
    """,
)
def q19_disjunctive_predicate(spark, sf_dir):
    """TPC-H Q19 adapted (p_container/l_shipmode → p_size/l_quantity
    ranges). Catalyst extracts the common p_partkey equi-key and pushes
    the brand/size disjunction into the part scan."""
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem")
    cond = (
        (
            (p.p_brand == "Brand#13")
            & p.p_size.between(1, 15)
            & l.l_quantity.between(1, 11)
        )
        | (
            (p.p_brand == "Brand#20")
            & p.p_size.between(1, 25)
            & l.l_quantity.between(10, 20)
        )
        | (
            (p.p_brand == "Brand#23")
            & p.p_size.between(1, 35)
            & l.l_quantity.between(20, 30)
        )
    )
    return l.join(p, (l.l_partkey == p.p_partkey) & cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "q22_dormant_customers",
    """
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 adapted (cntrycode := c_nationkey): rich customers with
    no RECENT orders (none in the last 7 months of the order-date
    range — the cutoff keeps the anti-join non-vacuous at every SF;
    below sf0.1 every customer has SOME order). Scalar-avg subquery
    broadcast as a 1-row cross join; the NOT EXISTS is a left-anti
    join against the date-filtered orders."""
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_suppkey, l.l_orderkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    ), per_order AS (
      SELECT l.l_orderkey,
             count(DISTINCT l.l_suppkey) AS n_supp
      FROM lineitem l GROUP BY l.l_orderkey
    ), late_per_order AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_late
      FROM late GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM (SELECT DISTINCT l_suppkey, late.l_orderkey
          FROM late) lw
    JOIN per_order p ON p.l_orderkey = lw.l_orderkey
    JOIN late_per_order lp ON lp.l_orderkey = lw.l_orderkey
    JOIN supplier s ON s.s_suppkey = lw.l_suppkey
    WHERE p.n_supp > 1 AND lp.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name LIMIT 10
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 adapted (late := l_shipdate > o_orderdate + 30 days —
    the trimmed schema has no commit/receipt dates): suppliers who were
    the SOLE late supplier on a finished multi-supplier order. The
    original's double correlated EXISTS / NOT EXISTS is DECORRELATED
    into two per-order distinct-supplier counts joined back — each
    correlated probe becomes one partial-aggregated shuffle on the
    order key that every 100 TB optimizer (and Catalyst, via this
    rewrite) prefers over per-row subquery execution. Supplier is
    broadcast; the top-10 is a TakeOrdered."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30))
        )
        .select("l_orderkey", "l_suppkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_per_order = late.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_late")
    )
    lw = late.distinct()
    return (
        lw.join(per_order, "l_orderkey")
        .join(late_per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), lw.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q11_important_stock",
    """
    WITH v AS (
      SELECT l.l_partkey, sum(l.l_extendedprice * (1 - l.l_discount)) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name LIKE 'NATION_1%'
      GROUP BY l.l_partkey
    )
    SELECT v.l_partkey AS p_partkey, round(v.value, 2) AS value
    FROM v, (SELECT 1.5 * avg(value) AS th FROM v) t
    WHERE v.value > t.th
    ORDER BY value DESC, p_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 adapted (no partsupp: per-part "stock value" is the
    revenue routed through suppliers of the NATION_1x block, computed
    from lineitem). The original's correlated HAVING-subquery threshold
    (a fixed FRACTION of the global total, which goes vacuous as SF
    grows) becomes a scale-invariant 1.5x-of-mean cut so the output
    stays proportional at every SF. One shuffle for the per-part agg;
    the scalar threshold re-aggregates the SMALL grouped result (|part|
    rows, not |lineitem|) and broadcasts as a 1-row cross join — the
    decorrelation every 100 TB optimizer wants. Supplier and nation
    are dimension-sized: explicit broadcast."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").where(
        F.col("n_name").like("NATION_1%")
    )
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev(li)).alias("value"))
    )
    th = v.agg((F.lit(1.5) * F.avg("value")).alias("th"))
    return (
        v.join(F.broadcast(th))
        .where(F.col("value") > F.col("th"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@query(
    "q20_promotion_suppliers",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name LIKE 'NATION_1%'
      AND s.s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh
        JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE p.p_name LIKE 'cold%' AND sh.qty > 50)
    ORDER BY s_name
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 adapted (no partsupp/availqty: "has excess stock of
    forest parts" becomes "shipped > 50 units of a cold-prefixed part
    in 1996"). Plan shape preserved: the nested IN over a grouped
    subquery decorrelates into (a) a partial-aggregated groupBy on
    (partkey, suppkey) over the date-pruned lineitem slice, (b) a join
    against the name-filtered part — fact-sized at 100 TB, so NO
    broadcast hint there (AQE may still elect one at bench SF), and
    (c) a LEFT SEMI join into supplier on the resulting small suppkey
    set, which IS broadcast — semi-join via broadcast kills the
    shuffle on the dimension side entirely."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("cold%"))
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = t(spark, sf_dir, "nation").where(
        F.col("n_name").like("NATION_1%")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    cand = (
        shipped.join(p, shipped.l_partkey == p.p_partkey)
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        # dedup BEFORE broadcasting: the semi join needs distinct
        # suppkeys only, and without this the broadcast relation scales
        # with qualifying (part, supplier) pairs — fact-derived, exactly
        # what the module header forbids shipping to every executor
        .distinct()
    )
    return (
        s.join(F.broadcast(cand), s.s_suppkey == cand.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
