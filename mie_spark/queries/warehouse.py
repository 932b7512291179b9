"""Warehouse analytics: the remaining classic TPC-H query shapes.

Rounds 1-5 covered Q1/Q2/Q3/Q4/Q5/Q12/Q13/Q14/Q17/Q18; this module adds
the rest: with it the repo expresses all 22 TPC-H query shapes —
bidirectional dimension pairing (Q7), conditional market-share ratio
(Q8), multi-dim profit rollup (Q9), returned-item ranking (Q10),
value-concentration scalar-threshold cut (Q11, over lineitem value
since the corpus ships no partsupp — see its docstring),
NOT-IN distinct-count census (Q16), OR-of-ANDs pushdown (Q19),
EXISTS/NOT-EXISTS decorrelation (Q21), scalar-subquery anti-join
(Q22), pure predicate scan (Q6), view + scalar-max reuse (Q15), and
nested-aggregate concentration cut (Q20).
The corpus (TESTDATA.md) has no partsupp / shipmode / comment /
phone columns, so each query keeps the *plan shape* of its TPC-H
namesake over the columns that exist; the docstrings note the
adaptation.

Reference parity: the reference engine has no multi-way analytic join
surface at all (its reader is key-lookup + filter scans,
pkg/memory/reader.go) — this module is north-star coverage, graded
purely against the DuckDB oracles.

Numeric doctrine (memory: integer cents, half-up means): money math is
integer cents end-to-end (`cents`/`revenue_col` from
queries/relational.py); ratios are cross-multiplied BIGINTs; the only
float ops are final divisions on identical integer operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.queries import query
from mie_spark.queries.relational import (
    REVENUE_SQL,
    cents,
    int_div,
    revenue_col,
    share_half_up_4dp,
)
from mie_spark.sources import load_table


# --- Q7: bidirectional volume shipping between two nations -----------------

@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {REVENUE_SQL} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_8')
           OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation pair, both
    directions, by ship year. The two nation-name predicates are pushed
    *below* the fact join: supplier and customer are each pre-joined to
    the (tiny, broadcast) nation dim and filtered to the two nations
    before touching lineitem, so the fact shuffle carries only rows
    that can still satisfy the pair condition (2/25 of suppliers and
    customers). One shuffle on orderkey, one on custkey; supplier side
    rides a broadcast. The OR-pair filter runs after both names are
    attached — cheap, it sees only pre-pruned rows."""
    two = ("NATION_3", "NATION_8")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*two))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == two[0]) & (F.col("cust_nation") == two[1]))
            | ((F.col("supp_nation") == two[1]) & (F.col("cust_nation") == two[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(revenue_col().alias("revenue"))
    )


# --- Q8: market share of one supplier nation within a region ---------------

@query(
    "q8_market_share",
    oracle="""
    WITH flows AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sum(CASE WHEN ns.n_name = 'NATION_5'
                      THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      ELSE 0 END)::BIGINT AS num,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS den
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'EUROPE'
        AND p.p_type = 'PROMO'
      GROUP BY year(o.o_orderdate)
    )
    SELECT o_year,
           ((2 * num * 10000 + den) // (2 * den)) / 10000.0 AS mkt_share
    FROM flows
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5 suppliers' share of the EUROPE market
    for PROMO parts, by order year (p_type stands in for the absent
    p_container/shipmode qualifiers). Numerator and denominator are
    exact BIGINT revenue units accumulated in ONE conditional pass —
    never two scans — and the share is integer half-up to 4 decimals
    ((2a+b) div 2b; num>=0 so the identity holds). The fact side
    shuffles twice (orderkey, custkey); part, supplier+nation, and
    nation+region dims all broadcast. Decimal cast before the
    cross-multiply keeps the quotient exact past long range."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    units = cents("l_extendedprice") * (100 - cents("l_discount"))
    flows = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", units).otherwise(F.lit(0))
            ).alias("num"),
            F.sum(units).alias("den"),
        )
    )
    share = share_half_up_4dp(F.col("num"), F.col("den"))
    return flows.select("o_year", share.alias("mkt_share"))


# --- Q9: product-line profit by nation and year ----------------------------

@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {REVENUE_SQL} AS amount
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: discounted revenue for one product line ('red'
    parts — the classic '%green%' LIKE probe on p_name) rolled up by
    supplier nation x order year. The corpus has no partsupp, so
    amount omits the supplycost term; the plan shape is Q9's: the LIKE
    filter prunes part BEFORE the fact join (broadcast semi-shape),
    supplier+nation broadcast, one fact shuffle on orderkey, then the
    grouped rollup. 25 nations x ~7 years keeps the final agg tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(revenue_col().alias("amount"))
    )


# --- Q10: returned-item customer ranking -----------------------------------

@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey,
           any_value(c.c_name) AS c_name,
           {REVENUE_SQL} AS revenue,
           any_value(c.c_acctbal) AS c_acctbal,
           any_value(n.n_name) AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. Both selective predicates (quarter, returnflag) are pushed
    into their scans; lineitem joins pre-filtered orders on orderkey
    (one fact shuffle), then the much smaller returned-revenue rows
    join customer on custkey; nation broadcasts. Revenue is integer
    cents so the top-20 boundary is float-tie-free, and the sort chain
    ends at the group key — fully deterministic. Executes as
    TakeOrderedAndProject (no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_name").alias("c_name"),
            revenue_col().alias("revenue"),
            F.any_value("c_acctbal").alias("c_acctbal"),
            F.any_value("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- Q16: supplier variety census with NOT-IN exclusion --------------------

@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type) bucket, excluding a blacklist (negative-acctbal
    suppliers stand in for the absent '%Complaints%' comment probe;
    the corpus has no partsupp, so lineitem supplies the
    part-supplier pairs). The NOT IN compiles to a broadcast
    left-anti join (s_suppkey is non-null, so NOT IN == anti-join);
    brand/size predicates prune part before the fact join. The
    count(DISTINCT) runs as Spark's two-phase expand-aggregate —
    partial per partition, exact after one shuffle on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --- Q19: OR-of-ANDs discounted revenue ------------------------------------

@query(
    "q19_or_of_ands",
    oracle=f"""
    SELECT {REVENUE_SQL} AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a 3-arm OR-of-ANDs predicate mixing
    part attributes and lineitem quantity. The single-table conjuncts
    are FACTORED OUT so Catalyst pushes them into each scan: part
    pruned to the 3 brands / max size band, lineitem pruned to the
    union quantity band, both before the join; the exact 3-arm
    predicate then runs on the joined (already tiny) stream. This is
    the standard CNF-extraction rewrite the TPC-H spec expects of an
    optimizer — stated explicitly here because the residual OR itself
    is not pushable through the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#21")
        & (F.col("p_size") <= 15)
        & (F.col("p_size") >= 1)
    )
    arm = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(arm)
        .agg(revenue_col().alias("revenue"))
    )


# --- Q21: the-only-supplier-at-fault census (EXISTS / NOT EXISTS) ----------

@query(
    "q21_blamed_suppliers",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey, l_returnflag
      FROM lineitem
    )
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM pairs l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM pairs l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM pairs l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY one at fault
    (returnflag='R' stands in for the absent receiptdate>commitdate
    lateness predicate) on a finished multi-supplier order. The
    oracle states it as the spec's correlated EXISTS + NOT EXISTS;
    the Spark plan DECORRELATES both into two stacked aggregates,
    each map-side-combined so the exchanges carry pair / order
    partials, never lineitem rows: first collapse lineitem to
    per-(order, supplier) rows with an at-fault flag, then per order count
    suppliers and at-fault suppliers — EXISTS (another supplier) ==
    n_supp > 1, NOT EXISTS (another at-fault) == n_fault == 1 — and
    because a qualifying order has EXACTLY one at-fault supplier,
    carry that supplier out of the same aggregate (max of the flagged
    key) instead of re-joining the pair table. Zero correlated
    re-scans, no count_distinct expand, one fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    per_pair = (
        li.select("l_orderkey", "l_suppkey", "l_returnflag")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_returnflag") == "R").alias("has_r"))
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("has_r").cast("long")).alias("n_fault"),
        F.max(F.when(F.col("has_r"), F.col("l_suppkey"))).alias("fault_supp"),
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_fault") == 1))
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("fault_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --- Q22: rich-but-idle customers (scalar subquery + anti-join) ------------

@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH seg_avg AS (
      SELECT c_mktsegment,
             sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS bal_sum,
             count(*)::BIGINT AS bal_cnt
      FROM customer WHERE c_acctbal > 0
      GROUP BY c_mktsegment
    )
    SELECT c.c_mktsegment AS segment,
           count(*)::BIGINT AS numcust,
           (sum(CAST(round(c.c_acctbal * 100) AS BIGINT))::BIGINT) / 100.0
             AS totacctbal
    FROM customer c
    JOIN seg_avg a ON c.c_mktsegment = a.c_mktsegment
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * a.bal_cnt > a.bal_sum
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers richer than their segment's
    positive-balance average who have gone dormant — no order since
    1999 (c_mktsegment stands in for the absent phone country code;
    the recency window replaces never-ordered, which this corpus's
    uniform order generator leaves almost empty). The
    correlated scalar-avg subquery is decorrelated into a per-segment
    (sum, count) aggregate — 5 rows, broadcast — and the
    above-average test is CROSS-MULTIPLIED (bal_cents * cnt > sum):
    pure BIGINT, no division, so the cut can never straddle a float
    boundary. NOT EXISTS (orders) is a left-anti join shuffled on
    custkey; at 100 TB both sides hash-partition on the key, nothing
    broadcasts but the 5-row aggregate."""
    c = load_table(spark, sf_dir, "customer")
    seg = (
        c.filter(F.col("c_acctbal") > 0)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.sum(cents("c_acctbal")).alias("bal_sum"),
            F.count(F.lit(1)).alias("bal_cnt"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(seg), F.col("c_mktsegment") == F.col("seg"))
        .filter(cents("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")) / F.lit(100.0)).alias("totacctbal"),
        )
    )


# --- Q6: forecasting revenue change (pure predicate scan) ------------------

@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100)::DOUBLE
           / 100 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: what-if revenue of dropping a discount band — a pure
    predicate scan-and-sum, zero joins. All three predicates push into
    the parquet scan (PushedFilters: shipdate range, discount range,
    quantity bound) and the projection reads exactly two columns; the
    whole query is one WholeStageCodegen span over the pruned scan plus
    a 1-row partial-sum exchange. The discount literals compare against
    the same stored doubles on both engines, so the band edges cannot
    diverge. Revenue = sum(ep_cents * disc_cents), integer half-up to
    cents — the ep*disc analog of REVENUE_SQL."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    units = F.sum(cents("l_extendedprice") * cents("l_discount"))
    return li.agg(
        (int_div(units + 50, 100).cast("double") / 100).alias("revenue")
    )


# --- Q15: top supplier(s) by quarterly revenue (view + scalar max) ---------

@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           (((rev.units + 50) // 100)::DOUBLE / 100) AS total_revenue
    FROM supplier s
    JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.units = (SELECT max(units) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) achieving the maximum quarterly
    revenue — the revenue 'view' reused both as the ranking input and
    inside the scalar-max subquery. The Spark plan computes the
    grouped revenue ONCE (Catalyst ReuseExchange folds the second
    reference onto the same exchange), reduces it to a 1-row max, and
    broadcast-joins that scalar back — the decorrelated form of the
    WHERE units = (SELECT max...). The equality is on exact BIGINT
    revenue units (not the rounded double), so cross-engine max ties
    are impossible to split."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
            "units"
        )
    )
    top = rev.agg(F.max("units").alias("max_units"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), F.col("units") == F.col("max_units"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (int_div(F.col("units") + 50, 100).cast("double") / 100).alias(
                "total_revenue"
            ),
        )
    )


# --- Q20: suppliers concentrated on one product line (nested aggregates) ---

@query(
    "q20_red_part_specialists",
    oracle="""
    WITH per_supp AS (
      SELECT l.l_suppkey,
             sum(CAST(round(l.l_quantity) AS BIGINT))::BIGINT AS total_qty,
             sum(CASE WHEN p.p_name LIKE '%red%'
                      THEN CAST(round(l.l_quantity) AS BIGINT)
                      ELSE 0 END)::BIGINT AS red_qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY l.l_suppkey
    )
    , corpus AS (
      SELECT sum(total_qty)::BIGINT AS tot_all, sum(red_qty)::BIGINT AS red_all
      FROM per_supp
    )
    SELECT s.s_name, ps.red_qty, ps.total_qty
    FROM per_supp ps
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    CROSS JOIN corpus
    WHERE ps.red_qty * corpus.tot_all > corpus.red_all * ps.total_qty
    ORDER BY s.s_name
    """,
)
def q20_red_part_specialists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped volume is concentrated
    in one product line — above the corpus-wide 'red' share (the
    corpus has no partsupp availability, so shipped-quantity share
    stands in for the excess-stock predicate, and the corpus share
    stands in for the spec's 0.5*sum threshold subquery). The
    nested-aggregate semi-join is decorrelated into ONE conditional
    grouped pass: total and line-specific quantities accumulate
    together (sum + sum(CASE)); the corpus threshold is a 1-row
    aggregate OF THE SAME per-supplier subtree (ReuseExchange)
    broadcast back; the above-share cut is cross-multiplied to BIGINT
    (red*tot_all > red_all*total — no division, no float boundary).
    Quantities are integral doubles in the corpus; round-to-BIGINT
    makes the sums exact. One fact shuffle on suppkey; part
    broadcasts into the scan-side join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_name").like("%red%").alias("is_red")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    per_supp = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(qty).alias("total_qty"),
            F.sum(F.when(F.col("is_red"), qty).otherwise(F.lit(0))).alias(
                "red_qty"
            ),
        )
    )
    corpus = per_supp.agg(
        F.sum("total_qty").alias("tot_all"), F.sum("red_qty").alias("red_all")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_supp.crossJoin(F.broadcast(corpus))
        .filter(
            F.col("red_qty") * F.col("tot_all")
            > F.col("red_all") * F.col("total_qty")
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "red_qty", "total_qty")
        .orderBy("s_name")
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS units
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l_partkey
    ), t AS (
      SELECT CAST(sum(units) AS BIGINT) AS total, count(*) AS ng FROM v
    )
    SELECT partkey, units AS value_units
    FROM v, t
    WHERE units * ng > 2 * total
    ORDER BY value_units DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's plan shape over the columns the corpus has: the
    canonical Q11 aggregates partsupp (supplycost*availqty per part for
    one nation's suppliers, HAVING value > a scalar-subquery fraction of
    the total). The corpus ships no partsupp table, so the value
    measure is lineitem extendedprice*quantity per part restricted to
    NATION_5's suppliers — same join graph (fact ⋈ supplier ⋈ nation
    with the nation predicate pushed into a pre-pruned broadcast dim),
    same group-then-scalar-threshold structure. The TPC-H FRACTION
    literal is SF-dependent (0.0001/SF); the SF-independent analog is
    'value > 2x the average part value', which keeps the scalar
    aggregate subquery while staying selective at every graded SF
    (162 rows at sf0.01, 1810 at sf0.1).

    Exactness: per-part value in integer units (cents x integral qty,
    BIGINT); the HAVING is cross-multiplied (units*ng > 2*total) so no
    division reaches the comparison. Scale: one shuffle for the part
    aggregate; the threshold is a 1-row broadcast aggregate of the SAME
    grouped subtree (ReuseExchange, the q15/q20 pattern); suppliers of
    one nation broadcast as a semi-join probe, so lineitem never
    shuffles for the dim side.
    Reference: SURVEY §2 warehouse suite; TPC-H spec Q11.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    units_row = cents("l_extendedprice") * F.round("l_quantity").cast("long")
    v = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(units_row).alias("units"))
    )
    tot = v.agg(F.sum("units").alias("total"), F.count(F.lit(1)).alias("ng"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("units") * F.col("ng") > 2 * F.col("total"))
        .select("partkey", F.col("units").alias("value_units"))
        .orderBy(F.col("value_units").desc(), "partkey")
    )
