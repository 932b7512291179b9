"""Analytic SQL surface beyond the reference: window functions,
grouping sets (ROLLUP/CUBE), and as-of joins.

SURVEY.md §2.11 records that the reference has none of these — its
escape hatch is raw CozoScript. Ours is Spark SQL, so a "complete
engine" must cover the analytic constructs a warehouse user expects;
each is oracle-checked against DuckDB's independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mie_spark.queries import query
from mie_spark.queries.relational import REVENUE_SQL, cents, revenue_col
from mie_spark.sources import load_table


@query(
    "w_rank_per_group",
    oracle="""
    SELECT nation, c_custkey, bal, rnk FROM (
      SELECT n.n_name AS nation, c.c_custkey,
             round(c.c_acctbal, 2) AS bal,
             rank() OVER (PARTITION BY n.n_name
                          ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rnk <= 3
    """,
)
def w_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation: broadcast the nation dim,
    one shuffle on the window partition key. The rank filter runs
    before any projection fan-out, so the window state stays 3 rows per
    group. Tie-break on c_custkey makes ranking total and the hash
    deterministic."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.col("c_acctbal"),
        )
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("nation", "c_custkey", "bal", "rnk")
    )


@query(
    "a_rollup_suppliers",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(s.s_suppkey) AS n_suppliers,
           ((sum(CAST(round(s.s_acctbal * 100) AS BIGINT)))::DOUBLE / 100) AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def a_rollup_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation): per-nation, per-region subtotal, and
    grand total in one pass — Spark expands the grouping sets before
    the single hash aggregate, so it's still one shuffle. Balances sum
    in integer cents (double sums round differently across engines)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "s_suppkey",
            "s_acctbal",
        )
        .rollup("region", "nation")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            (F.sum(cents("s_acctbal")).cast("double") / 100).alias("total_bal"),
        )
    )


@query(
    "a_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           ((sum(CAST(round(o_totalprice * 100) AS BIGINT)))::DOUBLE / 100) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions: all four grouping sets
    from one scan + one shuffle (the grouping-set expansion multiplies
    rows 4x pre-shuffle, still map-side combined)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents("o_totalprice")).cast("double") / 100).alias("total"),
    )


@query(
    "w_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ((sum(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING))::DOUBLE / 100) AS running_spend
    FROM orders
    """,
)
def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer ordered by date: the classic
    running-sum window, in integer cents. One shuffle on o_custkey."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100).alias(
            "running_spend"
        ),
    )


@query(
    "ev_asof_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           epoch_us(max(e.ts)) AS last_event_us,
           count(e.event_id) AS n_events_before
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each order, the latest event at-or-before the
    order date for the same user (plus how many preceded it).

    Expressed as the union-and-sweep as-of: tag both sides, union them,
    and run ONE window pass per user ordered by time — a running count
    of event rows and a carried-forward last event timestamp, read off
    at each order row. This is O(n log n) per user with a single
    shuffle on the user key and NO row expansion, unlike the naive
    equi-join-with-bound + re-aggregate, whose intermediate is
    |orders| x |matching events| (quadratic in events-per-user: the
    thing that dies first on a skewed 100 TB user). Event rows sort
    before order rows at equal timestamps so the `<=` bound includes
    ties. Orders with no prior events keep NULL/0 (left-join parity)."""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    # NULL hardening, matching the SQL join's semantics exactly:
    # - a NULL ts would sort before every order row and be swept into
    #   the running count; `e.ts <= o.o_orderdate` matches no such row
    # - a NULL user_id event would share the NULL window partition with
    #   NULL-custkey orders (window partitioning is NULL-equal, the
    #   equi-join is not), inflating their counts; the join matches no
    #   NULL keys, so drop them too. NULL-custkey ORDERS stay: the left
    #   join keeps them with count 0 / NULL last event, and with NULL
    #   events gone their partition holds no event rows.
    ev_tag = e.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),  # events first at equal t => inclusive bound
        F.when(F.col("event_id").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("cnt"),
        F.col("ts").alias("ev_ts"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    ord_tag = o.select(
        F.col("o_custkey").alias("u"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("side"),
        F.lit(0).alias("cnt"),
        F.lit(None).cast("timestamp").alias("ev_ts"),
        "o_orderkey",
    )
    w = (
        Window.partitionBy("u")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = ev_tag.unionByName(ord_tag).select(
        "u",
        "side",
        "o_orderkey",
        F.sum("cnt").over(w).alias("n_events_before"),
        F.last("ev_ts", ignorenulls=True).over(w).alias("last_ev"),
    )
    return swept.filter(F.col("side") == 1).select(
        "o_orderkey",
        F.col("u").alias("o_custkey"),
        F.unix_micros(F.col("last_ev")).alias("last_event_us"),
        "n_events_before",
    )


# --- TPC-H-Q3-style shipping priority (join + agg + deterministic top-k) ----

@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {REVENUE_SQL} AS revenue,
           strftime(any_value(o.o_orderdate), '%Y-%m-%d') AS orderdate,
           any_value(o.o_orderpriority) AS orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-06-15'
      AND l.l_shipdate  > TIMESTAMP '1996-06-15'
    GROUP BY l.l_orderkey
    ORDER BY revenue DESC, orderdate, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders ranking: filtered 3-way join, grouped exact
    fixed-point revenue, fully deterministic top-10 (revenue is integer
    cents and the sort key chain ends in the group key, so the LIMIT
    boundary can never straddle a cross-engine float tie). Catalyst
    executes the final step as TakeOrderedAndProject — no global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(li.l_orderkey.alias("orderkey"))
        .agg(
            revenue_col().alias("revenue"),
            F.date_format(F.any_value("o_orderdate"), "yyyy-MM-dd").alias(
                "orderdate"
            ),
            F.any_value("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), "orderdate", "orderkey")
        .limit(10)
    )


# --- TPC-H-Q18-style large-volume orders (HAVING semi-join) -----------------

@query(
    "q18_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c.c_custkey, any_value(c.c_name) AS c_name,
           o.o_orderkey AS orderkey,
           strftime(any_value(o.o_orderdate), '%Y-%m-%d') AS orderdate,
           round(any_value(o.o_totalprice), 2) AS totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, o.o_orderkey
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: a grouped-HAVING subquery driving a
    left-semi join, then re-aggregation with the customer dimension.
    The `big` aggregate reuses the same l_orderkey exchange as the
    outer sum (Catalyst ReuseExchange); the key list is tiny after the
    HAVING cut, so AQE converts the semi-join to broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy(
            c.c_custkey,
            o.o_orderkey.alias("orderkey"),
        )
        .agg(
            F.any_value("c_name").alias("c_name"),
            F.date_format(F.any_value("o_orderdate"), "yyyy-MM-dd").alias(
                "orderdate"
            ),
            F.round(F.any_value("o_totalprice"), 2).alias("totalprice"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .select(
            "c_custkey", "c_name", "orderkey", "orderdate", "totalprice", "total_qty"
        )
    )


# --- TPC-H-Q13-style customer distribution (left-outer + double agg) --------

@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count histogram with the join predicate on the
    OUTER side (customers with zero non-urgent orders must survive as
    c_count=0 — a filter-before-join, not a WHERE, which would turn the
    outer join inner). Two aggregations: the first shuffles on the join
    key it already has (no extra exchange under AQE); the second's
    domain is |distinct counts| — tiny at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- NOT EXISTS anti-join (customers with no 1997 orders) -------------------

@query(
    "j8_anti_join_inactive",
    oracle="""
    SELECT c.c_nationkey, count(*) AS n_inactive
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    )
    GROUP BY c.c_nationkey
    """,
)
def j8_anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti hash join: customers with no orders
    since 1997, counted per nation. The orders side is pre-filtered and
    projected to the key column only before the anti join, so the build
    side is one slim column; the date filter pushes to the parquet scan
    (PushedFilters) and never reads the wide columns."""
    c = load_table(spark, sf_dir, "customer")
    active = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(active, c.c_custkey == active.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


# --- lag window: month-over-month delta -------------------------------------

@query(
    "w_lag_monthly_delta",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
      FROM orders GROUP BY 1
    )
    SELECT month, total_cents,
           (total_cents - lag(total_cents) OVER (ORDER BY month))::BIGINT AS delta_cents
    FROM m
    """,
)
def w_lag_monthly_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue delta via lag(). Sums are integer cents
    (order-independent, engine-agreed); the unpartitioned window runs
    over |months| rows — a dozen per year — AFTER aggregation, so the
    single-partition window never sees raw data. First month keeps a
    NULL delta, exercising null-handling in the hash compare."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(F.sum(cents("o_totalprice")).alias("total_cents"))
    w = Window.orderBy("month")
    return m.select(
        "month",
        "total_cents",
        (F.col("total_cents") - F.lag("total_cents").over(w)).alias(
            "delta_cents"
        ),
    )


# --- explicit GROUPING SETS (beyond ROLLUP/CUBE) ----------------------------

@query(
    "a_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not expressible as one ROLLUP/CUBE
    prefix chain is the general case; this instance picks three
    explicit sets). Spark expands the sets with a single Expand node
    over one scan — 3× the rows into one shuffle, never 3 scans."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )


# --- argmin-per-group (TPC-H-Q2's correlated-min shape) ---------------------

@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT p_partkey, suppkey, price_cents FROM (
      SELECT l.l_partkey AS p_partkey, l.l_suppkey AS suppkey,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents,
             row_number() OVER (
               PARTITION BY l.l_partkey
               ORDER BY round(l.l_extendedprice * 100), l.l_suppkey
             ) AS rn
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size = 15
    ) WHERE rn = 1
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-min (TPC-H Q2 shape): cheapest supplier per part,
    decorrelated into a row_number window instead of a rescan-per-part
    subquery. The part-dimension filter broadcasts and prunes before
    the window shuffle on l_partkey; integer-cent ordering plus the
    suppkey tie-break keeps the argmin unique across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    w = Window.partitionBy("l_partkey").orderBy(
        cents("l_extendedprice"), "l_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("suppkey"),
            cents("l_extendedprice").alias("price_cents"),
        )
    )


# --- statistical moment aggregates ------------------------------------------

@query(
    "a_stats_moments",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           ((2 * sum(CAST(l_quantity AS BIGINT))::BIGINT * 1000000 + count(*))
              // (2 * count(*))) / 1000000.0 AS mean_qty,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate family (stddev/variance/corr/covar) in
    one single-shuffle pass. All of these are mergeable sufficient-
    statistic aggregates (n, Σx, Σx², Σxy), so map-side partials work
    at any scale; both engines use numerically stable one-pass updates,
    and 6dp rounding absorbs their summation-order difference."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        # integral quantities: 6-decimal mean via the integer half-up
        # formula (see q1), never round() on a double
        (
            F.expr(
                "(2 * sum(cast(l_quantity as bigint)) * 1000000 + count(1))"
                " div (2 * count(1))"
            )
            / F.lit(1e6)
        ).alias("mean_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "covar_qty_price"
        ),
    )


@query(
    "a_salted_agg",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           min(l_orderkey) AS min_ok,
           max(l_orderkey) AS max_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew toolkit under the oracle: a two-stage SALTED aggregation
    (operators/skew.py salted_groupby_agg — hot keys spread over 8
    partial groups, then combined) on the 3-key l_returnflag column,
    hash-compared against a plain one-stage GROUP BY. 3 groups over
    millions of rows is exactly the shape where every partial for a key
    funnels into one reducer; the salt stage caps any reducer's share
    at 1/8. The oracle proves the decomposed combiners (count-of-counts,
    sum-of-sums, min-of-mins) reconstruct the exact answer."""
    from mie_spark.operators.skew import salted_groupby_agg

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        cents("l_extendedprice").alias("price_cents"),
        "l_orderkey",
    )
    return salted_groupby_agg(
        li,
        "l_returnflag",
        {
            "n": ("count", "qty"),
            "sum_qty": ("sum", "qty"),
            "sum_price_cents": ("sum", "price_cents"),
            "min_ok": ("min", "l_orderkey"),
            "max_ok": ("max", "l_orderkey"),
        },
        n_salt=8,
    )


@query(
    "w_trailing_7d",
    oracle="""
    WITH daily AS (
      SELECT o_custkey,
             CAST(epoch(date_trunc('day', o_orderdate)) // 86400 AS BIGINT)
               AS day_no,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey, day_no,
           CAST(sum(cents) OVER (
             PARTITION BY o_custkey ORDER BY day_no
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trailing_7d_cents
    FROM daily
    """,
)
def w_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-calendar-day spend per customer: a RANGE frame over
    integer day numbers — the time-based sliding window ROWS frames
    cannot express (a RANGE frame keys on the VALUE distance, so gaps
    in activity shrink the window correctly instead of reaching back 7
    ROWS across months). Pre-aggregating to (customer, day) first keeps
    the window input at one row per active day — the frame scan is over
    days, not orders — and the explicit repartition on o_custkey ALONE
    makes the rollup and the window share ONE shuffle (hash(custkey)
    clusters every (custkey, day) group AND satisfies the window's
    partitioning; letting groupBy pick hash(custkey, day) forces the
    window to re-exchange — pinned in tests/test_plans.py). Exact
    BIGINT cents everywhere."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.repartition("o_custkey")
        .groupBy(
            "o_custkey",
            F.expr("unix_date(CAST(o_orderdate AS DATE))").cast("long").alias(
                "day_no"
            ),
        )
        .agg(F.sum(cents("o_totalprice")).alias("cents"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_custkey",
        "day_no",
        F.sum("cents").over(w).alias("trailing_7d_cents"),
    )


@query(
    "a_robust_stats",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    stats AS (
      SELECT r.event_type,
             quantile_cont(abs(r.value - m.med), 0.5) AS mad,
             count(*) FILTER (r.rn > r.n // 10 AND r.rn <= r.n - r.n // 10)
               ::BIGINT AS n_trim,
             sum(CAST(round(r.value * 100) AS BIGINT))
               FILTER (r.rn > r.n // 10 AND r.rn <= r.n - r.n // 10)
               ::BIGINT AS cents_trim
      FROM ranked r JOIN med m USING (event_type)
      GROUP BY r.event_type
    )
    SELECT m.event_type,
           round(m.med, 6) AS median,
           round(s.mad, 6) AS mad,
           CASE WHEN s.cents_trim < 0
                THEN -((-2 * s.cents_trim * 100 + s.n_trim) // (2 * s.n_trim))
                ELSE ((2 * s.cents_trim * 100 + s.n_trim) // (2 * s.n_trim))
           END / 10000.0 AS trimmed_mean
    FROM med m JOIN stats s USING (event_type)
    """,
)
def a_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics per event type — the outlier-resistant
    monitoring trio: exact interpolated median, MAD (median absolute
    deviation, the robust spread measure), and the 10%-trimmed mean
    (drop the k = n div 10 lowest and highest OBSERVATIONS — the
    textbook rank-based definition).

    Trim membership is a pure INTEGER decision (rank vs n div 10):
    comparing raw values against interpolated percentile bounds would
    hang the kept set on a float boundary two engines can lerp 1 ulp
    apart; ranks cannot disagree, and ties in `value` are harmless
    because the kept MULTISET of values is rank-order-invariant. Two
    passes by necessity (MAD and the trim band are defined against the
    median/ranks), but the second pass computes MAD and the trimmed
    sums in ONE grouped aggregate over the rank window + broadcast
    median join. The trimmed mean rounds half-AWAY-FROM-ZERO over
    exact-cents sums: the (2a*100+n) div (2n) half-up identity only
    holds for a >= 0 (both Spark `div` and DuckDB `//` truncate toward
    zero), so a negative trimmed sum is folded through abs() and the
    sign reapplied — identical integer arithmetic on both engines for
    either sign. At 100 TB: exact median → t-digest sketch, exact
    ranks → approx quantile cut points, identical shape."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    wp = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wp.orderBy("value")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    in_band = (F.col("rn") > F.expr("n div 10")) & (
        F.col("rn") <= F.col("n") - F.expr("n div 10")
    )
    stats = (
        ranked.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            ),
            F.count(F.when(in_band, 1)).alias("n_trim"),
            F.sum(F.when(in_band, cents("value"))).alias("cents_trim"),
        )
    )
    return med.join(stats, "event_type").select(
        "event_type",
        F.round("med", 6).alias("median"),
        F.round("mad", 6).alias("mad"),
        (
            F.expr(
                "CASE WHEN cents_trim < 0"
                " THEN -((-2 * cents_trim * 100 + n_trim) div (2 * n_trim))"
                " ELSE ((2 * cents_trim * 100 + n_trim) div (2 * n_trim)) END"
            )
            / F.lit(1e4)
        ).alias("trimmed_mean"),
    )


# --- percent-of-total window (ratio_to_report shape) ------------------------

@query(
    "w_revenue_share",
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey, n.n_name AS nation,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS units
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT r.r_name AS region, nat.nation,
           ((nat.units + 50) // 100)::DOUBLE / 100 AS revenue,
           ((2 * nat.units * 10000
             + (sum(nat.units) OVER (PARTITION BY nat.n_regionkey))::BIGINT)
            // (2 * (sum(nat.units) OVER (PARTITION BY nat.n_regionkey))::BIGINT))
           / 10000.0 AS share
    FROM nat JOIN region r ON nat.n_regionkey = r.r_regionkey
    """,
)
def w_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total within a hierarchy level — the ratio_to_report
    window shape (unordered SUM over a partition) the window family
    did not yet cover: each nation's supplier revenue as a share of
    its region. The share divides exact BIGINT unit sums via the
    integer half-up 4-decimal identity (units >= 0), and the window
    runs over the 25-row nation AGGREGATE, never the fact table — at
    100 TB the only real cost is the one fact shuffle feeding the
    aggregate; the percent-of-total pass is constant-size."""
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_regionkey", F.col("n_name").alias("nation"))
    )
    r = load_table(spark, sf_dir, "region")
    units = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    nat = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_regionkey", "nation")
        .agg(units.alias("units"))
    )
    from mie_spark.queries.relational import int_div, share_half_up_4dp

    w = Window.partitionBy("n_regionkey")
    tot = F.sum("units").over(w)
    share = share_half_up_4dp(F.col("units"), tot)
    return (
        nat.withColumn("revenue", int_div(F.col("units") + 50, 100).cast("double") / 100)
        .withColumn("share", share)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("r_name").alias("region"), "nation", "revenue", "share")
    )


# --- market-basket association rules -----------------------------------------

@query(
    "a_assoc_rules",
    oracle="""
    WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT count(DISTINCT o)::BIGINT AS n_tx FROM e),
    supp AS (SELECT p, count(*)::BIGINT AS n_p FROM e GROUP BY p),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS n_ab
      FROM e a JOIN e b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING count(*) >= 2
    ),
    dirs AS (
      SELECT pa AS ante, pb AS cons, n_ab FROM pairs
      UNION ALL
      SELECT pb AS ante, pa AS cons, n_ab FROM pairs
    )
    SELECT d.ante, d.cons, d.n_ab, sa.n_p AS n_ante, sc.n_p AS n_cons,
           (d.n_ab * 20000 + sa.n_p) // (2 * sa.n_p) / 10000.0 AS conf,
           (d.n_ab * n.n_tx * 20000 + sa.n_p * sc.n_p)
             // (2 * sa.n_p * sc.n_p) / 10000.0 AS lift
    FROM dirs d
    JOIN supp sa ON sa.p = d.ante
    JOIN supp sc ON sc.p = d.cons
    CROSS JOIN n
    WHERE 10 * d.n_ab >= sa.n_p
      AND d.n_ab * n.n_tx > sa.n_p * sc.n_p
    """,
)
def a_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (the Apriori/FP-growth output
    shape at k=2): item-pair rules ante=>cons over order baskets with
    support >= 2 transactions, confidence >= 0.1, lift > 1. Every cut
    is cross-multiplied BIGINT (10*n_ab >= n_ante <=> conf >= 0.1;
    n_ab*N > n_ante*n_cons <=> lift > 1) and the reported conf/lift
    are integer half-up 4dp, so no threshold or output can straddle a
    float boundary between engines.

    Scale shape: TPC-H baskets are naturally bounded (<= 7 lines), so
    in-row pair generation from a per-order collect_list is map-side
    after ONE order-keyed shuffle — C(7,2) = 21 pair rows per order,
    linear in lineitem. Item supports ride the same exploded stream;
    the support table joins back as a BROADCAST (it is |parts| rows —
    a dimension, not a fact; at a scale where it stopped fitting,
    AQE's shuffle join takes over with the same semantics). The
    transaction count N is a 1-row broadcast. A general-corpus caller
    would cap basket width like dedup's shingle-df cap; the cap is not
    needed here and not applied."""
    from mie_spark.queries.relational import share_half_up_4dp
    from pyspark.sql.window import Window as W

    e = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # copurchase's no-join-back shape: item support rides each edge via
    # ONE part-keyed window, baskets collect (p, n_p) structs, and the
    # in-row pair explode carries both supports — the rule stream never
    # joins back to a support table. The transaction count is a 1-row
    # broadcast from a separate 1-column scan (cheaper than forcing the
    # basket subtree to be consumed twice, which Catalyst will not
    # collapse to one exchange).
    e = e.withColumn("n_p", F.count(F.lit(1)).over(W.partitionBy("p")))
    baskets = e.groupBy("o").agg(
        F.collect_list(F.struct("p", "n_p")).alias("items")
    )
    n_tx = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_tx"))
    )
    # In-row pair enumeration via sort_array + posexplode + slice
    # (r13 optimization): the previous nested transform x transform
    # built n^2 structs per basket and filtered to the n(n-1)/2 with
    # pa < pb — and Spark's higher-order functions are CodegenFallback
    # (interpreted per row), so the n^2 struct construction ran outside
    # whole-stage codegen. sort_array orders the basket by p (p is
    # distinct within a basket — e is DISTINCT (o, p) — so the struct
    # sort's p-first lexicographic order is a total order on items and
    # n_p never breaks a tie), after which every (i, j>i) position pair
    # IS a pa < pb value pair: posexplode + explode(slice(...)) emit
    # exactly those pairs through codegen'd generators, never
    # materializing the discarded half. Same pair multiset, verified
    # exact-equal at sf0.1; alternating same-session A/B medians
    # 1.69 -> 1.46 s (noop sink), and at scale the per-basket work
    # drops from interpreted O(n^2) allocations to generated O(pairs).
    pairs = (
        baskets.select(F.sort_array("items").alias("items"))
        .select("items", F.posexplode("items").alias("i", "a"))
        .select(
            F.col("a"),
            F.explode(
                F.slice("items", F.col("i") + 2, F.size("items"))
            ).alias("b"),
        )
        .groupBy(
            F.col("a.p").alias("pa"),
            F.col("b.p").alias("pb"),
            F.col("a.n_p").alias("n_a"),
            F.col("b.n_p").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    dirs = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("ante"),
                    F.col("pb").alias("cons"),
                    F.col("n_ab"),
                    F.col("n_a").alias("n_ante"),
                    F.col("n_b").alias("n_cons"),
                ),
                F.struct(
                    F.col("pb").alias("ante"),
                    F.col("pa").alias("cons"),
                    F.col("n_ab"),
                    F.col("n_b").alias("n_ante"),
                    F.col("n_a").alias("n_cons"),
                ),
            )
        ).alias("d")
    ).select("d.ante", "d.cons", "d.n_ab", "d.n_ante", "d.n_cons")
    rules = dirs.crossJoin(F.broadcast(n_tx)).filter(
        (10 * F.col("n_ab") >= F.col("n_ante"))
        & (F.col("n_ab") * F.col("n_tx") > F.col("n_ante") * F.col("n_cons"))
    )
    return rules.select(
        "ante",
        "cons",
        "n_ab",
        "n_ante",
        "n_cons",
        share_half_up_4dp(F.col("n_ab"), F.col("n_ante")).alias("conf"),
        share_half_up_4dp(
            F.col("n_ab") * F.col("n_tx"), F.col("n_ante") * F.col("n_cons")
        ).alias("lift"),
    )


# --- distribution windows: percent_rank / cume_dist / nth_value --------------

@query(
    "w_distribution_stats",
    oracle="""
    WITH r AS (
      SELECT n.n_name AS nation, c.c_custkey,
             round(c.c_acctbal, 2) AS bal,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY n.n_name) AS nn,
             nth_value(c.c_acctbal, 2) OVER
               (PARTITION BY n.n_name
                ORDER BY c.c_acctbal DESC, c.c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS sb
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WINDOW w AS (PARTITION BY n.n_name
                   ORDER BY c.c_acctbal DESC, c.c_custkey)
    )
    SELECT nation, c_custkey, bal,
           CASE WHEN nn = 1 THEN 0.0
                ELSE ((rn - 1) * 2000000 + (nn - 1))
                       // (2 * (nn - 1)) / 1000000.0 END AS pct_rank,
           (rn * 2000000 + nn) // (2 * nn) / 1000000.0 AS cume,
           round(sb, 2) AS second_bal
    FROM r
    """,
)
def w_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows per nation: percent_rank and
    cume_dist of every customer balance plus the nation 2nd-highest
    balance (nth_value over the FULL partition frame — the default
    running frame would return NULL until row 2).

    Numeric stance — a doctrine lesson caught at sf0.1: cume_dist is
    rn/nn, and a group of nn = 640 = 2^7*5 rows puts 41/640 EXACTLY on
    the 7th-decimal tie 0.0640625 (any denominator dividing 10^7 but
    not 10^6 does this — powers of two make such ties reachable at
    small group sizes, not just the 2*10^6*5^6 worst case). Spark
    rounds the shortest decimal repr HALF_UP (0.064063), DuckDB rounds
    the binary double (0.064062). So both ratios are EMITTED via the
    integer half-up formula over (row_number, count) — exact on both
    engines under the total (bal desc, custkey) order — while the
    built-ins percent_rank()/cume_dist() are still exercised: a
    sanity filter keeps only rows where they agree with the integer
    formula to 1e-9, so a regression in either builtin would flag as
    a row-count mismatch. One customer-keyed shuffle, nation dim
    broadcast — all windows share the sort."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("nation")
    from mie_spark.queries.relational import int_div

    base = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.col("c_acctbal"),
        )
        .select(
            "nation",
            "c_custkey",
            "bal",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wp).cast("long").alias("nn"),
            F.percent_rank().over(w).alias("_pr"),
            F.cume_dist().over(w).alias("_cd"),
            F.round(F.nth_value("c_acctbal", 2).over(wf), 2).alias(
                "second_bal"
            ),
        )
    )
    rn, nn = F.col("rn"), F.col("nn")
    pct = F.when(nn == 1, F.lit(0.0)).otherwise(
        int_div((rn - 1) * 2000000 + (nn - 1), 2 * (nn - 1)) / F.lit(1e6)
    )
    cume = int_div(rn * 2000000 + nn, 2 * nn) / F.lit(1e6)
    return (
        base.filter(
            (F.abs(F.col("_pr") * (nn - 1) - (rn - 1)) < 1e-9)
            & (F.abs(F.col("_cd") * nn - rn) < 1e-9)
        )
        .select(
            "nation",
            "c_custkey",
            "bal",
            pct.alias("pct_rank"),
            cume.alias("cume"),
            "second_bal",
        )
    )


# Shared by w_exact_quantiles (batch) and st_exact_quantiles (streaming
# twin in queries/streaming.py) — identical SQL text, the census-twin
# doctrine.
QUANTILES_ORACLE = """
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    census AS (SELECT cents, count(*)::BIGINT AS cnt FROM c GROUP BY 1),
    cum AS (
      SELECT cents, cnt,
             (sum(cnt) OVER (ORDER BY cents
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW))::BIGINT AS cum,
             (sum(cnt) OVER ())::BIGINT AS n
      FROM census
    ),
    t AS (SELECT unnest([25, 50, 75, 90, 99])::BIGINT AS pct)
    SELECT t.pct,
           ((t.pct * cum.n + 99) // 100)::BIGINT AS pos,
           cum.cents
    FROM t JOIN cum
      ON cum.cum >= (t.pct * cum.n + 99) // 100
     AND cum.cum - cum.cnt < (t.pct * cum.n + 99) // 100
    """


def price_cents_census(li: DataFrame) -> DataFrame:
    """The (cents, cnt) value census both exact-percentile forms
    aggregate to — ONE definition so the batch query and the streaming
    twin stay bit-identical (the twin-grading contract)."""
    return (
        li.select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantiles_from_census(census: DataFrame) -> DataFrame:
    """Nearest-rank p25/50/75/90/99 projection over a (cents, cnt)
    value census: two_level_cumsum distributed prefix sum + broadcast
    5-row range join. Shared by w_exact_quantiles (census from one
    batch aggregate) and st_exact_quantiles (census drained from the
    streaming state store); both grade against QUANTILES_ORACLE."""
    from mie_spark.operators.rank import two_level_cumsum
    from mie_spark.queries.relational import int_div

    spark = census.sparkSession
    # materialize the census once (r13): the `tot` branch below and the
    # prefix sum both consume it — without this the census lineage (a
    # full corpus aggregate, or a driver-local streaming sink read)
    # executes once more just to produce the 1-row total
    census = census.localCheckpoint(eager=False)
    cc = two_level_cumsum(census, ["cents"], "cnt", out="cum")
    tot = census.agg(F.sum("cnt").alias("n"))
    targets = spark.createDataFrame(
        [(25,), (50,), (75,), (90,), (99,)], "pct long"
    )
    pos = targets.crossJoin(F.broadcast(tot)).select(
        "pct",
        int_div(F.col("pct") * F.col("n") + 99, 100)
        .cast("long")
        .alias("pos"),
    )
    return cc.join(
        F.broadcast(pos),
        (F.col("cum") >= F.col("pos"))
        & (F.col("cum") - F.col("cnt") < F.col("pos")),
    ).select("pct", "pos", "cents")


@query("w_exact_quantiles", oracle=QUANTILES_ORACLE)
def w_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles at scale — the nearest-rank p25/50/75/90/
    p99 of lineitem price cents computed WITHOUT a global sort, global
    window, or quantile sketch: aggregate to the (cents, cnt) value
    census (bounded by the value domain, not the row count), run the
    distributed prefix sum over it (two_level_cumsum: range exchange +
    partitioned window + |partitions|-row broadcast carry — the
    two_level_rank plan shape), and pick each target position's row
    with a broadcast 5-row range join. This is the exact complement of
    ev_quantile_bound's GK sketch: when the value domain is bounded
    (prices, latencies in micros, token counts), exact quantiles cost
    one census aggregate — no approximation needed.

    Everything is BIGINT (cents, counts, ceil via (p*n+99) div 100),
    so the oracle compares bit-for-bit; ties across equal cents
    collapse into one census row, which is what makes the census form
    deterministic where a row-level row_number over a non-unique key
    would not be."""
    li = load_table(spark, sf_dir, "lineitem")
    return quantiles_from_census(price_cents_census(li))
