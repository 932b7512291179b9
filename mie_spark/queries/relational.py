"""Relational operator coverage: scans, filters, aggregates, sorts, sets.

Maps SURVEY.md §2.1/2.2/2.4/2.5/2.6 operator families onto the test
corpus. Reference parity notes cite /root/reference file:line.

Scale notes (100 TB stance):
- Every filter is expressed declaratively so Catalyst pushes it into the
  parquet scan (`PushedFilters` visible in .explain).
- Aggregations are single-pass (`sum(when(...))` multi-counts) so a
  stats sweep reads the table once, not 8 times like the reference's
  GetStats (reader.go:616-643).
- order/limit/offset compiles to TakeOrderedAndProject — no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.queries import query
from mie_spark.sources import load_table


def cents(col: str) -> "F.Column":
    """Fixed-point view of a 2-decimal money/rate column.

    Money sums are done in integer cents on BOTH the Spark and oracle
    side: double summation order differs across engines, and the
    corpus's 4-decimal-exact products land on round-half .xx5 boundaries
    often enough that a 1-ulp disagreement flips round(x, 2). Integer
    sums are order-independent, so the engines agree bit-for-bit.
    """
    return F.round(F.col(col) * 100).cast("long")


# Canonical implementations live in functions/numeric.py (importable from
# the operator layer too); re-exported here because query modules have
# always pulled money-math helpers from this module.
from mie_spark.functions.numeric import int_div, share_half_up_4dp  # noqa: E402,F401


# revenue in integer fixed-point (companion to `cents`): sum of
# ep_cents * (100 - disc_cents) (units of 1e-4 dollars), rounded to
# cents with *integer* half-up — double round() diverges across engines
# on exact .xx5 ties (Spark rounds the decimal string repr, DuckDB the
# binary value), integer div never does. Lives HERE next to cents /
# int_div so the whole money-math helper surface is one module
# (consumed by queries/graph.py and queries/analytic.py).
REVENUE_SQL = (
    "((sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100)::DOUBLE / 100"
)


def revenue_col() -> "F.Column":
    units = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    # int_div, not floor((units+50)/100): Spark `/` on longs is double
    # division, which loses exactness past 2^53 where the oracle's
    # integer `//` does not
    return int_div(units + 50, 100).cast("double") / 100


# --- flagship: TPC-H-Q1-style pricing summary (F1 + A1/A4 + O1) ----------

@query(
    "q1_pricing_summary",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_linestatus,
             count(*)::BIGINT AS n,
             sum(CAST(l_quantity AS BIGINT))::BIGINT AS qty,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS ep,
             sum(CAST(round(l_discount * 100) AS BIGINT))::BIGINT AS disc,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
               AS dp,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 * (100 + CAST(round(l_tax * 100) AS BIGINT)))::BIGINT AS ch
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           qty::DOUBLE AS sum_qty,
           ep::DOUBLE / 100 AS sum_base_price,
           ((dp + 50) // 100)::DOUBLE / 100 AS sum_disc_price,
           ((ch + 5000) // 10000)::DOUBLE / 100 AS sum_charge,
           ((2 * qty * 10000 + n) // (2 * n)) / 10000.0 AS avg_qty,
           ((2 * ep * 100 + n) // (2 * n)) / 10000.0 AS avg_price,
           ((2 * disc * 100 + n) // (2 * n)) / 10000.0 AS avg_disc,
           n AS count_order
    FROM g
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan + filter + grouped aggregation; the widest single-table
    aggregate in the suite. One shuffle (by the 2 low-cardinality group
    keys); partial aggregation map-side makes the shuffle tiny. ALL
    money/quantity math is integer (see `cents`), including the
    4-decimal averages via the half-up formula (2a+n) div (2n) — no
    round() ever touches a double, because round(double, k) is where
    Spark's decimal-string HALF_UP and DuckDB's binary rounding can
    disagree on identical inputs (a group average is a rational that
    CAN land exactly on a tie boundary)."""
    li = load_table(spark, sf_dir, "lineitem")
    ep, disc, tax = cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(ep).alias("ep"),
            F.sum(disc).alias("disc"),
            F.sum(ep * (100 - disc)).alias("dp"),
            F.sum(ep * (100 - disc) * (100 + tax)).alias("ch"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("qty").cast("double").alias("sum_qty"),
        (F.col("ep").cast("double") / 100).alias("sum_base_price"),
        (int_div(F.col("dp") + 50, 100).cast("double") / 100).alias(
            "sum_disc_price"
        ),
        (int_div(F.col("ch") + 5000, 10_000).cast("double") / 100).alias(
            "sum_charge"
        ),
        (F.expr("(2 * qty * 10000 + n) div (2 * n)") / F.lit(1e4)).alias(
            "avg_qty"
        ),
        (F.expr("(2 * ep * 100 + n) div (2 * n)") / F.lit(1e4)).alias(
            "avg_price"
        ),
        (F.expr("(2 * disc * 100 + n) div (2 * n)") / F.lit(1e4)).alias(
            "avg_disc"
        ),
        F.col("n").alias("count_order"),
    )


# --- S1: full-table scan + projection (reader.go:768-846 export*) --------

@query(
    "s1_scan_projection",
    oracle="""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS retail
    FROM part WHERE p_size > 20
    """,
)
def s1_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + pushed filter; ReadSchema in the plan must show only
    the 4 referenced columns (Catalyst ColumnPruning does what the
    reference's explicit column lists do, reader.go:263-278)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") > 20)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("retail"))
    )


# --- S2: point lookup by key (reader.go:308-382 GetNodeByID) -------------

@query(
    "s2_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS total,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders WHERE o_orderkey = 42
    """,
)
def s2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key = literal equality; pushes to the scan (and to min/max row-group
    skipping on sorted data — the Delta/Z-order analog of the reference's
    primary-key access)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == F.lit(42))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# --- F2/F3: substring match + two-column disjunction (reader.go:138-162) -

@query(
    "f2_substring_match",
    oracle="SELECT doc_id, lang, n_chars FROM documents WHERE contains(text, 'spark join')",
)
def f2_substring_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSearch parity: `str_includes(content, q)` → Column.contains."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").contains("spark join"))
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "f3_disjunction",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE contains(p_name, 'widget') OR p_type = 'PROMO'
    """,
)
def f3_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column OR (reference: or(str_includes(title,q),
    str_includes(rationale,q)), reader.go:146)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").contains("widget") | (F.col("p_type") == "PROMO")
    ).select("p_partkey", "p_name", "p_type")


# --- F4: case-insensitive equality (reader.go:384-393) -------------------

@query(
    "f4_case_insensitive",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE lower(c_mktsegment) = 'building'
    """,
)
def f4_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.lower(F.col("c_mktsegment")) == "building")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# --- F5/F6: range + exclusion predicates → TPC-H-Q6-style revenue --------

@query(
    "f6_range_revenue",
    oracle="""
    SELECT ((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100
            )::DOUBLE / 100 AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_returnflag <> 'A'
    """,
)
def f6_range_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates (F6: `distance < t` analog, conflicts.go:95) and
    inequality exclusion (F5: `neighbor_id != self`, conflicts.go:94),
    all pushed to the scan; global agg needs no shuffle beyond the final
    single-partition reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
            & (F.col("l_returnflag") != "A")
        )
        .agg(
            (
                int_div(
                    F.sum(cents("l_extendedprice") * cents("l_discount")) + 50, 100
                ).cast("double")
                / 100
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- A1/A2: stats sweep as ONE pass (reader.go:616-643 GetStats) ---------

@query(
    "a1_stats_single_pass",
    oracle="""
    SELECT count(*)                                          AS total_orders,
           sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS open_orders,
           sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS finished_orders,
           sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS pending_orders,
           sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS urgent_orders,
           count(DISTINCT o_custkey)                         AS distinct_customers
    FROM orders
    """,
)
def a1_stats_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference issues 8 separate count queries for its stats sweep
    (reader.go:616-643). One conditional-aggregate pass reads the table
    once — at 100 TB that's an 8× scan saving."""
    o = load_table(spark, sf_dir, "orders")

    def flag(cond):  # noqa: ANN001, ANN202
        return F.sum(F.when(cond, 1).otherwise(0))

    return o.agg(
        F.count(F.lit(1)).alias("total_orders"),
        flag(F.col("o_orderstatus") == "O").alias("open_orders"),
        flag(F.col("o_orderstatus") == "F").alias("finished_orders"),
        flag(F.col("o_orderstatus") == "P").alias("pending_orders"),
        flag(F.col("o_orderpriority") == "1-URGENT").alias("urgent_orders"),
        F.countDistinct("o_custkey").alias("distinct_customers"),
    )


# --- A3: sum of counts across relations (reader.go:645-665) --------------

@query(
    "a3_multi_table_counts",
    oracle="""
    SELECT 'orders' AS rel, count(*) AS n FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'events',   count(*) FROM events
    UNION ALL SELECT 'customer', count(*) FROM customer
    """,
)
def a3_multi_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-total parity: per-relation counts unioned (the reference sums
    client-side; we keep it in-plan so it distributes)."""
    parts = []
    for rel in ("orders", "lineitem", "events", "customer"):
        parts.append(
            load_table(spark, sf_dir, rel).agg(
                F.lit(rel).alias("rel"), F.count(F.lit(1)).alias("n")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- A4: group-by counts for display (tools/query.go:70-72) ---------------

@query(
    "a4_groupby_metrics",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           cents / 100.0 AS total_value,
           ((2 * cents * 100 + n) // (2 * n)) / 10000.0 AS avg_value
    FROM g
    """,
)
def a4_groupby_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type display metrics in the exact-cents convention: the sum
    is integer cents (never a float sum), and the 4-decimal average is
    rounded IN INTEGER ARITHMETIC — half-up(a/b) = (2a+b) div (2b) for
    the non-negative operands here — so no round() ever runs on a
    double. round(double, n) is the one place Spark (decimal-string
    HALF_UP) and DuckDB (binary) can disagree on identical inputs; a
    group average is a rational number that can land exactly on a
    .xxxx5 boundary, so the tie is reachable, unlike the sub-ULP
    coincidences float noise would need."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    return g.select(
        "event_type",
        "n",
        (F.col("cents") / F.lit(100.0)).alias("total_value"),
        (
            F.expr("(2 * cents * 100 + n) div (2 * n)") / F.lit(10000.0)
        ).alias("avg_value"),
    )


# --- O1/O2: order by ± column, limit/offset pagination (reader.go:205-216)

@query(
    "o1_order_limit_offset",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 5 OFFSET 10
    """,
)
def o1_order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`:order -col :limit N :offset M` parity. o_orderkey tiebreak makes
    pagination deterministic (the reference pages on `-created_at`, which
    can tie the same way)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(5)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


# --- O3: top-k (reader.go:68-69 `:order distance :limit k`) ---------------

@query(
    "o3_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compiles to TakeOrderedAndProject: per-partition heap + driver
    merge, no global sort — the plan shape that survives 100 TB."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(10)
        .select(
            "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
        )
    )


# --- O5: first-match lookup (reader.go:392 FindEntityByName) --------------

@query(
    "o5_first_match",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE lower(c_name) = 'customer#000000042'
    ORDER BY c_custkey LIMIT 1
    """,
)
def o5_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.lower(F.col("c_name")) == "customer#000000042")
        .orderBy("c_custkey")
        .limit(1)
        .select("c_custkey", "c_name")
    )


# --- U1: rule union (reader.go:552-561) ------------------------------------

@query(
    "u1_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
    UNION
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def u1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datalog `;` rule union parity — two rule bodies over the same
    relation, deduplicated. (Catalyst will not fuse this into one scan by
    itself; at scale prefer the single-pass OR form in j6.)"""
    o_full = load_table(spark, sf_dir, "orders")
    a = o_full.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_orderpriority"
    )
    b = o_full.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b).dropDuplicates()


# --- U2: symmetric pair dedup (conflicts.go:121-127) -----------------------

@query(
    "u2_pair_dedup",
    oracle="""
    SELECT a.s_suppkey AS s1, b.s_suppkey AS s2, a.s_nationkey AS nationkey
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
)
def u2_pair_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical ordering (a < b) replaces the reference's client-side
    seen-set for symmetric pairs — the dedup happens in the join
    condition itself, so no post-hoc distinct pass."""
    s = load_table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("s1"),
        F.col("b.s_suppkey").alias("s2"),
        F.col("a.s_nationkey").alias("nationkey"),
    )


# --- S7: raw-query escape hatch (cmd/mie/query.go:22-123) -------------------

_S7_SQL = """
    SELECT n_name AS nation, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


@query("s7_raw_sql", oracle=_S7_SQL)
def s7_raw_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole-SQL escape hatch: the reference exposes raw CozoScript
    (`mie query "<script>"`, RawQuery client.go:130-132); ours is
    spark.sql over the registered corpus views — the SAME text runs on
    Spark and on the DuckDB oracle, which is the parity claim in its
    purest form."""
    from mie_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_S7_SQL)


# --- set operations beyond the reference (it has only rule-union, U1) -------

@query(
    "u3_except_customers",
    oracle="""
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    """,
)
def u3_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (churned customers: ordered in 1996, not in 1997). The
    reference's Datalog surface has no difference operator at all; in
    Spark this is one scan feeding two aggregates + a left-anti hash
    join under AQE (both sides shuffle on o_custkey once)."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.subtract(y97)


@query(
    "u4_intersect_customers",
    oracle="""
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    """,
)
def u4_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (retained customers: ordered in both years) — the
    left-semi twin of u3_except_customers."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


# --- TPC-H-Q4-style order priority check (EXISTS semi-join) ------------------

@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS decorrelated to a left-semi join (TPC-H Q4
    shape: orders with at least one lineitem shipped after the order
    date). The correlated predicate (l_shipdate > o_orderdate) rides
    the semi-join as a join condition, so evaluation is one hash probe
    per lineitem — no per-order subquery rescan. The quarter filter
    pushes to the orders scan and shrinks the build side first."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- TPC-H-Q12-style shipmode classes (conditional aggregation) --------------

@query(
    "q12_priority_classes",
    oracle="""
    SELECT l.l_linestatus,
           count(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H Q12 shape): one join, one pass,
    two mutually exclusive counts via sum(when) — never two filtered
    subqueries over the same join. The date filter prunes lineitem at
    the scan; the join shuffles each side once on orderkey."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(hi.cast("long")).alias("high_line_count"),
            F.sum((~hi).cast("long")).alias("low_line_count"),
        )
    )


# --- TPC-H-Q14-style promo revenue share (ratio of conditional sums) ---------

@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                     FILTER (p.p_type LIKE 'PROMO%')
                   / sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))),
             6
           ) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of conditional sums (TPC-H Q14 shape: % of revenue from
    promo parts). Both numerator and denominator are integer-cent sums
    from the SAME single pass (a filtered sum, not two joins); the part
    dimension broadcasts, and the final division is one scalar — the
    only float op, rounded identically on both engines."""
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(promo, rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             count(*)::BIGINT AS n,
             sum(CAST(l_quantity AS BIGINT))::BIGINT AS qsum
      FROM lineitem GROUP BY l_partkey
    )
    SELECT
      CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        AS small_qty_revenue_cents,
      count(*) AS n_items
    FROM lineitem l
    JOIN pa ON l.l_partkey = pa.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23'
      AND 5 * CAST(l.l_quantity AS BIGINT) * pa.n < pa.qsum
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: revenue locked in orders below 20% of a part's
    average quantity — the correlated scalar-aggregate subquery,
    DECORRELATED into a per-part aggregate joined back (the rewrite
    Catalyst would have to find; stating it explicitly keeps the plan
    one aggregate + one shuffle join at any scale, no per-row
    re-aggregation).

    The threshold comparison `qty < 0.2 * avg` is cross-multiplied to
    pure BIGINT arithmetic (5*qty*n < sum): the qualifying SET is exact
    on both engines — a float avg would make rows at the boundary
    engine-dependent. The brand filter prunes the part dimension before
    broadcast; revenue sums in exact cents."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("qsum"),
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("n")
            < F.col("qsum")
        )
    )
    return qualifying.agg(
        F.sum(cents("l_extendedprice")).alias("small_qty_revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- scale toolkit under the oracle: bloom-prefiltered semi-join ----------

@query(
    "j_bloom_semi_join",
    oracle="""
    SELECT count(*) AS n_items,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
             AS revenue_cents
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    """,
)
def j_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via a distributed Bloom filter
    (operators/bloom.py): the selective build side (urgent 1996
    orders) folds into a 16 KB bitmap with one tiny groupBy(word)
    bit_or shuffle; the probe side (lineitem) tests membership as a
    pure JVM expression FUSED INTO ITS SCAN, so the exchange feeding
    the exact semi-join sees only survivors (true matches + <0.3%
    false positives). Results are EXACTLY the plain semi-join's — the
    oracle is the plain semi-join — because the bloom test only prunes;
    the real join removes the leakage. At 100 TB this is the pattern
    that turns a fact-fact semi-join from a full-shuffle into a
    map-side-pruned one; Spark's built-in runtime bloom join does the
    same thing but offers no API for an explicit key-set filter."""
    from mie_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    kept = bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
    return kept.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(cents("l_extendedprice")).alias("revenue_cents"),
    )


@query(
    "dq_expectations",
    oracle="""
    WITH li AS (
      SELECT count(*)::BIGINT AS n,
             sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS null_key,
             sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)::BIGINT
               AS bad_qty,
             sum(CASE WHEN l_discount < 0 OR l_discount > 1
                 THEN 1 ELSE 0 END)::BIGINT AS bad_disc,
             (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT
               AS dup_key
      FROM lineitem
    ),
    o AS (
      SELECT count(*)::BIGINT AS n,
             sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)::BIGINT
               AS neg_total,
             (count(*) - count(DISTINCT o_orderkey))::BIGINT AS dup_key
      FROM orders
    ),
    c AS (
      SELECT count(*)::BIGINT AS n,
             (count(*) - count(DISTINCT c_custkey))::BIGINT AS dup_key
      FROM customer
    ),
    orph_li AS (
      SELECT count(*)::BIGINT AS v FROM lineitem
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ),
    orph_o AS (
      SELECT count(*)::BIGINT AS v FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT 'lineitem.null_orderkey' AS check_name, null_key AS n_violations, n AS n_checked FROM li
    UNION ALL SELECT 'lineitem.nonpositive_quantity', bad_qty, n FROM li
    UNION ALL SELECT 'lineitem.discount_in_unit_interval', bad_disc, n FROM li
    UNION ALL SELECT 'lineitem.unique_order_line', dup_key, n FROM li
    UNION ALL SELECT 'lineitem.orderkey_fk', orph_li.v, li.n FROM orph_li, li
    UNION ALL SELECT 'orders.nonnegative_totalprice', neg_total, n FROM o
    UNION ALL SELECT 'orders.unique_orderkey', dup_key, n FROM o
    UNION ALL SELECT 'orders.custkey_fk', orph_o.v, o.n FROM orph_o, o
    UNION ALL SELECT 'customer.unique_custkey', dup_key, n FROM c
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations report — the Great-Expectations /
    dbt-test shape a training or warehouse pipeline gates ingest on:
    one row per check with exact BIGINT (n_violations, n_checked).
    Null keys, value-range rules, key uniqueness (count minus distinct
    in the SAME single pass — no self-join), and referential integrity
    as anti-joins (un-hinted: AQE broadcasts the key side when it
    fits). Plan: ONE aggregate pass per table (all of that table's
    row-level rules + its uniqueness check fused into a single scan)
    plus two anti-join counts; at 100 TB each check set costs one fact
    scan and a fact-fact FK probe rides bloom_semi_join's prefilter."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    li_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_orderkey").isNull().cast("long")).alias("null_key"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("bad_qty"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("bad_disc"),
        (
            F.count(F.lit(1))
            - F.count_distinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("dup_key"),
    )
    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_totalprice") < 0).cast("long")).alias("neg_total"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dup_key"),
    )
    c_agg = c.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count_distinct("c_custkey")).alias("dup_key"),
    )
    # FK probes: NO forced broadcast — orders/customer scale with the
    # corpus (an unbounded forced broadcast is the driver-OOM pattern
    # the r9 ev_cohort_ltv fix removed); AQE promotes the anti-join
    # build side when it fits, and at fact-fact scale the probe rides
    # bloom_semi_join's bitmap prefilter instead.
    orph_li = li.join(
        o.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("v"))
    orph_o = o.join(
        c.select("c_custkey"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("v"))

    def row(name, viol, checked):  # noqa: ANN001
        return F.struct(
            F.lit(name).alias("check_name"),
            viol.cast("long").alias("n_violations"),
            checked.cast("long").alias("n_checked"),
        )

    li_rows = li_agg.select(
        F.explode(
            F.array(
                row("lineitem.null_orderkey", F.col("null_key"), F.col("n")),
                row("lineitem.nonpositive_quantity", F.col("bad_qty"), F.col("n")),
                row(
                    "lineitem.discount_in_unit_interval",
                    F.col("bad_disc"),
                    F.col("n"),
                ),
                row("lineitem.unique_order_line", F.col("dup_key"), F.col("n")),
            )
        ).alias("r")
    )
    o_rows = o_agg.select(
        F.explode(
            F.array(
                row("orders.nonnegative_totalprice", F.col("neg_total"), F.col("n")),
                row("orders.unique_orderkey", F.col("dup_key"), F.col("n")),
            )
        ).alias("r")
    )
    c_rows = c_agg.select(
        F.explode(
            F.array(row("customer.unique_custkey", F.col("dup_key"), F.col("n")))
        ).alias("r")
    )
    fk_li = orph_li.crossJoin(F.broadcast(li_agg.select("n"))).select(
        row("lineitem.orderkey_fk", F.col("v"), F.col("n")).alias("r")
    )
    fk_o = orph_o.crossJoin(F.broadcast(o_agg.select("n"))).select(
        row("orders.custkey_fk", F.col("v"), F.col("n")).alias("r")
    )
    return (
        li_rows.unionByName(o_rows)
        .unionByName(c_rows)
        .unionByName(fk_li)
        .unionByName(fk_o)
        .select("r.check_name", "r.n_violations", "r.n_checked")
    )


# Shared by dq_drift_ks (batch) and st_drift_ks (streaming twin in
# queries/streaming.py) — identical SQL text, the st_dedup_minhash
# grading doctrine: the streaming form must land on the exact same
# answer as the batch oracle.
KS_DRIFT_ORACLE = """
    WITH days AS (
      SELECT day, row_number() OVER (ORDER BY day) AS dr,
             count(*) OVER () AS nd
      FROM (SELECT DISTINCT date_trunc('day', ts)::DATE AS day
            FROM events)
    ),
    b AS (
      -- bucket = (cents + 2^40) // 100: the offset keeps the dividend
      -- non-negative for any realistic cents, where Spark's int_div
      -- (floor) and DuckDB's // (truncate) agree bit-for-bit; without
      -- it a negative value (refunds) floors on one engine and
      -- truncates on the other, silently shifting the CDF. Order is
      -- preserved, and bucket is internal to the CDF, never emitted.
      SELECT e.event_type,
             (CAST(round(e.value * 100) AS BIGINT) + 1099511627776)
               // 100 AS bucket,
             CASE WHEN d.dr * 2 <= d.nd THEN 1 ELSE 0 END AS h1
      FROM events e
      JOIN days d ON date_trunc('day', e.ts)::DATE = d.day
    ),
    g AS (
      SELECT event_type, bucket,
             sum(h1)::BIGINT AS c1, sum(1 - h1)::BIGINT AS c2
      FROM b GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type,
             sum(c1) OVER (PARTITION BY event_type ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum1,
             sum(c2) OVER (PARTITION BY event_type ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum2,
             sum(c1) OVER (PARTITION BY event_type) AS n1,
             sum(c2) OVER (PARTITION BY event_type) AS n2
      FROM g
    )
    SELECT event_type, max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
           max(abs(cum1 * n2 - cum2 * n1))::BIGINT AS ks_num,
           round(max(abs(cum1 * n2 - cum2 * n1))
                 / (max(n1) * max(n2) * 1.0), 6) AS ks
    FROM c GROUP BY event_type
    """


def drift_cells_census(ev: DataFrame) -> DataFrame:
    """The (event_type, day, value-unit bucket) census both KS forms
    aggregate to — ONE definition so the batch gate and the streaming
    twin stay bit-identical (the twin-grading contract depends on it).
    bucket = (cents + 2^40) div 100: int_div needs a non-negative
    dividend to match DuckDB's truncating `//` (floor vs truncate
    diverge on negatives, e.g. refunds); the offset shift preserves
    order and the bucket never leaves the CDF computation."""
    return ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        int_div(
            F.round(F.col("value") * 100).cast("long")
            + F.lit(1099511627776),
            100,
        )
        .cast("long")
        .alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))


def ks_drift_from_cells(cells: DataFrame) -> DataFrame:
    """Bounded KS projection over (event_type, day, bucket, n) census
    cells: first-half/second-half split by day rank, per-type CDF gap
    maximized in the cross-multiplied integer form. Shared by
    dq_drift_ks (cells from one batch aggregate) and st_drift_ks
    (cells drained from the streaming state store) — both grade
    against KS_DRIFT_ORACLE. Everything here runs over the bounded
    census (types x days x value-units), never the corpus."""
    from pyspark.sql.window import Window

    # the half map derives FROM cells, so the join below is a
    # self-join — rename the key to keep the attributes disjoint
    # (streaming memory-sink views hit "Conflicting attributes"
    # otherwise)
    days = cells.select(F.col("day").alias("_day")).distinct()
    wd = Window.orderBy("_day")
    wall = Window.orderBy("_day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    daymap = days.select(
        "_day",
        (
            F.row_number().over(wd) * 2 <= F.count(F.lit(1)).over(wall)
        ).cast("int").alias("h1"),
    )
    g = (
        cells.join(F.broadcast(daymap), F.col("day") == F.col("_day"))
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.col("n") * F.col("h1")).alias("c1"),
            F.sum(F.col("n") * (F.lit(1) - F.col("h1"))).alias("c2"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
        F.sum("c1").over(wtot).alias("n1"),
        F.sum("c2").over(wtot).alias("n2"),
    )
    return c.groupBy("event_type").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(
            F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
        ).alias("ks_num"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
                )
            )
            / (F.max("n1") * F.max("n2") * F.lit(1.0)),
            6,
        ).alias("ks"),
    )


@query("dq_drift_ks", oracle=KS_DRIFT_ORACLE)
def dq_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift gate: two-sample Kolmogorov-Smirnov statistic
    per event_type between the FIRST and SECOND half of the observed
    time range — "did this metric's distribution move?", the check a
    training-data pipeline runs before trusting a new ingest batch
    (dq_expectations validates schema/ranges; this validates shape).

    Integer-exact grading: values are cent-quantized then binned into
    whole currency units, the empirical CDF gap is maximized in the
    CROSS-MULTIPLIED form |cum1*n2 - cum2*n1| (exact BIGINT; the
    division and rounding happen once, on identical operands, so both
    engines agree bit-for-bit). The graded scales keep the product
    well under 2^63; a 100 TB run with per-half counts beyond ~3e9
    promotes the two factors to DECIMAL(38,0) — same plan shape.

    Scale shape: the corpus-sized work is ONE aggregate down to
    (event_type, day, bucket) census cells (bounded: types x days x
    value-units) — the half-map broadcast join and CDF windows
    (PARTITIONED by event_type) all run over those bounded cells in
    ks_drift_from_cells, which the streaming twin st_drift_ks shares.
    The day-rank window runs over the distinct-day census (bounded
    exception, ev_survival precedent)."""
    ev = load_table(spark, sf_dir, "events")
    return ks_drift_from_cells(drift_cells_census(ev))


@query(
    "dq_benford",
    oracle="""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_extendedprice > 0
    ),
    d AS (
      SELECT substr(cents::VARCHAR, 1, 1)::BIGINT AS digit,
             count(*)::BIGINT AS n
      FROM c GROUP BY 1
    ),
    t AS (SELECT sum(n)::BIGINT AS total FROM d)
    SELECT digit, n,
           ((n * 2000000 + total) // (2 * total))::BIGINT AS share_micro,
           (CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                      WHEN 3 THEN 124939 WHEN 4 THEN 96910
                      WHEN 5 THEN 79181 WHEN 6 THEN 66947
                      WHEN 7 THEN 57992 WHEN 8 THEN 51153
                      ELSE 45757 END)::BIGINT AS benford_micro,
           abs(((n * 2000000 + total) // (2 * total))
               - CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                            WHEN 3 THEN 124939 WHEN 4 THEN 96910
                            WHEN 5 THEN 79181 WHEN 6 THEN 66947
                            WHEN 7 THEN 57992 WHEN 8 THEN 51153
                            ELSE 45757 END)::BIGINT AS dev_micro
    FROM d, t
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit (Benford) audit over lineitem prices —
    the classic forensic data-quality gate: organically-generated
    monetary amounts follow log10(1+1/d); fabricated, truncated, or
    unit-mangled feeds don't, and the per-digit deviation column is
    the alarm. (TPC-H-style uniform prices FAIL Benford loudly — the
    point of the gate is the report, and a synthetic corpus is
    exactly the kind of feed it should flag.)

    Exactness: the leading digit is taken from the DECIMAL STRING of
    integer cents (multiplying by 10^k preserves the leading
    significant digit), never via log10 — a transcendental within a
    ulp of a power of 10 would misbucket. Shares are integer half-up
    micro-units ((n*2e6 + N) div 2N); the Benford expectations are
    pre-rounded micro-unit literals, identical text on both engines.
    Every output column is BIGINT. Plan: one map-side-combined digit
    aggregate touches lineitem; the 9-row census crossJoins a 1-row
    broadcast total (scalar-subquery decorrelation)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") > 0
    )
    d = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = d.agg(F.sum("n").alias("total"))
    benford = (
        F.when(F.col("digit") == 1, 301030)
        .when(F.col("digit") == 2, 176091)
        .when(F.col("digit") == 3, 124939)
        .when(F.col("digit") == 4, 96910)
        .when(F.col("digit") == 5, 79181)
        .when(F.col("digit") == 6, 66947)
        .when(F.col("digit") == 7, 57992)
        .when(F.col("digit") == 8, 51153)
        .otherwise(45757)
    )
    share = int_div(
        F.col("n") * F.lit(2000000) + F.col("total"),
        F.lit(2) * F.col("total"),
    ).cast("long")
    return d.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        share.alias("share_micro"),
        benford.cast("long").alias("benford_micro"),
        F.abs(share - benford).cast("long").alias("dev_micro"),
    )


def _profile_drift_oracle() -> str:
    """One SELECT per profiled column, unioned — each computes both
    snapshots' metrics in a single aggregate over events (prev
    membership and the simulated schema rollout are the same
    deterministic arithmetic the Spark side uses)."""

    def ppm(nulls: str, rows: str) -> str:
        # rows = 0 => NULL rate (mirrors the engine's guard, ADVICE
        # r11 — previously both sides crashed on an empty snapshot)
        return (
            f"(CASE WHEN ({rows}) = 0 THEN NULL ELSE "
            f"(2 * ({nulls}) * 1000000 + ({rows})) // (2 * ({rows})) "
            f"END)::BIGINT"
        )

    def col_block(name: str, curr: str, prev: str) -> str:
        np_, nc = (
            f"count(CASE WHEN p AND ({prev}) IS NULL THEN 1 END)::BIGINT",
            f"count(CASE WHEN ({curr}) IS NULL THEN 1 END)::BIGINT",
        )
        dp, dc = (
            f"count(DISTINCT CASE WHEN p THEN ({prev}) END)::BIGINT",
            f"count(DISTINCT ({curr}))::BIGINT",
        )
        rp, rc = "count(CASE WHEN p THEN 1 END)::BIGINT", "count(*)::BIGINT"

        def drift(a: str, b: str, thresh: int) -> str:
            return (
                f"CASE WHEN ({rp}) = 0 OR ({rc}) = 0 THEN NULL "
                f"ELSE abs({b} - {a}) >= {thresh} END"
            )

        return f"""
      SELECT '{name}' AS col,
             {rp} AS rows_prev, {rc} AS rows_curr,
             {np_} AS nulls_prev, {nc} AS nulls_curr,
             {dp} AS distinct_prev, {dc} AS distinct_curr,
             {ppm(np_, rp)} AS null_ppm_prev,
             {ppm(nc, rc)} AS null_ppm_curr,
             {drift(ppm(np_, rp), ppm(nc, rc), 5000)} AS null_drift,
             {ppm(dp, rp)} AS uniq_ppm_prev,
             {ppm(dc, rc)} AS uniq_ppm_curr,
             {drift(ppm(dp, rp), ppm(dc, rc), 10000)} AS uniq_drift
      FROM d"""

    cols = [
        ("value_cents", "value_cents", "value_cents"),
        ("user_id", "user_id", "user_id"),
        ("event_type", "event_type", "event_type"),
        ("props_k", "k", "k_prev"),
    ]
    blocks = " UNION ALL ".join(col_block(*c) for c in cols)
    return f"""
    WITH d AS (
      SELECT event_id % 10 <> 0 AS p,
             CAST(round(value * 100) AS BIGINT) AS value_cents,
             user_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CASE WHEN event_id % 7 <> 0
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k_prev
      FROM events
    )
    {blocks}
    """


@query("dq_profile_drift", oracle=_profile_drift_oracle())
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between corpus snapshots — the
    dbt/great-expectations "profile diff" every ingest pipeline runs
    before accepting a refresh: per profiled column, row/null/distinct
    counts for the previous and current snapshots, null-rate and
    uniqueness in integer PPM (half-up formula — the
    pipe_tokenizer_drift doctrine), and pure-BIGINT drift flags
    (null-rate moved >= 5000 ppm; uniqueness moved >= 10000 ppm). The
    semi-structured column (props ->> k) is where real feeds break
    first — upstream rollouts add or drop JSON fields for a fraction
    of traffic — so the previous snapshot SIMULATES exactly that
    deterministically (field absent for event_id % 7 == 0, the
    pipe_corpus_delta convention: both engines derive the scenario
    from the same arithmetic), making the null-drift branch genuinely
    exercised at every graded scale rather than vacuously zero (the
    ev_survival_daily lesson).

    Plan shape: ONE pass over events computes all 4 columns x 2
    snapshots of metrics (the multi-count(DISTINCT) expands to a
    grouping-sets style plan, still one scan); the 4-row output
    assembles from the single collected aggregate row — the bounded
    scalar-decorrelation pattern. At 100 TB: one scan, map-side
    combine, O(columns) driver state."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    d = ev.select(
        (F.col("event_id") % 10 != 0).alias("p"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        "user_id",
        "event_type",
        k.alias("k"),
        F.when(F.col("event_id") % 7 != 0, k).alias("k_prev"),
    )

    cols = [
        ("value_cents", "value_cents", "value_cents"),
        ("user_id", "user_id", "user_id"),
        ("event_type", "event_type", "event_type"),
        ("props_k", "k", "k_prev"),
    ]
    aggs = [
        F.count(F.when(F.col("p"), 1)).alias("rows_prev"),
        F.count(F.lit(1)).alias("rows_curr"),
    ]
    for name, curr, prev in cols:
        aggs += [
            F.count(
                F.when(F.col("p") & F.col(prev).isNull(), 1)
            ).alias(f"np_{name}"),
            F.count(F.when(F.col(curr).isNull(), 1)).alias(f"nc_{name}"),
            F.countDistinct(F.when(F.col("p"), F.col(prev))).alias(
                f"dp_{name}"
            ),
            F.countDistinct(F.col(curr)).alias(f"dc_{name}"),
        ]
    row = d.agg(*aggs).collect()[0]  # bounded: ONE row of counters

    def ppm(nulls: int, rows: int) -> int | None:
        # rows == 0 (empty snapshot) => NULL rate, not a crash — the
        # tokenizer_drift tok_prev==0 doctrine (ADVICE r11: the
        # unguarded // raised here AND in the oracle, parity-by-crash)
        if rows == 0:
            return None
        return (2 * nulls * 1_000_000 + rows) // (2 * rows)

    def drift(a: int | None, b: int | None, thresh: int) -> bool | None:
        if a is None or b is None:
            return None  # a missing snapshot can't certify drift
        return abs(b - a) >= thresh

    out = []
    rp, rc = int(row["rows_prev"]), int(row["rows_curr"])
    for name, _, _ in cols:
        np_, nc = int(row[f"np_{name}"]), int(row[f"nc_{name}"])
        dp, dc = int(row[f"dp_{name}"]), int(row[f"dc_{name}"])
        out.append(
            (
                name, rp, rc, np_, nc, dp, dc,
                ppm(np_, rp), ppm(nc, rc),
                drift(ppm(np_, rp), ppm(nc, rc), 5000),
                ppm(dp, rp), ppm(dc, rc),
                drift(ppm(dp, rp), ppm(dc, rc), 10000),
            )
        )
    return spark.createDataFrame(
        out,
        "col string, rows_prev long, rows_curr long, nulls_prev long, "
        "nulls_curr long, distinct_prev long, distinct_curr long, "
        "null_ppm_prev long, null_ppm_curr long, null_drift boolean, "
        "uniq_ppm_prev long, uniq_ppm_curr long, uniq_drift boolean",
    )


def _schema_drift_oracle() -> str:
    """One aggregate over events computes every per-field, per-snapshot
    counter; the 4 field rows assemble by UNION ALL over that single
    CTE (DuckDB folds the shared aggregate). The simulated rollout is
    the same deterministic arithmetic the Spark side uses."""
    ppm = (
        "(CASE WHEN {rows} = 0 THEN NULL ELSE "
        "(2 * {pres} * 1000000 + {rows}) // (2 * {rows}) END)::BIGINT"
    )
    status = """
      CASE WHEN rows_prev = 0 OR rows_curr = 0 THEN NULL
           WHEN {pp} = 0 AND {pc} > 0 THEN 'added'
           WHEN {pp} > 0 AND {pc} = 0 THEN 'dropped'
           WHEN {pp} = 0 AND {pc} = 0 THEN 'absent'
           WHEN ({nc} > 0 AND {np} = 0) OR ({sc} > 0 AND {sp} = 0)
                OR ({bc} > 0 AND {bp} = 0) THEN 'type_changed'
           ELSE 'stable' END
    """

    def block(field, pp, pc, np_, np_c, sp, sc, bp, bc):
        # every counter ::BIGINT: bare 0 literals and count-differences
        # otherwise come back int32 through DuckDB->pandas and fail the
        # exact-dtype drive even when values agree
        return f"""
      SELECT '{field}' AS field, rows_prev, rows_curr,
             ({pp})::BIGINT AS present_prev, ({pc})::BIGINT AS present_curr,
             ({np_})::BIGINT AS n_num_prev, ({sp})::BIGINT AS n_str_prev,
             ({bp})::BIGINT AS n_bool_prev,
             ({np_c})::BIGINT AS n_num_curr, ({sc})::BIGINT AS n_str_curr,
             ({bc})::BIGINT AS n_bool_curr,
             {ppm.format(pres=pp, rows='rows_prev')} AS present_ppm_prev,
             {ppm.format(pres=pc, rows='rows_curr')} AS present_ppm_curr,
             {status.format(pp=pp, pc=pc, np=np_, nc=np_c,
                            sp=sp, sc=sc, bp=bp, bc=bc)} AS status
      FROM agg"""

    blocks = " UNION ALL ".join(
        [
            # k: the REAL props field — parsed presence + regex-typed
            block("k", "k_prev", "k_curr", "k_num_prev", "k_num_curr",
                  "k_prev - k_num_prev", "k_curr - k_num_curr", "0", "0"),
            # legacy_tag: prev-only string field (dropped this rollout)
            block("legacy_tag", "lt_prev", "0", "0", "0",
                  "lt_prev", "0", "0", "0"),
            # exp_flag: curr-only boolean field (added, partial rollout)
            block("exp_flag", "0", "ef_curr", "0", "0",
                  "0", "0", "0", "ef_curr"),
            # u: present in both; a fifth of curr values went stringly
            block("u", "u_prev", "u_curr", "u_prev", "u_num_curr",
                  "0", "u_curr - u_num_curr", "0", "0"),
        ]
    )
    return f"""
    WITH agg AS (
      SELECT count(CASE WHEN event_id % 10 <> 0 THEN 1 END)::BIGINT
               AS rows_prev,
             count(*)::BIGINT AS rows_curr,
             count(CASE WHEN event_id % 10 <> 0
                        AND json_extract_string(props, '$.k') IS NOT NULL
                        THEN 1 END)::BIGINT AS k_prev,
             count(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                        THEN 1 END)::BIGINT AS k_curr,
             count(CASE WHEN event_id % 10 <> 0 AND regexp_full_match(
                          coalesce(json_extract_string(props, '$.k'), ''),
                          '-?[0-9]+(\\.[0-9]+)?') THEN 1 END)::BIGINT
               AS k_num_prev,
             count(CASE WHEN regexp_full_match(
                          coalesce(json_extract_string(props, '$.k'), ''),
                          '-?[0-9]+(\\.[0-9]+)?') THEN 1 END)::BIGINT
               AS k_num_curr,
             count(CASE WHEN event_id % 10 <> 0 AND event_id % 3 = 0
                        THEN 1 END)::BIGINT AS lt_prev,
             count(CASE WHEN event_id % 7 = 0 THEN 1 END)::BIGINT AS ef_curr,
             count(CASE WHEN event_id % 10 <> 0 THEN 1 END)::BIGINT AS u_prev,
             count(*)::BIGINT AS u_curr,
             count(CASE WHEN event_id % 5 <> 0 THEN 1 END)::BIGINT
               AS u_num_curr
      FROM events
    )
    {blocks}
    """


SCHEMA_DRIFT_ORACLE = _schema_drift_oracle()


@query("dq_schema_drift", oracle=SCHEMA_DRIFT_ORACLE)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-level schema drift between corpus snapshots — the
    companion dq_profile_drift's docstring implies and VERDICT r11
    item #8 names: per semi-structured field, presence and a 3-way
    type census (number/string/boolean) for the previous and current
    snapshots, presence rates in half-up integer PPM, and a verdict
    per field: 'added' (absent prev, present curr), 'dropped'
    (present prev, absent curr), 'type_changed' (a type appears in
    curr that the prev census never saw — the stringly-typed
    regression), else 'stable'; NULL when either snapshot is empty
    (the dq_profile_drift rows==0 doctrine — a missing snapshot
    can't certify drift).

    The `k` field is the REAL events.props payload (presence parsed
    from JSON, type classified by a portable numeric regex); the
    rollout scenario around it is simulated deterministically so
    every verdict branch is genuinely exercised at every graded scale
    (the ev_survival_daily lesson): legacy_tag exists only in the
    previous snapshot (event_id % 3 == 0 rows — dropped), exp_flag
    only in the current one (event_id % 7 == 0 — a partial-rollout
    add), and u flips a fifth of current values to strings
    (event_id % 5 == 0 — mixed-type regression).

    Plan shape: ONE scan computes an 11-counter aggregate (map-side
    combine); the 4-row report assembles from the single collected
    row — the dq_profile_drift bounded-scalar pattern. At 100 TB:
    one pass, O(fields) driver state."""
    ev = load_table(spark, sf_dir, "events")
    return schema_report_from_census(schema_drift_census(ev))


def schema_drift_census(ev: DataFrame) -> DataFrame:
    """The 11-counter schema census — shared by the batch gate and its
    streaming twin (st_schema_drift): plain conditional counts (no
    DISTINCT — deliberately, so the aggregate runs in a streaming
    complete-mode state store), replay-idempotent because recounting
    the same events folds to the same counters."""
    k_str = F.get_json_object("props", "$.k")
    is_num = F.coalesce(k_str, F.lit("")).rlike(r"^-?[0-9]+(\.[0-9]+)?$")
    p = F.col("event_id") % 10 != 0
    d = ev.select(
        p.alias("p"),
        k_str.isNotNull().alias("k_here"),
        is_num.alias("k_num"),
        (F.col("event_id") % 3 == 0).alias("e3"),
        (F.col("event_id") % 5 != 0).alias("e5num"),
        (F.col("event_id") % 7 == 0).alias("e7"),
    )
    cnt = lambda c: F.count(F.when(c, 1))  # noqa: E731
    return d.agg(
        cnt(F.col("p")).alias("rows_prev"),
        F.count(F.lit(1)).alias("rows_curr"),
        cnt(F.col("p") & F.col("k_here")).alias("k_prev"),
        cnt(F.col("k_here")).alias("k_curr"),
        cnt(F.col("p") & F.col("k_num")).alias("k_num_prev"),
        cnt(F.col("k_num")).alias("k_num_curr"),
        cnt(F.col("p") & F.col("e3")).alias("lt_prev"),
        cnt(F.col("e7")).alias("ef_curr"),
        cnt(F.col("e5num")).alias("u_num_curr"),
    )


def schema_report_from_census(census: DataFrame) -> DataFrame:
    """Assemble the 4-field verdict report from the ONE-row counter
    census — the shared final projection of dq_schema_drift and
    st_schema_drift (same code, same oracle)."""
    spark = census.sparkSession
    row = census.collect()[0]  # bounded: ONE row of counters

    rp, rc = int(row["rows_prev"]), int(row["rows_curr"])

    def ppm(pres: int, rows: int) -> int | None:
        if rows == 0:
            return None
        return (2 * pres * 1_000_000 + rows) // (2 * rows)

    def status(pp, pc, np_, nc, sp, sc, bp, bc):  # noqa: ANN001
        if rp == 0 or rc == 0:
            return None
        if pp == 0 and pc > 0:
            return "added"
        if pp > 0 and pc == 0:
            return "dropped"
        if pp == 0 and pc == 0:
            return "absent"
        if (nc > 0 and np_ == 0) or (sc > 0 and sp == 0) or (
            bc > 0 and bp == 0
        ):
            return "type_changed"
        return "stable"

    kp, kc = int(row["k_prev"]), int(row["k_curr"])
    knp, knc = int(row["k_num_prev"]), int(row["k_num_curr"])
    fields = [
        ("k", kp, kc, knp, knc, kp - knp, kc - knc, 0, 0),
        ("legacy_tag", int(row["lt_prev"]), 0, 0, 0,
         int(row["lt_prev"]), 0, 0, 0),
        ("exp_flag", 0, int(row["ef_curr"]), 0, 0, 0, 0, 0,
         int(row["ef_curr"])),
        ("u", rp, rc, rp, int(row["u_num_curr"]), 0,
         rc - int(row["u_num_curr"]), 0, 0),
    ]
    out = [
        (
            f, rp, rc, pp, pc, np_, sp, bp, nc, sc, bc,
            ppm(pp, rp), ppm(pc, rc),
            status(pp, pc, np_, nc, sp, sc, bp, bc),
        )
        for f, pp, pc, np_, nc, sp, sc, bp, bc in fields
    ]
    return spark.createDataFrame(
        out,
        "field string, rows_prev long, rows_curr long, "
        "present_prev long, present_curr long, "
        "n_num_prev long, n_str_prev long, n_bool_prev long, "
        "n_num_curr long, n_str_curr long, n_bool_curr long, "
        "present_ppm_prev long, present_ppm_curr long, status string",
    )
