"""Event-stream query coverage: windowed aggregation, sessionization,
JSON property extraction, per-user rollups. These are the batch
equivalents of the streaming module (mie_spark/streaming) — same
logical plans, bounded input, so they are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mie_spark.operators.rank import two_level_rank
from mie_spark.queries import query
from mie_spark.sources import load_table

# THE sessionization definition (30-min inactivity gap, ties broken by
# (ts, event_id)) — single source of truth for every query that builds
# on sessions: ev_sessionize, ev_range_join, ev_concurrency. The oracle
# fragment and the Spark helper below MUST stay in lockstep; that is
# the point of there being exactly one of each.
_SESSIONS_CTE = """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM ordered
    ), sessions AS (
      SELECT user_id, session_id, count(*) AS n_events,
             epoch_us(min(ts)) AS start_us,
             epoch_us(max(ts)) AS end_us
      FROM numbered
      GROUP BY user_id, session_id
    )
"""


def _sessions(ev: DataFrame) -> DataFrame:
    """Spark twin of ``_SESSIONS_CTE``: lag → gap flag → running-sum
    session_id → per-session aggregate. One shuffle on user_id serves
    both window passes and the aggregate. Returns
    (user_id, session_id, n_events, start_us, end_us)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    numbered = ev.withColumn(
        "new_session",
        F.when(gap <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )


@query(
    "ev_hourly_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT / 100.0
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ev_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (batch form of a streaming windowed
    count). Group keys are (hour, type): low cardinality, so map-side
    partial aggregation collapses the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact-cents sum, not round(sum(double), 2): float sums
            # diverge across engine summation order
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100
            ).alias("total_value"),
        )
    )


@query(
    "ev_sessionize",
    oracle=_SESSIONS_CTE
    + """
    SELECT user_id, session_id, n_events,
           start_us AS session_start_us,
           end_us AS session_end_us
    FROM sessions
    """,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → flag → running
    sum, the canonical window-function formulation (shared helper
    ``_sessions`` above). One shuffle on user_id serves both window
    passes and the final aggregate (same partitioning reused across
    stages). Timestamps are emitted as epoch microseconds so the oracle
    comparison is exact."""
    ev = load_table(spark, sf_dir, "events")
    return _sessions(ev).select(
        "user_id",
        "session_id",
        "n_events",
        F.col("start_us").alias("session_start_us"),
        F.col("end_us").alias("session_end_us"),
    )


@query(
    "ev_json_props",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*)::BIGINT AS n,
             count(json_extract_string(props, '$.k'))::BIGINT AS nk,
             sum(json_extract_string(props, '$.k')::INT)::BIGINT AS s
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN nk = 0 THEN NULL
                ELSE ((2 * s * 10000 + nk) // (2 * nk)) / 10000.0
           END AS avg_k
    FROM g
    """,
)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction (the reference stores
    JSON-in-String too, e.g. decision `alternatives` — SURVEY §1.2);
    get_json_object stays JVM-side. The 4-decimal average uses the
    integer half-up formula (see a4_groupby_metrics) over the non-null
    count, never round() on a double; avg()'s ignore-NULLs denominator
    is preserved via nk, and a group with NO non-null $.k yields NULL
    (avg-over-empty semantics) instead of dividing by zero."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(k).alias("nk"),
        F.sum(k).alias("s"),
    )
    return g.select(
        "event_type",
        "n",
        F.when(
            F.col("nk") > 0,
            F.expr("(2 * s * 10000 + nk) div (2 * nk)") / F.lit(10000.0),
        ).alias("avg_k"),
    )


@query(
    "ev_top_spenders",
    oracle="""
    SELECT user_id,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT / 100.0 AS spend,
           count(*) AS n_purchases
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY spend DESC, user_id
    LIMIT 10
    """,
)
def ev_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k spenders in exact cents (the ORDER BY runs on a value
    derived from identical integers on both engines, so the top-10
    boundary can never straddle a float-sum divergence)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100
            ).alias("spend"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .orderBy(F.col("spend").desc(), F.col("user_id"))
        .limit(10)
    )


@query(
    "ev_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s1) AS n_view,
           (SELECT count(*) FROM s2) AS n_view_click,
           (SELECT count(*) FROM s3) AS n_view_click_purchase
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, each step
    strictly after the previous one's first occurrence) — the classic
    product-analytics sequence query. Each stage is one groupBy on
    user_id; all three reuse the same hash partitioning, so at scale
    the per-stage joins are co-partitioned and AQE broadcasts the
    shrinking stage tables."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )


@query(
    "ev_value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def ev_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (Spark `percentile`
    == ANSI percentile_cont == DuckDB quantile_cont). Exact percentiles
    need the full value set per group — fine per-group here; at 100 TB
    swap in approx_percentile (t-digest sketch, mergeable map-side) —
    the one-line swap is the documented scale path."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query("ev_approx_distinct")
def ev_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type (no SQL oracle:
    sketch estimates are engine-specific; accuracy vs the exact count
    is asserted in tests/test_scale.py; the deterministic register
    construction is hash-graded in ev_hll_registers and the 5-sigma
    accuracy claim in ev_hll_accuracy). The sketch is the 100 TB
    answer to COUNT(DISTINCT): mergeable map-side partials, no
    shuffle of the full key set — rsd 1% keeps the register array
    at ~10 KB per group regardless of cardinality."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "ev_hll_accuracy",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS n_exact,
           true AS within_bound
    FROM events GROUP BY event_type
    """,
)
def ev_hll_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-graded accuracy sub-oracle for ev_approx_distinct (the
    rows-only HLL): the raw sketch ESTIMATE is engine-specific, but
    the exact distinct count and the claim |estimate − exact| ≤ 5% ×
    exact are SQL-expressible — so this projection grades, by hash,
    that the HLL++ pipeline runs AND lands within 5 standard errors
    of truth per group (rsd = 1%). Same move as v_lsh_buckets /
    pipe_bpe_vocab: carve the verifiable stage out of a
    non-SQL-expressible operator so the driver sees a hash row, not
    just a row count. The bound check is integer arithmetic
    (|approx−exact|·20 ≤ exact), immune to float-tie drift."""
    ev = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    exact = F.count_distinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("n_exact"),
        (
            F.abs(approx - exact) * F.lit(20) <= exact
        ).alias("within_bound"),
    )


@query(
    "ev_hll_registers",
    oracle="""
    WITH h AS (
      SELECT DISTINCT
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
      FROM events
    ), r AS (
      SELECT hv // 2251799813685248 AS bucket,
             hv % 2251799813685248 AS w
      FROM h
    ), reg AS (
      SELECT bucket::BIGINT AS bucket,
             max(CASE WHEN w = 0 THEN 52
                      ELSE 52 - length(bin(w)) END)::BIGINT AS max_rank,
             count(*)::BIGINT AS n_hashes
      FROM r GROUP BY bucket
    )
    SELECT bucket, max_rank, n_hashes,
           (1::BIGINT << (52 - max_rank))::BIGINT AS contrib
    FROM reg
    """,
)
def ev_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HyperLogLog REGISTER CONSTRUCTION itself, hash-graded — the
    deterministic stage of ev_approx_distinct (VERDICT r11 item #4),
    carved out exactly as v_lsh_buckets carves the SRP signatures out
    of the LSH family: the estimate a given engine reads off its
    sketch is engine-specific, but the registers a spec-faithful HLL
    builds from a portable hash are pure integer arithmetic, so BOTH
    engines replay them bit-for-bit. Scheme: md5-15 (the repo's
    engine-portable 60-bit hash, same construction as HNSW shard_of) →
    top p=9 bits pick one of m=512 registers, the low 51 bits w give
    rank = leading-zero count + 1 = 52 - bitlength(w) (w=0 → rank 52,
    the all-zeros case). Output per touched register: the register
    maximum, how many distinct hashes landed there, and the register's
    harmonic-mean contribution 2^(52-max_rank) — a dyadic integer, so
    the sum both engines would feed the alpha*m^2/sum estimator is
    itself exact (shift <= 52, inside the cross-engine <= 62 rule).

    Plan shape: DISTINCT on the 60-bit hash (one shuffle on a long —
    never the raw user_id strings at 100 TB), then a 512-group
    aggregate with map-side combine. bin() stays in whole-stage
    codegen; no Python anywhere."""
    ev = load_table(spark, sf_dir, "events")
    two51 = 2_251_799_813_685_248  # 2^51
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    r = (
        ev.select(hv.alias("hv"))
        .distinct()
        .select(
            F.expr(f"hv div {two51}").alias("bucket"),
            (F.col("hv") % two51).alias("w"),  # hv >= 0: % == pmod here
        )
    )
    reg = r.groupBy("bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 52).otherwise(
                F.lit(52) - F.length(F.bin("w"))
            )
        )
        .cast("long")
        .alias("max_rank"),
        F.count(F.lit(1)).alias("n_hashes"),
    )
    return reg.select(
        "bucket",
        "max_rank",
        "n_hashes",
        F.expr(
            "shiftleft(cast(1 as bigint), cast(52 - max_rank as int))"
        ).alias("contrib"),
    )


@query(
    "ev_multi_rollup",
    oracle="""
    WITH e AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             strftime(date_trunc('hour', ts), '%H') AS hour,
             value
      FROM events
    )
    SELECT day, hour, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM e GROUP BY GROUPING SETS ((day, hour), (day))
    """,
)
def ev_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (hourly + daily in one pass) — the
    hypertable continuous-aggregate shape. GROUPING SETS expands both
    resolutions from ONE scan through a single Expand + shuffle; the
    daily row is the hour=NULL stratum. At 100 TB this replaces two
    jobs (and two scans) with one, and the coarser rollup rides the
    same exchange as the finer one."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "HH").alias("hour"),
        "value",
    )
    return e.groupingSets([["day", "hour"], ["day"]], "day", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


# THE day × event-type pivot definition — single source of truth for
# ev_pivot and its inverse ev_unpivot (same convention as
# _SESSIONS_CTE): explicit value list, and a NULL event_type falls in
# NO bucket (matching FILTER ... NOT IN, where NULL passes no filter).
_PIVOT_KNOWN = ["view", "click", "purchase"]

_PIVOT_SQL = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) FILTER (event_type = 'view') AS n_view,
           count(*) FILTER (event_type = 'click') AS n_click,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type NOT IN ('view','click','purchase'))
             AS n_other
    FROM events GROUP BY 1
"""


def _day_type_pivot(ev: DataFrame) -> DataFrame:
    """Spark twin of ``_PIVOT_SQL``: wide (day, n_view, n_click,
    n_purchase, n_other) matrix. Pivot values are EXPLICIT — with an
    unspecified value list Spark first runs a distinct-scan job to
    discover columns, a full extra pass at 100 TB. With the list given,
    pivot compiles to conditional counts inside one ordinary
    single-shuffle aggregate, exactly like the FILTER oracle."""
    piv = (
        ev.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            # second WHEN, not otherwise(): a NULL event_type must fall
            # into NO bucket, matching the oracle's NOT IN (NULL -> no
            # FILTER count), not inflate n_other
            F.when(F.col("event_type").isin(_PIVOT_KNOWN), F.col("event_type"))
            .when(F.col("event_type").isNotNull(), F.lit("other"))
            .alias("et"),
        )
        .groupBy("day")
        .pivot("et", _PIVOT_KNOWN + ["other"])
        .count()
    )
    return piv.select(
        "day",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}")
            for c in _PIVOT_KNOWN + ["other"]
        ],
    )


@query("ev_pivot", oracle=_PIVOT_SQL)
def ev_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type pivot (the reporting-matrix shape); see
    _day_type_pivot for the plan notes."""
    return _day_type_pivot(load_table(spark, sf_dir, "events"))


@query(
    "ev_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.n, 0) AS n,
           coalesce(d.value_cents, 0) AS value_cents
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling: a generated day spine left-joined to daily
    aggregates so silent days appear as explicit zeros (what every
    downstream time-series model needs). The spine is sequence() over
    the min/max bounds — O(days) rows built expression-side, broadcast
    against the aggregate; no UDF, no driver loop."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
        )
    )


@query(
    "ev_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           day_offset,
           count(*) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY 1, 2
    """,
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later day they return (offsets 0-7). Two aggregations share
    the user_id partitioning — the cohort table rides the same exchange
    as the activity join under AQE, and the dedup-to-(user, day) step
    bounds the matrix input at |users| × |days|, not |events|."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .distinct()
        .filter(F.col("day_offset") <= 7)
    )
    return activity.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
    ).agg(F.count(F.lit(1)).alias("n_active"))


@query(
    "ev_anomalies",
    oracle="""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 6) AS value,
           round((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE (e.value - s.mu) / s.sigma > 3
    """,
)
def ev_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection: per-type moments via one aggregate,
    broadcast back against the event stream (the monitoring-rule
    shape). The stats table is |event types| rows — always broadcast —
    so flagging is a map-side pass over the events scan; both engines
    compute mean/stddev with numerically stable one-pass updates and
    the z-score is rounded after the comparison on both sides."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), ev.event_type == stats.et)
        .filter(z > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("zscore"),
        )
    )


@query(
    "ev_unpivot",
    oracle="WITH piv AS (" + _PIVOT_SQL + """)
    SELECT day, kind, n FROM piv
    UNPIVOT (n FOR kind IN (n_view, n_click, n_purchase, n_other))
    """,
)
def ev_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse reshape of ev_pivot (both build on
    the one _day_type_pivot definition): the wide day × type matrix
    back to long (day, kind, n) rows. Spark's unpivot is a
    zero-shuffle Expand over the already-aggregated matrix (4× the
    matrix rows, never the raw events), matching DuckDB's UNPIVOT
    clause. Wide-to-long is how reporting matrices re-enter relational
    pipelines without a rescan of the source."""
    wide = _day_type_pivot(load_table(spark, sf_dir, "events"))
    return wide.unpivot(
        ids=["day"],
        values=[f"n_{c}" for c in _PIVOT_KNOWN + ["other"]],
        variableColumnName="kind",
        valueColumnName="n",
    )


@query(
    "ev_range_join",
    oracle=_SESSIONS_CTE
    + """
    , windows AS (
      SELECT * FROM sessions
      ORDER BY n_events DESC, user_id, session_id LIMIT 20
    )
    SELECT w.user_id, w.session_id, w.start_us, w.end_us,
           count(*) AS n_contained,
           count(DISTINCT e.user_id) AS n_users
    FROM windows w
    JOIN events e ON epoch_us(e.ts) BETWEEN w.start_us AND w.end_us
    GROUP BY w.user_id, w.session_id, w.start_us, w.end_us
    """,
)
def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi-key): take the 20 busiest sessions as
    time windows and count how much of the WHOLE event stream — every
    user — falls inside each window. The naive formulation
    (`JOIN ON ts BETWEEN start AND end`) compiles to a
    BroadcastNestedLoopJoin, the temporal-enrichment scale-killer;
    operators/rangejoin.py instead manufactures an equi-key by
    quantizing the timeline into 1-hour buckets, exploding each window
    across the buckets it spans, equi-joining on the bucket id, and
    re-checking exact containment — each matching pair meets in
    exactly one bucket, so no dedup pass is needed. The oracle runs
    the naive BETWEEN join; same answer, nested-loop-free plan
    (pinned in tests/test_plans.py)."""
    from mie_spark.operators.rangejoin import interval_containment_join

    ev = load_table(spark, sf_dir, "events")
    sessions = _sessions(ev)
    windows = sessions.orderBy(
        F.desc("n_events"), "user_id", "session_id"
    ).limit(20).select(
        F.col("user_id").alias("w_user_id"), "session_id", "start_us", "end_us"
    )
    points = ev.select(
        F.unix_micros(F.col("ts")).alias("ts_us"), F.col("user_id").alias("e_user")
    )
    joined = interval_containment_join(
        points, windows, "ts_us", "start_us", "end_us",
        bucket_width=3600 * 1_000_000,
    )
    return joined.groupBy(
        F.col("w_user_id").alias("user_id"), "session_id", "start_us", "end_us"
    ).agg(
        F.count(F.lit(1)).alias("n_contained"),
        F.count_distinct("e_user").cast("bigint").alias("n_users"),
    )


@query(
    "ev_concurrency",
    oracle=_SESSIONS_CTE
    + """
    , deltas AS (
      SELECT start_us AS us, 1 AS d FROM sessions
      UNION ALL
      SELECT end_us + 1 AS us, -1 AS d FROM sessions
    ), pts AS (
      SELECT us, sum(d)::BIGINT AS d FROM deltas GROUP BY us
    ), run AS (
      SELECT us,
             CAST(sum(d) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS conc
      FROM pts
    )
    SELECT strftime(DATE '1970-01-01' + to_days((us // 86400000000)::INT),
                    '%Y-%m-%d') AS day,
           max(conc)::BIGINT AS peak_concurrent,
           count(*) AS n_change_points
    FROM run
    GROUP BY 1
    """,
)
def ev_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via a DISTRIBUTED sweep line —
    the scale-correct alternative to an interval self-join (which is
    O(sessions x avg_overlap) and explodes on popular hours).

    Sessionize (30-min gap), emit +1/-1 boundary deltas, collapse
    deltas per instant, then compute the global running concurrency as
    a two-level prefix sum: a running sum WITHIN each day partition
    plus a carry-in of whole-day totals prefix-summed across days. The
    carry table has one row per calendar day — thousands of rows at
    any corpus size — so its unpartitioned ordered window is a
    deliberate, bounded exception to the no-global-window rule, and
    the per-instant heavy window stays partitioned by day. Peak per
    day is the max running level at in-day change points (day-start
    carry levels between change points are not re-sampled; both
    engines use the identical definition).

    Day rendering is pure integer arithmetic on epoch-days (no
    timestamp/timezone dependence), so the hash is tz-proof.
    """
    ev = load_table(spark, sf_dir, "events")
    sessions = _sessions(ev)
    # both boundary deltas from ONE pass over sessions (explode, not a
    # self-union — a union would scan and sessionize events twice)
    deltas = sessions.select(
        F.explode(
            F.array(
                F.struct(F.col("start_us").alias("us"), F.lit(1).alias("d")),
                F.struct((F.col("end_us") + 1).alias("us"), F.lit(-1).alias("d")),
            )
        ).alias("x")
    ).select("x.us", "x.d")
    pts = (
        deltas.groupBy("us")
        .agg(F.sum("d").alias("d"))
        # exact integer division: Spark `div` truncates toward zero,
        # and so does DuckDB's integer `//` (verified: -7 // 2 = -3 in
        # BOTH) — so plain div matches the oracle for every input,
        # including pre-1970 sentinels, and never loses exactness past
        # 2^53 the way a double divide-then-cast would
        .withColumn("day_idx", F.expr("us div 86400000000"))
    )
    # pts (2x|sessions| collapsed change points) feeds both the in-day
    # running sum and the per-day carry totals; a lazy localCheckpoint
    # materializes it once so the carry branch doesn't re-run the
    # sessionize lineage from the scan
    pts = pts.localCheckpoint(eager=False)
    in_day = Window.partitionBy("day_idx").orderBy("us").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pts = pts.withColumn("run_in_day", F.sum("d").over(in_day))
    day_totals = pts.groupBy("day_idx").agg(F.sum("d").alias("day_total"))
    across_days = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = day_totals.withColumn(
        "carry", F.coalesce(F.sum("day_total").over(across_days), F.lit(0))
    ).select("day_idx", "carry")
    run = pts.join(F.broadcast(carry), "day_idx").withColumn(
        "conc", F.col("run_in_day") + F.col("carry")
    )
    return run.groupBy("day_idx").agg(
        F.max("conc").alias("peak_concurrent"),
        F.count(F.lit(1)).alias("n_change_points"),
    ).select(
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("day_idx").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "peak_concurrent",
        "n_change_points",
    )


@query(
    "ev_ewma",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_trunc('day', ts)::DATE AS day,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
      FROM events
      GROUP BY 1, 2
    )
    SELECT strftime(t.day, '%Y-%m-%d') AS day,
           t.event_type,
           max(t.cents)::BIGINT AS cents,
           round(
             sum(s.cents * CAST(pow(2, 13 - date_diff('day', s.day, t.day)) AS BIGINT))::BIGINT::DOUBLE
             / sum(CAST(pow(2, 13 - date_diff('day', s.day, t.day)) AS BIGINT))::BIGINT
             / 100.0, 6) AS ewma_value
    FROM daily t
    JOIN daily s
      ON s.event_type = t.event_type
     AND s.day BETWEEN t.day - INTERVAL 13 DAY AND t.day
    GROUP BY t.day, t.event_type
    """,
)
def ev_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily spend per event
    type (alpha = 1/2, 14-day support) — the smoothing pass behind
    anomaly baselines and trend dashboards.

    Engine-portable by construction: weights are dyadic (2^(13-lag)),
    daily totals are exact integer cents, so numerator and denominator
    are exact BIGINTs on both engines and the only float op is one
    correctly-rounded IEEE division at the end. No pow-of-0.7 libm
    drift, no float accumulation order dependence.

    Scale shape: the heavy work is the one groupBy to daily totals
    (|days| x |types| rows out); the banded self-join runs on that tiny
    aggregate with the right side broadcast — never on raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    # the tiny daily aggregate feeds both sides of the banded self-join;
    # materialize it once so the corpus isn't scanned per side
    daily = daily.localCheckpoint(eager=False)
    t = daily.alias("t")
    s = daily.alias("s")
    lag = F.datediff(F.col("t.day"), F.col("s.day"))
    weight = F.pow(F.lit(2.0), (F.lit(13) - lag).cast("double")).cast("long")
    joined = t.join(
        F.broadcast(s),
        (F.col("s.event_type") == F.col("t.event_type"))
        & (F.col("s.day") >= F.date_sub(F.col("t.day"), 13))
        & (F.col("s.day") <= F.col("t.day")),
    )
    return joined.groupBy(F.col("t.day"), F.col("t.event_type")).agg(
        F.max(F.col("t.cents")).alias("cents"),
        F.round(
            F.sum(F.col("s.cents") * weight).cast("double")
            / F.sum(weight)
            / F.lit(100.0),
            6,
        ).alias("ewma_value"),
    ).select(
        F.date_format(F.col("t.day"), "yyyy-MM-dd").alias("day"),
        F.col("t.event_type").alias("event_type"),
        "cents",
        "ewma_value",
    )


@query(
    "ev_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           count(*) AS n,
           (count(*)::BIGINT * 2000000
              + (sum(count(*)) OVER (PARTITION BY prev_type))::BIGINT)
             // (2 * (sum(count(*)) OVER (PARTITION BY prev_type))::BIGINT)
             / 1000000.0 AS p
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    session stream: lag window over (user, time) → bigram counts →
    row-normalized probabilities. The user_id shuffle serves the lag
    window; the transition aggregate then collapses to |types|^2 rows,
    and the row-normalizing window runs on that tiny aggregate — the
    heavy data is touched exactly once.

    The probability is emitted via the integer half-up 6dp formula
    (r7 hardening): the denominator is a per-prev-type TOTAL that can
    land on 2^7*5^k values at scale (16000, 80000, ...), exactly the
    power-of-2-times-5 class where round(n/total, 6) straddles a
    7th-decimal tie between the engines (the w_distribution_stats
    lesson — see the verify skill's doctrine note).
    """
    from mie_spark.queries.relational import int_div

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = Window.partitionBy("prev_type")
    tot = F.sum("n").over(row_total)
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (int_div(F.col("n") * 2000000 + tot, 2 * tot) / F.lit(1e6)).alias("p"),
    )


@query(
    "ev_funnel_time",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t1
      GROUP BY e.user_id
    ), d AS (
      SELECT (epoch_us(p.tp) - epoch_us(v.t1)) // 1000000 AS delta_s
      FROM p JOIN v ON p.user_id = v.user_id
    )
    SELECT count(*) AS n_converted,
           round(quantile_cont(delta_s, 0.5), 6) AS p50_s,
           round(quantile_cont(delta_s, 0.9), 6) AS p90_s,
           min(delta_s) AS min_s,
           max(delta_s) AS max_s
    FROM d
    """,
)
def ev_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution (first view → first subsequent
    purchase): the latency companion to ev_funnel's conversion counts.
    Both stage tables hash-partition on user_id, so the join is
    co-partitioned; deltas are exact integer seconds (epoch-us integer
    division), making the interpolated percentiles bit-comparable
    across engines (Spark percentile == DuckDB quantile_cont)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    d = (
        p.join(v, "user_id")
        .select((F.unix_micros("tp") - F.unix_micros("t1")).alias("delta_us"))
        # integer div, not /1e6-then-cast: exact floor like the oracle's //
        .select(F.expr("delta_us div 1000000").alias("delta_s"))
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("delta_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("delta_s", F.lit(0.9)), 6).alias("p90_s"),
        F.min("delta_s").alias("min_s"),
        F.max("delta_s").alias("max_s"),
    )


@query(
    "ev_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(cents)::BIGINT AS s,
             sum(cents * cents)::BIGINT AS ss
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.cents,
           round((st.n * d.cents - st.s) / sqrt(st.n * st.ss - st.s * st.s), 4)
             AS z
    FROM daily d JOIN stats st USING (event_type)
    WHERE st.n >= 2 AND st.n * st.ss - st.s * st.s > 0
      AND (st.n * d.cents - st.s) * (st.n * d.cents - st.s)
            >= 4 * (st.n * st.ss - st.s * st.s)
    """,
)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly flagging: days whose per-type revenue sits
    >= 2 population standard deviations from that type's daily mean.

    The |z| >= 2 DECISION is exact integer arithmetic — z^2 >= 4 is
    cross-multiplied to (n*x - S)^2 >= 4*(n*SS - S^2) over BIGINT daily
    cents, so the flag can never straddle a cross-engine float boundary;
    floats appear only in the REPORTED z (identical integer operands →
    identical IEEE divide/sqrt on both engines). Plan: one shuffle for
    the daily rollup, per-type (n, S, SS) moments as a tiny aggregate
    broadcast back — the 100 TB shape, no window over all days. The
    integer cross-multiplication needs 4*(n*SS - S^2) < 2^63; with
    SS ~ n*c^2 that bounds n*c below ~1.5e9 — e.g. ~1e3 days at up to
    ~1e6 cents/day. Past that, swap the decision to two-pass double
    moments (documented trade; SCALE.md)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    num = F.col("n") * F.col("cents") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        j.filter((F.col("n") >= 2) & (var_n2 > 0) & (num * num >= 4 * var_n2))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            F.round(num / F.sqrt(var_n2), 4).alias("z"),
        )
    )


# --- SCD-2 dimension build (change-data-capture interval compression) -------

@query(
    "ev_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER w2) AS valid_to_us,
           (lead(ts) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ev_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension build from a change stream — the warehouse
    CDC shape: compress each user's event-type history into validity
    intervals [valid_from, valid_to) with an open-ended current row.
    Change-point detection (lag != prev) and interval closing (lead of
    the surviving rows) are two window passes over the SAME
    (user_id)-partitioned sort — one shuffle serves both, Catalyst
    collapses them into a single sort + two window operators. Ties
    broken by (ts, event_id), so the compression is deterministic.
    At 100 TB this is embarrassingly parallel in the dimension key;
    no global sort, no driver state."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# --- exact heavy hitters via Misra-Gries candidates -------------------------

@query(
    "ev_heavy_hitters",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(value) AS BIGINT) AS bucket, count(*)::BIGINT AS cnt
      FROM events GROUP BY 1
    ), t AS (SELECT count(*)::BIGINT AS total FROM events)
    SELECT bucket, cnt,
           ((2 * cnt * 10000 + total) // (2 * total)) / 10000.0 AS share
    FROM c, t
    WHERE cnt * 200 >= total
    """,
)
def ev_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (value buckets holding >= 0.5% of all
    events) via the two-pass Misra-Gries pattern
    (operators/sketch.py): per-partition bounded summaries give a
    candidate set with NO false negatives (k+1 > 200 bound), a
    broadcast semi-join recounts only candidates exactly, and the
    threshold is cross-multiplied BIGINT. The oracle is the plain
    GROUP BY ... HAVING — the sketch path must reproduce it
    bit-for-bit, which is the point: at 100 TB with an unbounded key
    space (URLs, n-grams) the plain form shuffles a partial count per
    DISTINCT key, while this shuffles O(partitions x k) candidates
    plus the candidates' own rows. On this corpus's bounded key space
    both are cheap; the query grades the machinery."""
    from mie_spark.operators.sketch import exact_heavy_hitters

    ev = load_table(spark, sf_dir, "events").select(
        F.floor("value").cast("long").alias("bucket")
    )
    return exact_heavy_hitters(ev, "bucket", denom=200)


@query(
    "ev_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY event_type
    """,
)
def ev_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts per event type via distributed
    bitmaps — the warehouse technique that replaces count(DISTINCT)'s
    row-holding aggregate with fixed-width integer state: each user_id
    maps to (word = id div 32, bit = id mod 32); a first map-combined
    aggregate ORs the per-(type, word) bitmaps (32-bit words so no
    shift ever reaches 63 — the same ANSI/DuckDB overflow boundary as
    binary_quantize), a second sums popcounts. Shuffle state is
    O(types x occupied words), not O(distinct ids) per group — the
    Roaring-bitmap shape warehouses use for COUNT(DISTINCT) at scale.
    The oracle is deliberately the INDEPENDENT formulation — a plain
    count(DISTINCT) — so the bitmap identity itself is what gets
    hash-graded. Exactness: pure integer ops end to end (ids are
    non-negative in this corpus; a general operator would pmod the id
    first — Spark's % is signed)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("user_id div 32").alias("word"),
        F.expr("shiftleft(1L, CAST(user_id % 32 AS INT))").alias("bit"),
    )
    words = ev.groupBy("event_type", "word").agg(
        F.expr("bit_or(bit)").alias("bm")
    )
    return (
        words.groupBy("event_type")
        .agg(F.sum(F.expr("bit_count(bm)")).alias("n_users"))
    )


@query(
    "ev_bitmap_overlap",
    oracle="""
    WITH pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    )
    SELECT p.type_a, p.type_b,
           (SELECT count(DISTINCT e1.user_id)
            FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id
            WHERE e1.event_type = p.type_a
              AND e2.event_type = p.type_b)::BIGINT AS n_both
    FROM pairs p
    ORDER BY type_a, type_b
    """,
)
def ev_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap census — |users(A) ∩ users(B)| for every event-
    type pair — computed EXACTLY via bitmap intersection instead of a
    self-join: per (type, word) 32-bit membership bitmaps (the
    ev_bitmap_distinct layout) meet in a word-aligned equi-join, AND
    together, and sum popcounts. The self-join the oracle runs touches
    O(|A|x|B|) matched event rows per pair; the bitmap form touches
    O(occupied words) — the audience-insights shape warehouses ship as
    theta sketches, here exact because ids are dense. The oracle is the
    independent naive formulation, so the bitmap algebra itself is
    hash-graded. All pairs come from one bitmap table built once
    (5 types → 10 pairs share the same aggregate)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("user_id div 32").alias("word"),
        F.expr("shiftleft(1L, CAST(user_id % 32 AS INT))").alias("bit"),
    )
    # lazy localCheckpoint: the bitmap table feeds BOTH sides of the
    # self-join, and the per-side column renames defeat ReuseExchange
    # (verified: without it the scan+aggregate subtree executes twice,
    # 5 exchanges vs 2+checkpoint) — materializing it once is the
    # cheaper plan and the honest one at scale
    words = (
        ev.groupBy("event_type", "word")
        .agg(F.expr("bit_or(bit)").alias("bm"))
        .localCheckpoint(eager=False)
    )
    a = words.select(
        F.col("event_type").alias("type_a"), "word", F.col("bm").alias("bm_a")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "word", F.col("bm").alias("bm_b")
    )
    return (
        a.join(b, "word")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.expr("bit_count(bm_a & bm_b)")).alias("n_both"))
        .orderBy("type_a", "type_b")
    )


@query(
    "ev_session_paths",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    p AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, count(*) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def ev_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first five events (total order
    (ts, event_id), so ties can never reorder across engines) joined
    into a '>'-separated path, then a path census ranked by audience
    size. The product-analytics "common paths" report.

    Plan: ONE user_id shuffle serves the row_number window; the
    per-user path is built in-row (sort_array over (rn, type) structs →
    transform → concat_ws — no second ordered aggregation), and the
    path census groups ~|users| tiny strings. At 100 TB the heavy
    events table is touched once; everything after the first window is
    proportional to users, not events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = (
        ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )
    paths = first5.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )


@query(
    "ev_rfm",
    oracle="""
    WITH ref AS (
      SELECT max(CAST(ts AS DATE)) AS d0 FROM events
      WHERE event_type = 'purchase'
    ),
    base AS (
      SELECT user_id,
             date_diff('day', max(CAST(ts AS DATE)), (SELECT d0 FROM ref))
               ::BIGINT AS recency_days,
             count(*) AS frequency,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS mon_cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    n AS (SELECT count(*)::BIGINT AS n_users FROM base),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY recency_days, user_id) AS rr,
             row_number() OVER (ORDER BY frequency DESC, user_id) AS rf,
             row_number() OVER (ORDER BY mon_cents DESC, user_id) AS rm
      FROM base
    )
    SELECT user_id, recency_days, frequency, mon_cents,
           4 - ((rr - 1) * 4) // (SELECT n_users FROM n) AS r_score,
           4 - ((rf - 1) * 4) // (SELECT n_users FROM n) AS f_score,
           4 - ((rm - 1) * 4) // (SELECT n_users FROM n) AS m_score
    FROM ranked
    """,
)
def ev_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    purchase events — the classic lifecycle-marketing scoring table.
    Quartile scores use an EXPLICIT integer rule on a totally-ordered
    row_number (score = 4 - ((rank-1)*4) div n, user_id tiebreak)
    instead of ntile(), so bucket-boundary semantics are the same
    arithmetic on both engines rather than two implementations'
    edge-case conventions. Monetary is exact cents (the ev_top_spenders
    doctrine); recency is an integer day difference against the corpus
    max purchase date.

    Plan: one user_id aggregate over the filtered scan, then the three
    global ranks computed as a DISTRIBUTED two-level rank (the
    ev_concurrency carry pattern): the three metrics melt into one
    (metric, sort_key, user_id) stream (descending metrics negated so
    every order is ascending), repartitionByRange over the composite
    key gives range-ordered partitions, row_number runs PARTITIONED by
    (partition, metric), and the exact global rank adds a per-partition
    prefix-count carry (|partitions| x 3 rows — the bounded exception,
    like ev_concurrency's per-day carry). Because the composite key is
    unique, the reassembled rank is exact no matter where the range
    sampler drops its boundaries, so the hash is partitioning-proof.
    No unpartitioned window ever sees a |users|-scaled input."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    ref = ev.agg(F.max(F.to_date("ts")).alias("d0"))
    base = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_d"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("mon_cents"),
    )
    base = base.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.datediff("d0", "last_d").cast("long").alias("recency_days"),
        "frequency",
        "mon_cents",
    )
    # three consumers (n_users agg, melt, final join-back): materialize
    # the per-user aggregate once so the events scan runs once
    base = base.localCheckpoint(eager=False)
    n = base.agg(F.count(F.lit(1)).alias("n_users"))
    # melt: one row per (user, metric); descending metrics negate so a
    # single ascending (metric, v, user_id) order ranks all three
    melted = base.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.lit("r").alias("m"), F.col("recency_days").alias("v")),
                F.struct(F.lit("f").alias("m"), (-F.col("frequency")).alias("v")),
                F.struct(F.lit("m").alias("m"), (-F.col("mon_cents")).alias("v")),
            )
        ).alias("x"),
    ).select("user_id", "x.m", "x.v")
    ranked = two_level_rank(
        melted, order_cols=["v", "user_id"], part_cols=["m"], out="rank"
    )
    scores = (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("score", F.lit(4) - F.expr("((rank - 1) * 4) div n_users"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("m") == "r", F.col("score"))).alias("r_score"),
            F.max(F.when(F.col("m") == "f", F.col("score"))).alias("f_score"),
            F.max(F.when(F.col("m") == "m", F.col("score"))).alias("m_score"),
        )
    )
    return base.join(scores, "user_id").select(
        "user_id",
        "recency_days",
        "frequency",
        "mon_cents",
        "r_score",
        "f_score",
        "m_score",
    )


# --- sliding-window exact distinct (bitmap family, trailing window) ----------

@query(
    "ev_sliding_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM du)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(DISTINCT e.user_id)::BIGINT AS n_users
    FROM days d
    JOIN du e ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def ev_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day EXACT distinct users per day — the rolling-DAU/
    WAU census — via the bitmap family's state instead of re-counting
    ids per window: per-(day, word) 32-bit membership bitmaps build
    once (ev_bitmap_distinct's layout), then each bitmap row FANS OUT
    to the <= 7 window-end days it serves (explode of a 7-day
    sequence + broadcast semi-join against observed days) and OR-merges
    per (end-day, word). Every window's count is exact; total state is
    O(days x occupied words), and no user_id ever crosses the wire
    more than once per active day — where the naive form reshuffles
    the full (day x user) set once per window it appears in. The
    oracle IS that naive form (a BETWEEN self-join + count DISTINCT),
    so the fan-out/merge identity itself is what the hash grades."""
    from mie_spark.operators.sketch import (
        day_bitmap_words,
        sliding_distinct_counts,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    counts = sliding_distinct_counts(
        day_bitmap_words(ev, "day", "user_id"), window_days=7
    )
    return counts.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_users"
    )


@query(
    "ev_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, count(*)::BIGINT AS dau FROM du GROUP BY day),
    wau AS (
      SELECT d.day, count(DISTINCT e.user_id)::BIGINT AS wau
      FROM days d
      JOIN du e ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           (dau.dau * 20000 + wau.wau) // (2 * wau.wau) / 10000.0
             AS stickiness
    FROM days d JOIN dau USING (day) JOIN wau ON wau.day = d.day
    """,
)
def ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the product-analytics engagement
    staple — composed from ONE bitmap build at two window widths:
    window_days=1 gives exact DAU, window_days=7 gives rolling WAU
    (sliding_distinct_counts both times, same per-(day, word) state),
    and the ratio is integer half-up 4dp so it can never straddle a
    float boundary. DAU <= WAU by construction (same bitmaps OR-merge
    monotonically), so stickiness is always in (0, 1]."""
    from mie_spark.operators.sketch import (
        day_bitmap_words,
        sliding_distinct_counts,
    )
    from mie_spark.queries.relational import share_half_up_4dp

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    # the bitmap table is tiny (days x occupied words) and consumed by
    # FOUR subtrees (two widths x {fan, days-broadcast}) — checkpoint it
    # once so the events scan runs once, not per consumer (the pregel
    # convention, same as g_random_walks' edge table)
    words = day_bitmap_words(ev, "day", "user_id").localCheckpoint(
        eager=False
    )
    dau = sliding_distinct_counts(words, window_days=1).withColumnRenamed(
        "n_users", "dau"
    )
    wau = sliding_distinct_counts(words, window_days=7).withColumnRenamed(
        "n_users", "wau"
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            share_half_up_4dp(F.col("dau"), F.col("wau")).alias("stickiness"),
        )
    )


@query(
    "ev_kmv_distinct",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hu
      FROM du
    ),
    r AS (
      SELECT event_type, hu,
             row_number() OVER (PARTITION BY event_type ORDER BY hu) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM h
    )
    SELECT event_type,
           any_value(n)::BIGINT AS n_exact,
           max(CASE WHEN rn = 64 THEN hu END)::BIGINT AS kth_hash,
           CASE WHEN any_value(n) < 64 THEN any_value(n)::BIGINT
                ELSE ((145268109580462718976
                         + max(CASE WHEN rn = 64 THEN hu END))
                      // (2 * max(CASE WHEN rn = 64 THEN hu END)))::BIGINT
           END AS est_users
    FROM r GROUP BY event_type
    """,
)
def ev_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=64 — the
    mergeable bottom-k sketch (Bar-Yossef et al.; the theta-sketch
    core): keep the k smallest hash values per group; estimate
    (k-1)/u where u is the k-th minimum as a fraction of the hash
    space, or the exact count when fewer than k values exist. Unlike
    HLL (ev_approx_distinct, rows-only), the KMV ESTIMATE itself
    hash-grades exactly: the hash is a deterministic 60-bit md5
    prefix, the k-th minimum is a pure function of the data, and the
    estimate is emitted via the integer half-up formula
    ((2*(k-1)*2^60 + kth) div (2*kth), decimal-exact on both engines
    — 2*63*2^60 = 145268109580462718976 exceeds a long, so int_div's
    decimal(38,0) path and DuckDB's HUGEINT literal carry it).

    Scale: per group the sketch state is k longs (map-combinable
    bottom-k; mergeable by union-then-bottom-k), vs the bitmap
    family's O(distinct/32) words — the trade a 100 TB census makes
    when groups have billions of members. n_exact rides along for the
    accuracy story (~±1/sqrt(k) ≈ 12% at k=64)."""
    from mie_spark.queries.relational import int_div

    k = 64
    du = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    hu = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy("event_type").orderBy("hu")
    wp = Window.partitionBy("event_type")
    r = du.select("event_type", hu.alias("hu")).select(
        "event_type",
        "hu",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    kth = F.max(F.when(F.col("rn") == k, F.col("hu")))
    n = F.any_value(F.col("n"))
    est = F.when(n < k, n.cast("long")).otherwise(
        int_div(F.lit(2 * (k - 1)).cast("decimal(38,0)") * F.lit(2**60).cast("decimal(38,0)") + kth, 2 * kth)
    )
    return r.groupBy("event_type").agg(
        n.cast("long").alias("n_exact"),
        kth.cast("long").alias("kth_hash"),
        est.alias("est_users"),
    )


@query(
    "ev_kmv_overlap",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hu
      FROM du
    ),
    r AS (
      SELECT event_type, hu,
             row_number() OVER (PARTITION BY event_type ORDER BY hu) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    sk AS (SELECT event_type, hu, rn, n FROM r WHERE rn <= 64),
    th AS (
      SELECT event_type,
             CASE WHEN any_value(n) >= 64
                  THEN max(CASE WHEN rn = 64 THEN hu END)
                  ELSE 1152921504606846976 END AS theta
      FROM sk GROUP BY event_type
    ),
    pr AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             least(a.theta, b.theta) AS theta
      FROM th a JOIN th b ON a.event_type < b.event_type
    ),
    j AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, a.hu
      FROM sk a JOIN sk b ON a.hu = b.hu AND a.event_type < b.event_type
    ),
    c AS (
      SELECT j.type_a, j.type_b, count(*) AS d
      FROM j JOIN pr ON pr.type_a = j.type_a AND pr.type_b = j.type_b
      WHERE j.hu < pr.theta
      GROUP BY 1, 2
    )
    SELECT pr.type_a, pr.type_b, pr.theta::BIGINT AS theta,
           coalesce(c.d, 0)::BIGINT AS d_common,
           CASE WHEN pr.theta >= 1152921504606846976
                THEN coalesce(c.d, 0)::BIGINT
                ELSE ((2 * coalesce(c.d, 0)::HUGEINT * 1152921504606846976
                         + pr.theta) // (2 * pr.theta))::BIGINT
           END AS est_common
    FROM pr LEFT JOIN c USING (type_a, type_b)
    """,
)
def ev_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the theta-sketch intersection: for
    every event-type pair, clip both bottom-64 sketches to the shared
    threshold theta = min(theta_a, theta_b), count surviving common
    hash values (strictly below theta, the standard KMV rule), and
    scale by theta's fraction of the hash space. Everything after the
    per-type bottom-k is sketch-sized (types x 64 rows) — the whole
    pair analysis never revisits the data, which is the reason
    warehouses keep sketches next to their rollups. Like
    ev_kmv_distinct, the estimate hash-grades exactly (deterministic
    hash space, integer half-up scaling, exact-count branch when a
    side kept everything); ev_bitmap_overlap holds the exact truth
    for the accuracy story."""
    from mie_spark.queries.relational import int_div

    k, space = 64, 2**60
    du = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    hu = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("event_type").orderBy("hu")
    wp = Window.partitionBy("event_type")
    sk = (
        du.select("event_type", hu.alias("hu"))
        .select(
            "event_type",
            "hu",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wp).alias("n"),
        )
        .filter(F.col("rn") <= k)
    )
    th = sk.groupBy("event_type").agg(
        F.when(
            F.any_value("n") >= k,
            F.max(F.when(F.col("rn") == k, F.col("hu"))),
        )
        .otherwise(F.lit(space))
        .alias("theta")
    )
    pr = (
        th.alias("a")
        .join(th.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.least(F.col("a.theta"), F.col("b.theta")).alias("theta"),
        )
    )
    j = (
        sk.alias("a")
        .join(
            sk.alias("b"),
            (F.col("a.hu") == F.col("b.hu"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.hu").alias("hu"),
        )
    )
    c = (
        j.join(pr, ["type_a", "type_b"])
        .filter(F.col("hu") < F.col("theta"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    d = F.coalesce(F.col("d"), F.lit(0)).cast("long")
    est = F.when(F.col("theta") >= space, d).otherwise(
        int_div(
            F.lit(2).cast("decimal(38,0)") * d * F.lit(space).cast("decimal(38,0)")
            + F.col("theta"),
            2 * F.col("theta"),
        )
    )
    return pr.join(c, ["type_a", "type_b"], "left").select(
        "type_a",
        "type_b",
        F.col("theta").cast("long").alias("theta"),
        d.alias("d_common"),
        est.alias("est_common"),
    )


@query(
    "ev_cms_topk",
    oracle="""
    WITH uc AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    h AS (
      SELECT user_id, n, j,
             ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR),
                             1, 8))::BIGINT % 256 AS b
      FROM uc CROSS JOIN unnest([0, 1, 2, 3]) AS t(j)
    ),
    counters AS (SELECT j, b, sum(n)::BIGINT AS c FROM h GROUP BY j, b),
    top AS (SELECT user_id, n FROM uc ORDER BY n DESC, user_id LIMIT 20)
    SELECT t.user_id,
           t.n::BIGINT AS n_true,
           min(c.c)::BIGINT AS est_count,
           (min(c.c) - t.n)::BIGINT AS overcount
    FROM top t
    JOIN h ON h.user_id = t.user_id
    JOIN counters c ON c.j = h.j AND c.b = h.b
    GROUP BY t.user_id, t.n
    """,
)
def ev_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) — the streaming
    frequency-estimation staple — with the ESTIMATE ITSELF hash-graded
    exactly, like the KMV family: the d=4 hash rows are deterministic
    md5 prefixes into w=256 buckets, counters are pure sums, and the
    estimate is min over rows, so DuckDB replays every cell bit-for-
    bit. Graded per top-20 user: true count, CM estimate, and the
    overcount (est − true ≥ 0 ALWAYS — the sketch's one-sided error
    guarantee becomes a hash-checked integer, not a prose claim; with
    1,500 users hashed into 256 buckets the overcounts are genuinely
    nonzero, so the grade exercises real collisions).

    Scale shape: the only touch of the raw events is ONE group-by
    (user_id). Everything after is sketch-sized — the counter table is
    ≤ d×w = 1024 rows no matter the corpus, exactly why a 100 TB
    stream keeps a CM sketch instead of a key census. At true stream
    scale the same cells fold map-side (groupBy (j, bucket) is
    map-combinable) and the per-user census drops away; here it rides
    along to grade the one-sided error."""
    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    j = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("j")
    h = uc.select("user_id", "n", j).withColumn(
        "b",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 256,
    )
    counters = h.groupBy("j", "b").agg(F.sum("n").alias("c"))
    top = (
        uc.orderBy(F.col("n").desc(), "user_id")
        .limit(20)
        .select("user_id", F.col("n").alias("n_true"))
    )
    return (
        top.join(h.select("user_id", "j", "b"), "user_id")
        .join(counters, ["j", "b"])
        .groupBy("user_id", "n_true")
        .agg(F.min("c").alias("est_count"))
        .select(
            "user_id",
            F.col("n_true").cast("long").alias("n_true"),
            F.col("est_count").cast("long").alias("est_count"),
            (F.col("est_count") - F.col("n_true"))
            .cast("long")
            .alias("overcount"),
        )
    )


@query(
    "ev_log_histogram",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value > 0
    ),
    b AS (
      SELECT event_type, length(bin(cents)) AS bucket
      FROM c WHERE cents > 0 AND cents < 4611686018427387904
    )
    SELECT event_type,
           bucket::BIGINT AS bucket,
           (1::BIGINT << (bucket - 1))::BIGINT AS lo_cents,
           ((1::BIGINT << bucket) - 1)::BIGINT AS hi_cents,
           count(*)::BIGINT AS n
    FROM b GROUP BY event_type, bucket
    """,
)
def ev_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential (base-2) value histogram — the DDSketch /
    HdrHistogram shape, which is how latency and spend distributions
    are kept at stream scale: O(log range) buckets per group,
    mergeable by addition, relative-error-bounded quantile readout.
    The bucket function is INTEGER-EXACT on both engines: bucket =
    bit length of the integer cents (length of `bin(x)` — a string
    op, no transcendental log2 whose 1-ulp drift could flip a
    boundary at exact powers of two, per the round-7 doctrine), so
    the full sketch hash-grades cell for cell. State: buckets ×
    groups ≈ 17 × 5 rows here; still ≤ 64 per group if values spanned
    the whole long range — the reason a 100 TB stream keeps this
    instead of raw values."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("value") > 0).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # guard the shift cap explicitly: 0 < cents < 2^62 keeps every
    # bucket in [1, 62], where shiftleft agrees across engines (DuckDB
    # rejects 1<<63 as overflow, Spark wraps silently — round-7
    # doctrine; the oracle's bounds use integer shifts too, since
    # DuckDB's `2 ** b` is a DOUBLE pow that absorbs the -1 above
    # 2^53). cents > 0 also keeps sub-half-cent positives out of
    # bucket 1 (bin(0) is the string "0": length 1, wrong bucket). A
    # corpus exceeding the cap needs the top bucket widened to
    # [2^62, max], not a bigger shift.
    b = c.filter(
        (F.col("cents") > 0) & (F.col("cents") < F.lit(1 << 62))
    ).select(
        "event_type", F.length(F.bin("cents")).cast("long").alias("bucket")
    )
    return b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        "bucket",
        # SQL shiftleft takes a column shift count; the python wrapper
        # only accepts a literal int. buckets stay <= 63 by the bin()
        # length of a positive long, inside the cross-engine shift cap
        F.expr("shiftleft(1L, cast(bucket - 1 as int))").alias("lo_cents"),
        (F.expr("shiftleft(1L, cast(bucket as int))") - 1).alias("hi_cents"),
        "n",
    )


@query(
    "ev_quantile_bound",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n,
           true AS p50_rank_ok,
           true AS p90_rank_ok
    FROM events GROUP BY event_type
    """,
)
def ev_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy sub-oracle for the quantile sketch (the documented
    100 TB swap-in for ev_value_percentiles' exact percentiles):
    approx_percentile's GK-sketch guarantee is RANK error ≤
    1/accuracy, so the verifiable claim is rank-space, not
    value-space — the fraction of values ≤ the p-th estimate must sit
    within p ± 0.02 (10× the sketch's 1/1000 guarantee; observed
    drift ≤ 0.001 at sf0.1). The flag is cross-multiplied BIGINT
    (count·1000 vs bound·n), immune to float ties. Completes the
    sketch family's grading story: MG, KMV, bitmap, CMS grade
    exactly; HLL and GK grade by accuracy flag (ev_hll_accuracy /
    here). Two passes over events by design — the estimate must be
    judged against the data, not against itself."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ap = ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9)), 1000)
        .alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    j = ev.join(F.broadcast(ap), "event_type")
    ranks = j.groupBy("event_type", "n").agg(
        F.sum(
            F.when(F.col("value") <= F.col("ap")[0], 1).otherwise(0)
        ).alias("le50"),
        F.sum(
            F.when(F.col("value") <= F.col("ap")[1], 1).otherwise(0)
        ).alias("le90"),
    )
    def rank_ok(le, p_mille):  # |rank/n - p| <= 0.02, in integers
        return (F.col(le) * 1000 >= (p_mille - 20) * F.col("n")) & (
            F.col(le) * 1000 <= (p_mille + 20) * F.col("n")
        )
    return ranks.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        rank_ok("le50", 500).alias("p50_rank_ok"),
        rank_ok("le90", 900).alias("p90_rank_ok"),
    )


@query(
    "ev_ordered_funnel",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS m FROM events
    ),
    v AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN m END) AS t1
      FROM ev GROUP BY user_id
    ),
    c AS (
      SELECT v.user_id, v.t1,
             min(CASE WHEN e.event_type = 'click'
                       AND e.m > v.t1
                       AND e.m <= v.t1 + 3600000000
                      THEN e.m END) AS t2
      FROM v JOIN ev e USING (user_id)
      WHERE v.t1 IS NOT NULL
      GROUP BY v.user_id, v.t1
    ),
    p AS (
      SELECT c.user_id, c.t1, c.t2,
             min(CASE WHEN e.event_type = 'purchase'
                       AND c.t2 IS NOT NULL
                       AND e.m > c.t2
                       AND e.m <= c.t2 + 3600000000
                      THEN e.m END) AS t3
      FROM c JOIN ev e USING (user_id)
      GROUP BY c.user_id, c.t1, c.t2
    )
    SELECT user_id,
           t1 AS view_us,
           (t2 IS NOT NULL) AS clicked,
           CASE WHEN t2 IS NOT NULL
                THEN (t2 - t1) // 1000000 END AS click_lag_s,
           (t3 IS NOT NULL) AS purchased,
           CASE WHEN t3 IS NOT NULL
                THEN (t3 - t2) // 1000000 END AS purchase_lag_s
    FROM p
    """,
)
def ev_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED funnel with conversion windows — the product-analytics
    shape ev_funnel's unordered census can't express: first view, then
    the first click STRICTLY AFTER it within 1 h, then the first
    purchase strictly after that click within 1 h. Each stage's anchor
    depends on the previous stage's timestamp, so the computation is a
    chain of conditional MIN aggregations re-anchored per user — here
    one in-row pass over each user's collected (type, micros) events
    (array_min over filter lambdas, all whole-stage codegen; per-user
    event lists are bounded by the corpus shape, ~70 events). Lags are
    emitted as integer seconds (pure micros arithmetic, no timezone or
    float anywhere), so the full per-user funnel hash-grades.

    Scale: ONE user_id shuffle total. The oracle's three grouped
    passes over an (events × stages) join would re-shuffle the raw
    stream per stage — the in-row form is the 100 TB shape, the
    SQL form is the spec."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("m"), F.col("event_type").alias("t")
        ).alias("e"),
    )
    per_user = ev.groupBy("user_id").agg(F.collect_list("e").alias("es"))
    hour = 3_600_000_000

    def stage_min(cond):  # min micros among events satisfying cond
        return F.array_min(
            F.transform(F.filter("es", cond), lambda s: s["m"])
        )

    t1 = stage_min(lambda s: s["t"] == "view")
    u = per_user.select("user_id", "es", t1.alias("t1")).filter(
        F.col("t1").isNotNull()
    )
    t2 = F.array_min(
        F.transform(
            F.filter(
                "es",
                lambda s: (s["t"] == "click")
                & (s["m"] > F.col("t1"))
                & (s["m"] <= F.col("t1") + F.lit(hour)),
            ),
            lambda s: s["m"],
        )
    )
    u2 = u.select("user_id", "es", "t1", t2.alias("t2"))
    t3 = F.array_min(
        F.transform(
            F.filter(
                "es",
                lambda s: (s["t"] == "purchase")
                & F.col("t2").isNotNull()
                & (s["m"] > F.col("t2"))
                & (s["m"] <= F.col("t2") + F.lit(hour)),
            ),
            lambda s: s["m"],
        )
    )
    u3 = u2.select("user_id", "t1", "t2", t3.alias("t3"))
    return u3.select(
        "user_id",
        F.col("t1").alias("view_us"),
        F.col("t2").isNotNull().alias("clicked"),
        F.when(
            F.col("t2").isNotNull(),
            F.expr("(t2 - t1) div 1000000"),
        ).alias("click_lag_s"),
        F.col("t3").isNotNull().alias("purchased"),
        F.when(
            F.col("t3").isNotNull(),
            F.expr("(t3 - t2) div 1000000"),
        ).alias("purchase_lag_s"),
    )


@query(
    "ev_cohort_ltv",
    oracle="""
    WITH fu AS (
      SELECT user_id, date_trunc('month', min(ts)) AS cm
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT user_id, date_trunc('month', ts) AS em,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (SELECT fu.cm, r.em, r.user_id, r.cents FROM r JOIN fu USING (user_id))
    SELECT strftime(cm, '%Y-%m') AS cohort_month,
           ((year(em) * 12 + month(em))
            - (year(cm) * 12 + month(cm)))::BIGINT AS month_age,
           count(DISTINCT user_id)::BIGINT AS n_buyers,
           sum(cents)::BIGINT AS revenue_cents
    FROM j GROUP BY cm, em
    """,
)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — revenue per (signup cohort, months since
    signup), the warehouse staple behind every LTV curve and payback
    chart (ev_retention's sibling: that one counts active USERS, this
    one sums purchase REVENUE, exact integer cents). Month age is pure
    integer calendar arithmetic (y*12+m differencing), so every cell
    hash-grades. Plan: one grouped pass assigns each user's cohort
    month (min ts), joined back over the purchase stream, one (cohort,
    month) aggregate; the events scan prunes to purchases before the
    join. The per-user cohort dimension is UNBOUNDED (grows with
    |users|), so the join carries no forced broadcast hint — AQE
    promotes it to a broadcast join when the built side fits (it does
    at bench SFs) and falls back to shuffle join at 100 TB instead of
    OOMing the driver."""
    ev = load_table(spark, sf_dir, "events")
    fu = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cm")
    )
    r = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("month", "ts").alias("em"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    j = r.join(fu, "user_id")
    age = (
        F.year("em") * 12 + F.month("em") - (F.year("cm") * 12 + F.month("cm"))
    ).cast("long")
    return j.groupBy("cm", "em").agg(
        F.count_distinct("user_id").alias("n_buyers"),
        F.sum("cents").alias("revenue_cents"),
    ).select(
        F.date_format("cm", "yyyy-MM").alias("cohort_month"),
        age.alias("month_age"),
        "n_buyers",
        "revenue_cents",
    )


@query(
    "ev_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS t_id, user_id, epoch_us(ts) AS t_us,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT p.p_id, p.cents, t.t_id, t.t_us, t.channel
      FROM p LEFT JOIN t
        ON p.user_id = t.user_id
       AND t.t_us <= p.p_us
       AND t.t_us > p.p_us - 604800000000
    ),
    r AS (
      SELECT p_id, cents, channel,
             count(t_id) OVER (PARTITION BY p_id) AS n,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY t_us, channel, t_id) AS rk
      FROM j
    ),
    credited AS (
      SELECT coalesce(channel, 'direct') AS channel,
             CASE WHEN n = 0 THEN cents * 1000000
                  ELSE (cents * 1000000) // n
                       + CASE WHEN rk = 1
                              THEN cents * 1000000 - ((cents * 1000000) // n) * n
                              ELSE 0 END
             END AS micro
      FROM r
    )
    SELECT channel,
           count(*)::BIGINT AS n_credits,
           sum(micro)::BIGINT AS attributed_microcents
    FROM credited
    GROUP BY channel
    """,
)
def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution, linear model — the marketing-warehouse
    staple the streaming interval join (st_attribution_join) only
    half-covers: every purchase's revenue splits EQUALLY across the
    user's view/click touchpoints in the trailing 7 days; purchases
    with no touchpoint credit the 'direct' channel. The split is exact
    INTEGER micro-cents (cents*1e6 div n, remainder to the EARLIEST
    touch, ties broken (t_us, channel, event_id)) so per-channel totals
    hash-grade and the credited sum reconstructs total purchase revenue
    bit-for-bit (pinned in tests/test_properties.py).

    Plan: both event subsets prune at the scan, ONE user_id equi-join
    with the 7-day bound as a residual range predicate (the interval
    join carries (purchase, touch) id pairs, never props), per-purchase
    window for the touch count + earliest rank, one channel aggregate.
    At 100 TB the join shuffles the two pruned subsets on user_id once;
    window state is bounded by one user's 7-day touch fan-in."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (t["t_us"] <= p["p_us"])
        & (t["t_us"] > p["p_us"] - 604_800_000_000),
        "left",
    ).select("p_id", "cents", "t_id", "t_us", "channel")
    wp = Window.partitionBy("p_id")
    rk_w = Window.partitionBy("p_id").orderBy("t_us", "channel", "t_id")
    r = j.select(
        "cents",
        "channel",
        F.count("t_id").over(wp).alias("n"),
        F.row_number().over(rk_w).alias("rk"),
    )
    micro = F.col("cents") * F.lit(1_000_000)
    share = F.expr("(cents * 1000000) div n")
    credit = F.when(F.col("n") == 0, micro).otherwise(
        share
        + F.when(F.col("rk") == 1, micro - share * F.col("n")).otherwise(
            F.lit(0)
        )
    )
    return (
        r.select(
            F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
            credit.alias("micro"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("micro").alias("attributed_microcents"),
        )
    )


def _survival_oracle(unit_us: int, silent_units: int) -> str:
    """Parametric SQL for the K-M life table — shared by ev_survival
    (weekly, 4-week silence = the conservative churn rule) and
    ev_survival_daily (daily, 1-day silence — the high-frequency
    variant whose oracle rows actually contain churners at the graded
    scale, ADVICE r9)."""
    return f"""
    WITH u AS (
      SELECT user_id,
             epoch_us(min(ts)) AS first_us,
             epoch_us(max(ts)) AS last_us
      FROM events GROUP BY user_id
    ),
    mx AS (SELECT max(epoch_us(ts)) AS corpus_us FROM events),
    lab AS (
      SELECT (last_us - first_us) // {unit_us} AS tenure_w,
             (corpus_us - first_us) // {unit_us} AS observable_w,
             CASE WHEN (corpus_us - first_us) // {unit_us}
                       > (last_us - first_us) // {unit_us} + {silent_units}
                  THEN 1 ELSE 0 END AS churned
      FROM u, mx
    ),
    exits AS (
      SELECT CASE WHEN churned = 1 THEN tenure_w ELSE observable_w END
               AS exit_w,
             churned
      FROM lab
    ),
    weeks AS (
      SELECT exit_w AS week,
             sum(churned)::BIGINT AS n_churned,
             sum(1 - churned)::BIGINT AS n_censored
      FROM exits GROUP BY exit_w
    ),
    at_risk AS (
      SELECT week, n_churned, n_censored,
             (sum(n_churned + n_censored)
                OVER (ORDER BY week DESC ROWS UNBOUNDED PRECEDING))::BIGINT
               AS n_at_risk
      FROM weeks
    )
    SELECT week, n_at_risk, n_churned, n_censored,
           (2 * n_churned * 1000000 + n_at_risk) // (2 * n_at_risk)
             AS hazard_micro
    FROM at_risk
    """


@query("ev_survival", oracle=_survival_oracle(604_800_000_000, 4))
def ev_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style survival table over user lifetimes — the
    churn-analytics staple ev_retention's cohort matrix doesn't give:
    per tenure WEEK, the at-risk count, the churn events, and the
    right-censored exits, with the discrete hazard d_w/n_w in integer
    half-up micro-units. Churn definition: a user whose observation
    horizon extends >= 4 weeks past their last event churned at their
    last-event week; everyone else is CENSORED at their horizon (the
    corpus simply ends — treating them as churned is the classic
    survival-analysis mistake this operator exists to avoid).

    Every quantity is exact: integer week arithmetic on epoch-micros,
    at-risk as a DESCENDING cumulative sum over the per-week exit
    census (the window runs over |weeks| rows — a bounded carrier, the
    ev_concurrency doctrine, registered in tools_window_audit.py), and
    the hazard via the cross-engine integer half-up formula. Plan: one
    user aggregate (the only events-sized shuffle), scalar corpus-max
    broadcast, a |weeks|-row census + window."""
    return _survival_table(spark, sf_dir, 604_800_000_000, 4)


@query("ev_survival_daily", oracle=_survival_oracle(86_400_000_000, 1))
def ev_survival_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAILY life table with a 1-day inactivity churn proxy — the
    high-frequency-product variant of ev_survival (DAU churn, where
    weekly granularity over a ~30-day corpus degenerates to a single
    all-censored row). ADVICE r9 flagged that degeneracy: ev_survival's
    driver row never exercised the hazard formula or the KM at-risk
    recurrence. This sibling's oracle rows DO contain churners at the
    graded scales (3 churners over 2 exit days at sf0.01, 39 at
    sf0.1), so the churn branch, the censoring split, and the
    multi-row suffix-sum recurrence are all driver-hash-graded — the
    engineered-fixture pytest (test_survival_table_with_real_churners)
    remains the deep-structure check. Same parametric body and SQL
    text as ev_survival; only (unit, silence threshold) differ."""
    return _survival_table(spark, sf_dir, 86_400_000_000, 1)


def _survival_table(
    spark: SparkSession, sf_dir: str, unit_us: int, silent_units: int
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )
    mx = ev.agg(F.unix_micros(F.max("ts")).alias("corpus_us"))
    wk = unit_us
    lab = u.crossJoin(F.broadcast(mx)).select(
        F.expr(f"(last_us - first_us) div {wk}").alias("tenure_w"),
        F.expr(f"(corpus_us - first_us) div {wk}").alias("observable_w"),
    ).select(
        "tenure_w",
        "observable_w",
        (F.col("observable_w") > F.col("tenure_w") + silent_units)
        .cast("long")
        .alias("churned"),
    )
    exits = lab.select(
        F.when(F.col("churned") == 1, F.col("tenure_w"))
        .otherwise(F.col("observable_w"))
        .alias("exit_w"),
        "churned",
    )
    weeks = exits.groupBy(F.col("exit_w").alias("week")).agg(
        F.sum("churned").alias("n_churned"),
        F.sum(F.lit(1) - F.col("churned")).alias("n_censored"),
    )
    # at-risk = suffix sum over the bounded per-week census
    desc_w = Window.orderBy(F.col("week").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = weeks.withColumn(
        "n_at_risk",
        F.sum(F.col("n_churned") + F.col("n_censored")).over(desc_w),
    )
    return at_risk.select(
        "week",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.expr(
            "(2 * n_churned * 1000000 + n_at_risk) div (2 * n_at_risk)"
        ).alias("hazard_micro"),
    )


def _rhalf(n: int, d: int) -> int:
    """Half-away-from-zero integer rounding of n/d — the ONE Python
    mirror of the SQL CASE template every forecast oracle embeds."""
    return (2 * abs(n) + d) // (2 * d) * (1 if n >= 0 else -1)


def _holt_step(y_milli: int, level: int, trend: int) -> tuple[int, int]:
    """One Holt update (alpha=1/4, beta=1/8, integer milli-cents).
    Shared by holt_from_daily and ev_forecast_backtest so the
    recurrence is defined exactly once."""
    l_new = _rhalf(y_milli + 3 * (level + trend), 4)
    b_new = _rhalf((l_new - level) + 7 * trend, 8)
    return l_new, b_new


def _hw_step(
    y_milli: int, level: int, trend: int, s_lag: int
) -> tuple[int, int, int]:
    """One Holt-Winters additive update (alpha=1/4, beta=1/8,
    gamma=1/4). Shared by ev_forecast_hw and ev_forecast_backtest."""
    l_new = _rhalf((y_milli - s_lag) + 3 * (level + trend), 4)
    b_new = _rhalf((l_new - level) + 7 * trend, 8)
    s_new = _rhalf((y_milli - l_new) + 3 * s_lag, 4)
    return l_new, b_new, s_new


def _hw_init(y: list[int]) -> tuple[int, int, list[int]]:
    """Detrended Holt-Winters init from the first 14 days (see
    ev_forecast_hw's docstring): returns (level at t=6, trend,
    seasonal slots for t=0..6). One definition for the query and the
    backtest."""
    l_mid = _rhalf(sum(y[0:7]) * 1000, 7)
    trend = _rhalf((sum(y[7:14]) - sum(y[0:7])) * 1000, 49)
    level = l_mid + 3 * trend
    sea = [y[i] * 1000 - l_mid - trend * (i - 3) for i in range(7)]
    return level, trend, sea


def daily_cents_census(ev: DataFrame) -> DataFrame:
    """The (day, y=exact-cents) daily census every forecast/changepoint
    form aggregates to — ONE definition so the batch queries and their
    streaming twins stay bit-identical (the twin-grading contract
    depends on the census text never forking)."""
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))


def _holt_oracle() -> str:
    """Holt linear-trend recurrence as a RECURSIVE CTE — the first
    oracle in the repo that replays a sequential recurrence natively
    in SQL rather than unrolling it (the Lloyd oracles unroll because
    their iteration count is tiny; Holt runs once per observed day).
    Exactness: daily totals are exact integer cents; level/trend live
    in integer MILLI-cents with dyadic smoothing (alpha=1/4, beta=1/8)
    and explicit HALF-AWAY-FROM-ZERO rounding at every step — both
    engines truncate integer division toward zero, so
    sign(n)*((2|n|+d) div 2d) is bit-identical, and no denominator
    ever compounds (the unrounded dyadic recurrence would overflow
    BIGINT by day 30)."""

    def rhalf(n: str, d: int) -> str:
        return (
            f"(CASE WHEN ({n}) >= 0 THEN (2 * ({n}) + {d}) // {2 * d} "
            f"ELSE -((2 * (-({n})) + {d}) // {2 * d}) END)::BIGINT"
        )

    new_l = rhalf("y1000 + 3 * (l_prev + b_prev)", 4)
    new_b = rhalf("(l_new - l_prev) + 7 * b_prev", 8)
    return f"""
    WITH RECURSIVE d AS (
      SELECT date_trunc('day', ts)::DATE AS day,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT (row_number() OVER (ORDER BY day)) - 1 AS t, day, y FROM d
    ),
    h(t, l, b) AS (
      SELECT 0::BIGINT,
             (SELECT y * 1000 FROM s WHERE t = 0),
             ((SELECT y FROM s WHERE t = 1)
              - (SELECT y FROM s WHERE t = 0)) * 1000
      UNION ALL
      SELECT t, l_new, {new_b} FROM (
        SELECT s.t AS t,
               {new_l.replace('y1000', 's.y * 1000')
                     .replace('l_prev', 'h.l')
                     .replace('b_prev', 'h.b')} AS l_new,
               h.l AS l_prev, h.b AS b_prev
        FROM h JOIN s ON s.t = h.t + 1
      )
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           s.y AS cents,
           h.l AS level_milli,
           h.b AS trend_milli,
           (h.l + h.b)::BIGINT AS forecast_milli
    FROM h JOIN s USING (t)
    """


@query("ev_forecast_holt", oracle=_holt_oracle())
def ev_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) over
    daily revenue — the forecasting pass ev_ewma's single smoother
    can't do (EWMA lags a trending series; Holt's trend term doesn't),
    and the next-day forecast l_t + b_t is the anomaly baseline /
    capacity-planning staple. alpha=1/4, beta=1/8 (dyadic), state in
    integer milli-cents with half-away-from-zero rounding per step —
    the recurrence is exact on both engines, and the oracle replays it
    with a RECURSIVE CTE (first truly sequential oracle in the repo).

    Scale shape: ONE day aggregate touches the events table (the only
    corpus-sized work); the recurrence runs on the driver over the
    bounded |days| rows — time is bounded, corpora are not; this is
    the MMR/BPE bounded-driver-state precedent. Init: l_0 = y_0,
    b_0 = y_1 - y_0 (standard Holt initialization)."""
    ev = load_table(spark, sf_dir, "events")
    return holt_from_daily(daily_cents_census(ev))


def holt_from_daily(daily: DataFrame) -> DataFrame:
    """Bounded Holt recurrence over a (day, y) daily census: collect
    the <=|days| rows, replay the integer milli-cent recurrence on the
    driver. Shared by ev_forecast_holt (census from one batch
    aggregate) and st_forecast_holt (census drained from the streaming
    state store); both grade against _holt_oracle()."""
    spark = daily.sparkSession
    rows = sorted(daily.collect(), key=lambda r: r["day"])
    schema = (
        "day string, cents long, level_milli long, trend_milli long, "
        "forecast_milli long"
    )
    # Mirror the oracle on degenerate inputs (the ADVICE r10 doctrine):
    # 0 days -> empty; 1 day -> the recursive CTE's base case joins to
    # t=0 and emits one row with NULL trend (y at t=1 is missing) and
    # hence NULL forecast.
    if not rows:
        return spark.createDataFrame([], schema)
    if len(rows) == 1:
        r = rows[0]
        return spark.createDataFrame(
            [
                (
                    r["day"].strftime("%Y-%m-%d"),
                    int(r["y"]),
                    int(r["y"]) * 1000,
                    None,
                    None,
                )
            ],
            schema,
        )

    out = []
    level = rows[0]["y"] * 1000
    trend = (rows[1]["y"] - rows[0]["y"]) * 1000
    for t, r in enumerate(rows):
        if t > 0:
            level, trend = _holt_step(r["y"] * 1000, level, trend)
        out.append(
            (
                r["day"].strftime("%Y-%m-%d"),
                int(r["y"]),
                int(level),
                int(trend),
                int(level + trend),
            )
        )
    return spark.createDataFrame(out, schema)


def _hw_oracle() -> str:
    """Holt-Winters additive seasonal recurrence (m=7) as a RECURSIVE
    CTE extending the ev_forecast_holt doctrine: level + trend as
    before, plus the 7-slot seasonal state carried through the
    recursion as a rotating BIGINT list (sea[1] = s_{t-6} .. sea[7] =
    s_t). State in integer MILLI-cents, dyadic smoothing (alpha=1/4,
    beta=1/8, gamma=1/4) with explicit half-away-from-zero rounding at
    every step, so both engines produce bit-identical integers. Init
    is the detrended textbook one: b = (mean week 2 - mean week 1)/7
    (folded into one /49 rounding), l = mean(week 1) + 3b (midpoint
    level shifted to t=6), s_i = y_i - mean(week 1) - b*(i-3)."""

    def rhalf(n: str, d: int) -> str:
        return (
            f"(CASE WHEN ({n}) >= 0 THEN (2 * ({n}) + {d}) // {2 * d} "
            f"ELSE -((2 * (-({n})) + {d}) // {2 * d}) END)::BIGINT"
        )

    lm = rhalf("(SELECT sum(y) FROM s WHERE t <= 6) * 1000", 7)
    b0 = rhalf(
        "((SELECT sum(y) FROM s WHERE t BETWEEN 7 AND 13)"
        " - (SELECT sum(y) FROM s WHERE t <= 6)) * 1000",
        49,
    )
    # the inner projection computes l_new FROM RAW h/s columns (a
    # same-clause alias like y1000 can't be referenced before it is
    # defined); the outer projection then derives b_new / s_new from
    # the inner aliases
    l_new_inner = rhalf(
        "(s.y * 1000 - h.sea[1]) + 3 * (h.l + h.b)", 4
    )
    b_new = rhalf("(l_new - l_prev) + 7 * b_prev", 8)
    s_new = rhalf("(y1000 - l_new) + 3 * s_lag", 4)
    return f"""
    WITH RECURSIVE d AS (
      SELECT date_trunc('day', ts)::DATE AS day,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT (row_number() OVER (ORDER BY day)) - 1 AS t, day, y FROM d
    ),
    init AS (SELECT {lm} AS lm, {b0} AS b0),
    h(t, l, b, sea, fc) AS (
      SELECT 6::BIGINT, i.lm + 3 * i.b0, i.b0,
             (SELECT list(y * 1000 - i.lm - i.b0 * (t - 3) ORDER BY t)
              FROM s WHERE t <= 6),
             NULL::BIGINT
      FROM init i
      UNION ALL
      SELECT t, l_new, {b_new},
             list_append(sea_tail, {s_new}), fc
      FROM (
        SELECT s.t AS t, {l_new_inner} AS l_new,
               h.l AS l_prev, h.b AS b_prev, h.sea[1] AS s_lag,
               h.sea[2:7] AS sea_tail, s.y * 1000 AS y1000,
               (h.l + h.b + h.sea[1])::BIGINT AS fc
        FROM h JOIN s ON s.t = h.t + 1
      )
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           s.y AS cents,
           h.l AS level_milli,
           h.b AS trend_milli,
           h.sea[7] AS season_milli,
           h.fc AS forecast_milli
    FROM h JOIN s USING (t) WHERE h.t >= 7
    """


@query("ev_forecast_hw", oracle=_hw_oracle())
def ev_forecast_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE SEASONAL smoothing (level + trend +
    weekly seasonality, m=7) over daily revenue — the forecaster for
    the series ev_forecast_holt's trend-only model systematically
    misses: traffic and revenue have day-of-week shape, and a Holt
    forecast of a Sunday from six weekdays is biased by exactly the
    seasonal term this model carries. forecast_milli for day t is the
    one-step-ahead forecast MADE AT t-1 (l + b + s_{t-7} before
    observing y_t), so the column is a true out-of-sample baseline for
    anomaly gating, unlike in-sample smoothed fits.

    State in integer milli-cents with dyadic smoothing (alpha=1/4,
    beta=1/8, gamma=1/4) and half-away-from-zero rounding per step —
    exact on both engines; the oracle replays the full recurrence with
    a recursive CTE whose seasonal state rides along as a rotating
    7-slot BIGINT list (first list-valued recursion state in the
    repo). Init: b = (mean week 2 - mean week 1)/7 folded into one
    /49 rounding, l = mean(week 1) + 3b (midpoint level shifted to
    the end of week 1), s_i = y_i - mean(week 1) - b*(i-3) —
    DETRENDED seasonal indices, which make the recurrence reproduce a
    pure linear+seasonal series exactly (pinned in tests); output
    starts at t=7 where the first real forecast exists.

    Scale shape (the Holt/MMR/BPE bounded-driver-state doctrine): ONE
    day aggregate touches the events table — the only corpus-sized
    work; the recurrence runs on the driver over the bounded |days|
    rows. Time is bounded, corpora are not."""
    ev = load_table(spark, sf_dir, "events")
    rows = sorted(
        daily_cents_census(ev).collect(), key=lambda r: r["day"]
    )  # bounded: one row per observed day
    # Mirror the oracle EXACTLY on degenerate inputs (ADVICE r10): the
    # oracle emits no rows below 8 observed days (the first forecast is
    # t=7), and for 8-13 days its week-2 trend sum (t BETWEEN 7 AND 13)
    # is a PARTIAL sum — which is precisely what _hw_init's y[7:14]
    # slice computes on a short list. So: empty frame below 8 days,
    # partial-init recurrence for 8-13, full init from 14 up.
    if len(rows) <= 7:
        return spark.createDataFrame(
            [],
            "day string, cents long, level_milli long, trend_milli long, "
            "season_milli long, forecast_milli long",
        )

    y = [int(r["y"]) for r in rows]
    # detrended init — see _hw_init (one definition with the backtest);
    # the week-mean form leaves a b*(i-3) trend residue in every
    # seasonal slot and breaks the exact linear+seasonal tracking
    # property pinned in tests/test_scale.py
    level, trend, sea = _hw_init(y)
    out = []
    for t in range(7, len(rows)):
        s_lag = sea[t - 7]
        fcast = level + trend + s_lag
        level, trend, s_new = _hw_step(y[t] * 1000, level, trend, s_lag)
        sea.append(s_new)
        out.append(
            (
                rows[t]["day"].strftime("%Y-%m-%d"),
                y[t],
                int(level),
                int(trend),
                int(sea[t]),
                int(fcast),
            )
        )
    return spark.createDataFrame(
        out,
        "day string, cents long, level_milli long, trend_milli long, "
        "season_milli long, forecast_milli long",
    )


# Shared by ev_changepoint (batch) and st_changepoint (streaming twin
# in queries/streaming.py) — identical SQL text, the st_drift_ks
# doctrine.
CUSUM_ORACLE = """
    WITH d AS (
      SELECT date_trunc('day', ts)::DATE AS day,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
      FROM events GROUP BY 1
    ),
    tot AS (SELECT count(*)::BIGINT AS nd, sum(y)::BIGINT AS s FROM d),
    c AS (
      SELECT day, y,
             row_number() OVER (ORDER BY day) AS rn,
             sum(y) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             nd, s
      FROM d, tot
    ),
    k AS (SELECT day, y, (nd * cum - rn * s)::BIGINT AS cusum_xd FROM c)
    SELECT strftime(day, '%Y-%m-%d') AS day, y AS cents, cusum_xd,
           (abs(cusum_xd) = max(abs(cusum_xd)) OVER ()) AS is_peak
    FROM k
    """


def cusum_from_daily(d: DataFrame) -> DataFrame:
    """Bounded CUSUM projection over a (day, y) daily census: xD-scaled
    cumulative deviation + argmax peak flag, exact BIGINTs. Shared by
    ev_changepoint (census from one batch aggregate) and st_changepoint
    (census drained from the streaming state store); both grade
    against CUSUM_ORACLE. Runs entirely over the bounded |days| rows."""
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("y").alias("s"),
    )
    w = Window.orderBy("day")
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.crossJoin(F.broadcast(tot)).select(
        "day",
        "y",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("y").over(cum).alias("cum"),
        "nd",
        "s",
    )
    k = c.select(
        "day",
        "y",
        (F.col("nd") * F.col("cum") - F.col("rn") * F.col("s"))
        .cast("long")
        .alias("cusum_xd"),
    )
    wall = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return k.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("y").alias("cents"),
        "cusum_xd",
        (
            F.abs(F.col("cusum_xd"))
            == F.max(F.abs(F.col("cusum_xd"))).over(wall)
        ).alias("is_peak"),
    )


@query("ev_changepoint", oracle=CUSUM_ORACLE)
def ev_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over daily revenue: the classic
    single-changepoint estimator argmax_t |sum_{i<=t}(y_i - mean)| —
    the day the series' level most plausibly shifted (Page/Pettitt
    shape). The dashboard question behind it: "did the metric break,
    and WHEN?" — ev_anomaly_zscore flags outlier points; this locates
    a sustained level shift.

    Exactness without a single division: the CUSUM is scaled by the
    day count D — cusum_xd_t = D*cum_t - t*S (S = total cents) — so
    every value is an exact BIGINT on both engines, sign and argmax
    identical to the mean-subtracted float form. is_peak marks the
    argmax rows (ties flag all, deterministically).

    Scale shape: one day aggregate touches the corpus; the cumulative
    and global-max windows run over the bounded |days| census
    (registered bounded exception, ev_survival precedent). The D/S
    scalars ride a broadcast crossJoin of a 1-row aggregate — the
    scalar-subquery decorrelation pattern."""
    ev = load_table(spark, sf_dir, "events")
    return cusum_from_daily(daily_cents_census(ev))


_AB_Z_SQL = (
    "(c1 * 1.0 / n1 - c2 * 1.0 / n2)"
    " / sqrt(((c1 + c2) * 1.0 / (n1 + n2))"
    "        * (1.0 - (c1 + c2) * 1.0 / (n1 + n2))"
    "        * (1.0 / n1 + 1.0 / n2))"
)

_AB_Z_GUARD = "n1 > 0 AND n2 > 0 AND c1 + c2 > 0 AND c1 + c2 < n1 + n2"


@query(
    "ev_ab_sequential",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 2))
                       ::INTEGER < 128
                  THEN 'A' ELSE 'B' END AS variant,
             min(date_trunc('day', ts)::DATE) AS enter_day,
             min(CASE WHEN event_type = 'purchase' AND value >= 100
                      THEN date_trunc('day', ts)::DATE END) AS conv_day
      FROM events GROUP BY user_id
    ),
    days AS (SELECT DISTINCT date_trunc('day', ts)::DATE AS day FROM events),
    spine AS (
      SELECT day, v.variant
      FROM days, (SELECT 'A' AS variant UNION ALL SELECT 'B') v
    ),
    e AS (
      SELECT variant, enter_day AS day, count(*)::BIGINT AS n
      FROM u GROUP BY 1, 2
    ),
    c AS (
      SELECT variant, conv_day AS day, count(*)::BIGINT AS n
      FROM u WHERE conv_day IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT s.day, s.variant,
             sum(coalesce(e.n, 0)) OVER (PARTITION BY s.variant
                                         ORDER BY s.day)::BIGINT AS n_cum,
             sum(coalesce(c.n, 0)) OVER (PARTITION BY s.variant
                                         ORDER BY s.day)::BIGINT AS c_cum
      FROM spine s
      LEFT JOIN e ON e.variant = s.variant AND e.day = s.day
      LEFT JOIN c ON c.variant = s.variant AND c.day = s.day
    ),
    p AS (
      SELECT day,
             max(CASE WHEN variant = 'A' THEN n_cum END)::BIGINT AS n1,
             max(CASE WHEN variant = 'A' THEN c_cum END)::BIGINT AS c1,
             max(CASE WHEN variant = 'B' THEN n_cum END)::BIGINT AS n2,
             max(CASE WHEN variant = 'B' THEN c_cum END)::BIGINT AS c2
      FROM cum GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n1, c1, n2, c2,
           CASE WHEN {_AB_Z_GUARD} THEN round({_AB_Z_SQL}, 6) END AS z,
           CASE WHEN {_AB_Z_GUARD} THEN abs({_AB_Z_SQL}) >= 1.96 END
             AS crossed_naive
    FROM p
    """,
)
def ev_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL experiment monitoring curve — the per-day prefix
    z-statistic ev_ab_test's single verdict collapses: for every
    calendar day, users entered (first event) and converted (first
    qualifying purchase) BY that day per variant, the pooled
    two-proportion z over the cumulative counts, and the naive
    |z| >= 1.96 crossing flag. On untreated (A/A) data this is the
    peeking-inflation audit: counting crossed_naive days measures
    exactly the alpha inflation that makes fixed-threshold peeking
    invalid, and the honest deployed monitor replaces 1.96 with a
    sequential boundary (alpha-spending) over THIS SAME curve — the
    curve, not the boundary constant, is the operator.

    Exactness: per-user (variant, enter_day, conv_day) comes from ONE
    user_id aggregate (the only corpus-sized work); everything after
    runs over the bounded |days| x 2 census — prefix sums are exact
    BIGINTs, z derives from identical expression text on identical
    integers (the ev_ab_test doctrine), and the crossing flag compares
    the UNROUNDED z on both engines. Degenerate prefixes (a variant
    not yet entered, pooled rate 0 or 1) emit NULL z/flag under the
    same guard in both engines rather than inf/NaN."""
    from mie_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    u = ev.groupBy("user_id").agg(
        F.min(day).alias("enter_day"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 100),
                day,
            )
        ).alias("conv_day"),
    )
    # The user census is consumed TWICE (enter census + conversion
    # census) and Catalyst does not reuse the aggregate across the two
    # consumers — without this the corpus is scanned twice (r11
    # PLANS.md audit, same class as pipe_tokenizer_drift's). O(|users|)
    # rows, distributed materialization only.
    u = u.select(
        F.when(hash_bucket(F.col("user_id")) < 128, "A")
        .otherwise("B")
        .alias("variant"),
        "enter_day",
        "conv_day",
    ).localCheckpoint()
    enters = u.groupBy("variant", F.col("enter_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    convs = (
        u.filter(F.col("conv_day").isNotNull())
        .groupBy("variant", F.col("conv_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark_ = u.sparkSession
    variants = spark_.createDataFrame([("A",), ("B",)], "variant string")
    spine = (
        ev.select(day.alias("day")).distinct().crossJoin(F.broadcast(variants))
    )
    joined = (
        spine.join(enters.withColumnRenamed("n", "ne"), ["variant", "day"], "left")
        .join(convs.withColumnRenamed("n", "nc"), ["variant", "day"], "left")
    )
    w = (
        Window.partitionBy("variant")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(
        "day",
        "variant",
        F.sum(F.coalesce(F.col("ne"), F.lit(0))).over(w).alias("n_cum"),
        F.sum(F.coalesce(F.col("nc"), F.lit(0))).over(w).alias("c_cum"),
    )
    p = cum.groupBy("day").agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_cum"))).alias("n1"),
        F.max(F.when(F.col("variant") == "A", F.col("c_cum"))).alias("c1"),
        F.max(F.when(F.col("variant") == "B", F.col("n_cum"))).alias("n2"),
        F.max(F.when(F.col("variant") == "B", F.col("c_cum"))).alias("c2"),
    )
    p1 = F.col("c1") * F.lit(1.0) / F.col("n1")
    p2 = F.col("c2") * F.lit(1.0) / F.col("n2")
    pp = (F.col("c1") + F.col("c2")) * F.lit(1.0) / (
        F.col("n1") + F.col("n2")
    )
    z = (p1 - p2) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    guard = (
        (F.col("n1") > 0)
        & (F.col("n2") > 0)
        & (F.col("c1") + F.col("c2") > 0)
        & (F.col("c1") + F.col("c2") < F.col("n1") + F.col("n2"))
    )
    return p.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n1",
        "c1",
        "n2",
        "c2",
        F.when(guard, F.round(z, 6)).alias("z"),
        F.when(guard, F.abs(z) >= F.lit(1.96)).alias("crossed_naive"),
    )


@query(
    "ev_ab_boundary",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 2))
                       ::INTEGER < 128
                  THEN 'A' ELSE 'B' END AS variant,
             min(date_trunc('day', ts)::DATE) AS enter_day,
             min(CASE WHEN event_type = 'purchase' AND value >= 100
                      THEN date_trunc('day', ts)::DATE END) AS conv_day
      FROM events GROUP BY user_id
    ),
    days AS (SELECT DISTINCT date_trunc('day', ts)::DATE AS day FROM events),
    spine AS (
      SELECT day, v.variant
      FROM days, (SELECT 'A' AS variant UNION ALL SELECT 'B') v
    ),
    e AS (
      SELECT variant, enter_day AS day, count(*)::BIGINT AS n
      FROM u GROUP BY 1, 2
    ),
    c AS (
      SELECT variant, conv_day AS day, count(*)::BIGINT AS n
      FROM u WHERE conv_day IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT s.day, s.variant,
             sum(coalesce(e.n, 0)) OVER (PARTITION BY s.variant
                                         ORDER BY s.day)::BIGINT AS n_cum,
             sum(coalesce(c.n, 0)) OVER (PARTITION BY s.variant
                                         ORDER BY s.day)::BIGINT AS c_cum
      FROM spine s
      LEFT JOIN e ON e.variant = s.variant AND e.day = s.day
      LEFT JOIN c ON c.variant = s.variant AND c.day = s.day
    ),
    p AS (
      SELECT day,
             max(CASE WHEN variant = 'A' THEN n_cum END)::BIGINT AS n1,
             max(CASE WHEN variant = 'A' THEN c_cum END)::BIGINT AS c1,
             max(CASE WHEN variant = 'B' THEN n_cum END)::BIGINT AS n2,
             max(CASE WHEN variant = 'B' THEN c_cum END)::BIGINT AS c2
      FROM cum GROUP BY day
    ),
    tot AS (SELECT max(n1 + n2)::BIGINT AS bign FROM p),
    d AS (
      SELECT day, n1, c1, n2, c2, bign,
             ((2 * (n1 + n2) * 1000000 + bign) // (2 * bign))::BIGINT
               AS info_ppm,
             CASE WHEN {_AB_Z_GUARD} THEN
               625::HUGEINT
                 * ((c1 * n2 - c2 * n1)::HUGEINT
                    * (c1 * n2 - c2 * n1)::HUGEINT)
               >=
               (2401::HUGEINT * bign::HUGEINT * n1::HUGEINT * n2::HUGEINT
                  * (c1 + c2)::HUGEINT
                  * ((n1 + n2) - (c1 + c2))::HUGEINT)
                 // ((n1 + n2)::HUGEINT * (n1 + n2)::HUGEINT)
               + CASE WHEN
                   (2401::HUGEINT * bign::HUGEINT * n1::HUGEINT
                      * n2::HUGEINT * (c1 + c2)::HUGEINT
                      * ((n1 + n2) - (c1 + c2))::HUGEINT)
                     % ((n1 + n2)::HUGEINT * (n1 + n2)::HUGEINT) > 0
                 THEN 1 ELSE 0 END
             END AS crossed_obf
      FROM p, tot
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n1, c1, n2, c2,
           info_ppm, crossed_obf,
           CASE WHEN crossed_obf
                THEN day = min(CASE WHEN crossed_obf THEN day END) OVER ()
                ELSE crossed_obf END AS first_crossing
    FROM d
    """,
)
def ev_ab_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sequential boundary ev_ab_sequential promises: an
    O'Brien-Fleming-style monitoring rule b(t) = 1.96 / sqrt(t) over
    the SAME per-day prefix census (t = information fraction =
    cumulative enrollment / final enrollment) — very conservative at
    early peeks, relaxing to the fixed-horizon 1.96 at full
    information, the alpha-spending family's canonical shape. This is
    the honest deployed monitor whose absence VERDICT r11 item #6
    flagged: crossed_obf is the day-by-day stop decision, and
    first_crossing marks the earliest stopping day (the output a
    launch dashboard acts on).

    EXACT decisions on cross-multiplied integers (no float z, no
    sqrt): |z| >= 1.96/sqrt(t)  <=>  z^2 * t >= 1.96^2, and with
    z^2 = num^2 * ns / (n1 n2 cs (ns-cs)) for num = c1*n2 - c2*n1,
    ns = n1+n2, cs = c1+c2, t = ns/N, the rule cross-multiplies to
        625 * num^2 * ns^2  >=  B := 2401 * N * n1 * n2 * cs * (ns-cs)
    (1.96 = 49/25, squared = 2401/625). Evaluated in the divided-out
    form (ADVICE r12 — the raw cross-product capped headroom at
    ns ~ 1.1e6: worst-case LHS 625*(ns^2/4)^2*ns^2 crosses 10^38):
        625 * num^2  >=  ceil(B / ns^2)
                      =  B div ns^2 + (1 if B mod ns^2 > 0 else 0)
    — exactly equivalent for integer LHS, every operand a non-negative
    integer, computed in decimal(38,0) on the Spark side (div/mod via
    the remainder-subtracted exact decimal division, the int_div
    doctrine; the quotient <= 2401*N*ns^2/16 < 10^32 stays exact in
    the decimal(38,6) division result) and HUGEINT in DuckDB. Width
    bound is now B < 10^38: with n1*n2 <= ns^2/4 and cs*(ns-cs) <=
    ns^2/4, B <= 2401*N^5/16 — holds through N ~ 1.4e7 users, a
    decade above the old form (equivalence + the bound pinned by
    tests/test_properties.py::test_obf_integer_rule_matches_float_boundary);
    a larger deployment re-scales the census first.
    Degenerate prefixes (a variant not yet entered, pooled rate 0 or
    1) take the SAME NULL guard as ev_ab_sequential. info_ppm is the
    half-up integer information fraction.

    Deliberately self-contained rather than sharing the census
    builder with ev_ab_sequential: its graded path stays byte-stable
    this round (the r5 window doctrine); fold the two once both carry
    fresh driver rows.

    Plan shape: identical to ev_ab_sequential — ONE corpus-sized
    user_id aggregate (localCheckpoint-ed against double scan), then
    bounded |days| x 2 work; N rides a broadcast 1-row aggregate; the
    first-crossing window runs over the <= |days| census (registered
    bounded exception)."""
    from mie_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    u = ev.groupBy("user_id").agg(
        F.min(day).alias("enter_day"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 100),
                day,
            )
        ).alias("conv_day"),
    )
    u = u.select(
        F.when(hash_bucket(F.col("user_id")) < 128, "A")
        .otherwise("B")
        .alias("variant"),
        "enter_day",
        "conv_day",
    ).localCheckpoint()
    enters = u.groupBy("variant", F.col("enter_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    convs = (
        u.filter(F.col("conv_day").isNotNull())
        .groupBy("variant", F.col("conv_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark_ = u.sparkSession
    variants = spark_.createDataFrame([("A",), ("B",)], "variant string")
    spine = (
        ev.select(day.alias("day")).distinct().crossJoin(F.broadcast(variants))
    )
    joined = (
        spine.join(enters.withColumnRenamed("n", "ne"), ["variant", "day"], "left")
        .join(convs.withColumnRenamed("n", "nc"), ["variant", "day"], "left")
    )
    w = (
        Window.partitionBy("variant")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(
        "day",
        "variant",
        F.sum(F.coalesce(F.col("ne"), F.lit(0))).over(w).alias("n_cum"),
        F.sum(F.coalesce(F.col("nc"), F.lit(0))).over(w).alias("c_cum"),
    )
    p = cum.groupBy("day").agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_cum"))).alias("n1"),
        F.max(F.when(F.col("variant") == "A", F.col("c_cum"))).alias("c1"),
        F.max(F.when(F.col("variant") == "B", F.col("n_cum"))).alias("n2"),
        F.max(F.when(F.col("variant") == "B", F.col("c_cum"))).alias("c2"),
    )
    # N (final enrollment) as a window max over the SAME bounded
    # census, NOT an agg + broadcast crossJoin: the scalar-subquery
    # pattern would duplicate the whole census subtree (the PLANS.md
    # audit read 11 exchanges / 2 corpus scans vs ev_ab_sequential's
    # 5 / 1) because p's lineage re-computes for the 1-row aggregate.
    # Both windows here run over the <= |days| census (registered
    # bounded exceptions).
    wg = Window.partitionBy()
    d = p.withColumn("bign", F.max(F.col("n1") + F.col("n2")).over(wg))
    dec = "cast({} as decimal(38,0))"
    num = "(c1 * n2 - c2 * n1)"  # fits long: c,n <= ~1e5 at graded SFs
    lhs = (
        f"cast(625 as decimal(38,0)) * ({dec.format(num)} * {dec.format(num)})"
    )
    # Divided-out RHS: ceil(B / ns^2) = B div ns^2 + (B mod ns^2 > 0),
    # computed with the remainder-subtracted exact decimal division
    # (int_div doctrine — Spark's decimal `/` pre-rounds to scale 6,
    # but a zero-remainder quotient is exact; the quotient < 10^32
    # fits the decimal(38,6) result). Guarded by `guard` (n1,n2 > 0
    # so ns^2 > 0) — CASE branches evaluate lazily under ANSI.
    big_b = (
        f"(cast(2401 as decimal(38,0)) * {dec.format('bign')}"
        f" * {dec.format('n1')} * {dec.format('n2')}"
        f" * {dec.format('(c1 + c2)')}"
        f" * {dec.format('((n1 + n2) - (c1 + c2))')})"
    )
    ns2 = f"({dec.format('(n1 + n2)')} * {dec.format('(n1 + n2)')})"
    rhs = (
        f"(({big_b} - pmod({big_b}, {ns2})) / {ns2}"
        f" + (CASE WHEN pmod({big_b}, {ns2}) > 0 THEN 1 ELSE 0 END))"
    )
    guard = (
        (F.col("n1") > 0)
        & (F.col("n2") > 0)
        & (F.col("c1") + F.col("c2") > 0)
        & (F.col("c1") + F.col("c2") < F.col("n1") + F.col("n2"))
    )
    from mie_spark.functions.numeric import int_div

    d = d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n1",
        "c1",
        "n2",
        "c2",
        int_div(
            (F.col("n1") + F.col("n2")) * F.lit(2_000_000) + F.col("bign"),
            F.lit(2) * F.col("bign"),
        )
        .cast("long")
        .alias("info_ppm"),
        F.when(guard, F.expr(f"{lhs} >= {rhs}")).alias("crossed_obf"),
    )
    return d.select(
        "day",
        "n1",
        "c1",
        "n2",
        "c2",
        "info_ppm",
        F.col("crossed_obf"),
        F.when(
            F.col("crossed_obf"),
            F.col("day")
            == F.min(F.when(F.col("crossed_obf"), F.col("day"))).over(wg),
        )
        .otherwise(F.col("crossed_obf"))
        .alias("first_crossing"),
    )


# Shared by ev_ab_test (batch) and st_ab_test (streaming twin in
# queries/streaming.py) — identical SQL text, the st_drift_ks doctrine.
AB_TEST_ORACLE = """
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND value >= 100
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 2))
                       ::INTEGER < 128
                  THEN 'A' ELSE 'B' END AS variant,
             converted
      FROM u
    ),
    v AS (
      SELECT variant, count(*)::BIGINT AS n_users,
             sum(converted)::BIGINT AS n_conv
      FROM a GROUP BY variant
    ),
    w AS (
      SELECT
        (SELECT n_users FROM v WHERE variant = 'A') AS n1,
        (SELECT n_conv  FROM v WHERE variant = 'A') AS c1,
        (SELECT n_users FROM v WHERE variant = 'B') AS n2,
        (SELECT n_conv  FROM v WHERE variant = 'B') AS c2
    )
    SELECT n1, c1, n2, c2,
           round(c1 * 1.0 / n1 - c2 * 1.0 / n2, 6) AS lift,
           round((c1 * 1.0 / n1 - c2 * 1.0 / n2)
                 / sqrt(((c1 + c2) * 1.0 / (n1 + n2))
                        * (1.0 - (c1 + c2) * 1.0 / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 6) AS z,
           abs((c1 * 1.0 / n1 - c2 * 1.0 / n2)
               / sqrt(((c1 + c2) * 1.0 / (n1 + n2))
                      * (1.0 - (c1 + c2) * 1.0 / (n1 + n2))
                      * (1.0 / n1 + 1.0 / n2))) >= 1.96 AS significant
    FROM w
    """


@query("ev_ab_test", oracle=AB_TEST_ORACLE)
def ev_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B significance test: users are hash-split into
    variants (md5 first byte < 0x80 -> A, the repo's deterministic
    split rule — re-runs, retries, and late shards all agree, unlike
    rand()), conversion = "ever made a purchase of at least 100"
    (every user fires SOME purchase in this corpus — a universal
    conversion makes the pooled variance 0), and the
    pooled two-proportion z-statistic decides significance at the
    usual 1.96 two-sided threshold. This is the experiment-analysis
    pass every product analytics stack runs; here it doubles as an
    A/A test harness — a uniform hash split over one population SHOULD
    read not-significant, so a `significant=true` row on untreated
    data is itself a red flag (the dq_drift_ks sibling for
    experiments).

    Cross-engine exactness: every input to the float expressions is an
    exact BIGINT count, the expression TEXT is identical on both
    engines (same divisions in the same order), and IEEE doubles +
    sqrt (a correctly-rounded op, unlike ln/exp) are deterministic —
    so lift/z/significant agree bit-for-bit. Plan: one user_id
    aggregate touches events; everything after is a <=2-row reduction
    (scalar-subquery decorrelation on the Spark side)."""
    ev = load_table(spark, sf_dir, "events")
    return ab_test_from_users(user_conversion_census(ev))


def user_conversion_census(ev: DataFrame) -> DataFrame:
    """The per-user (user_id, converted) census both A/B forms
    aggregate to — ONE definition so the batch test and its streaming
    twin stay bit-identical (the twin-grading contract). Streaming:
    this is a complete-mode aggregate whose state is O(|users|) flags
    — experiment-bounded, not corpus-bounded (a user converts once,
    however many events they fire)."""
    return ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 100),
                1,
            ).otherwise(0)
        ).alias("converted")
    )


def ab_test_from_users(u: DataFrame) -> DataFrame:
    """Variant split + pooled two-proportion z over a (user_id,
    converted) census — the bounded projection shared by ev_ab_test
    and st_ab_test (drained state in, <=2-row reduction out)."""
    from mie_spark.operators.sampling import hash_bucket

    a = u.select(
        F.when(hash_bucket(F.col("user_id")) < 128, "A")
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    w = a.groupBy().agg(
        F.count(F.when(F.col("variant") == "A", 1)).alias("n1"),
        F.sum(
            F.when(F.col("variant") == "A", F.col("converted")).otherwise(0)
        ).alias("c1"),
        F.count(F.when(F.col("variant") == "B", 1)).alias("n2"),
        F.sum(
            F.when(F.col("variant") == "B", F.col("converted")).otherwise(0)
        ).alias("c2"),
    )
    p1 = F.col("c1") * F.lit(1.0) / F.col("n1")
    p2 = F.col("c2") * F.lit(1.0) / F.col("n2")
    pp = (F.col("c1") + F.col("c2")) * F.lit(1.0) / (
        F.col("n1") + F.col("n2")
    )
    z = (p1 - p2) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    return w.select(
        "n1",
        "c1",
        "n2",
        "c2",
        F.round(p1 - p2, 6).alias("lift"),
        F.round(z, 6).alias("z"),
        (F.abs(z) >= F.lit(1.96)).alias("significant"),
    )


def _backtest_oracle() -> str:
    """Forecast backtest as SQL composition: the Holt and Holt-Winters
    recursive-CTE oracles are embedded verbatim as subqueries (DuckDB
    allows a WITH inside a parenthesized FROM), joined back to the
    indexed day series, and scored against the naive lag-1 baseline on
    the COMMON strictly-out-of-sample window t >= 14 (Holt's init sees
    y_0..y_1, HW's sees y_0..y_13 — later than both). MAE/bias in
    integer milli-cents with the same sign-aware half-up rounding as
    every mean in this module."""

    def rhalf_expr(n: str) -> str:
        return (
            f"(CASE WHEN ({n}) >= 0 "
            f"THEN (2 * ({n}) + count(*)) // (2 * count(*)) "
            f"ELSE -((2 * (-({n})) + count(*)) // (2 * count(*))) END)"
            f"::BIGINT"
        )

    return f"""
    WITH s AS (
      SELECT (row_number() OVER (ORDER BY day)) - 1 AS t, day, y FROM (
        SELECT date_trunc('day', ts)::DATE AS day,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
        FROM events GROUP BY 1)
    ),
    h AS (SELECT * FROM ({_holt_oracle()})),
    w AS (SELECT * FROM ({_hw_oracle()})),
    p AS (
      SELECT 'naive' AS model, prev.y * 1000 AS f, s.y * 1000 AS a
      FROM s JOIN s prev ON prev.t = s.t - 1 WHERE s.t >= 14
      UNION ALL
      SELECT 'holt', hh.forecast_milli, s.y * 1000
      FROM s JOIN s prev ON prev.t = s.t - 1
             JOIN h hh ON hh.day = strftime(prev.day, '%Y-%m-%d')
      WHERE s.t >= 14
      UNION ALL
      SELECT 'hw', ww.forecast_milli, s.y * 1000
      FROM s JOIN w ww ON ww.day = strftime(s.day, '%Y-%m-%d')
      WHERE s.t >= 14
    )
    SELECT model, count(*)::BIGINT AS n,
           {rhalf_expr('sum(abs(f - a))')} AS mae_milli,
           {rhalf_expr('sum(f - a)')} AS bias_milli
    FROM p GROUP BY model
    """


@query("ev_forecast_backtest", oracle=_backtest_oracle())
def ev_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast model selection: backtest the naive lag-1 baseline,
    Holt (trend), and Holt-Winters (trend + weekly seasonality) on the
    SAME strictly-out-of-sample window (t >= 14, past both models'
    init windows) and report per-model MAE and signed bias in integer
    milli-cents. This is the "which forecaster do we ship" pass that
    belongs next to the forecasters themselves — a model that can't
    beat naive on MAE has no business gating anomaly alerts. Holt's
    prediction for day t is (l+b) at t-1; HW's is the forecast_milli
    its recurrence emits for t; naive is y_{t-1}.

    Exactness: all three prediction series are the exact integer
    recurrences already graded by ev_forecast_holt / ev_forecast_hw,
    errors are BIGINT differences, and the means use the sign-aware
    half-up integer formula — bit-identical on both engines. The
    oracle embeds both recursive CTEs as subqueries and replays
    everything. Scale shape: ONE day aggregate touches events; the
    three recurrences and the 3-row scorecard run over bounded state."""
    ev = load_table(spark, sf_dir, "events")
    rows = sorted(
        daily_cents_census(ev).collect(), key=lambda r: r["day"]
    )
    # 15 days = the first scorable point (t=14 with init through t=13).
    # Below that the oracle's t >= 14 window is empty and it returns an
    # EMPTY result set — mirror that exactly instead of raising
    # (ADVICE r10: engine and oracle must agree on degenerate inputs).
    if len(rows) < 15:
        return spark.createDataFrame(
            [], "model string, n long, mae_milli long, bias_milli long"
        )

    y = [int(r["y"]) for r in rows]
    T = len(y)
    # Holt replay — the recurrence lives ONCE in _holt_step (shared
    # with holt_from_daily): pred[t] = l+b at t-1
    level = y[0] * 1000
    trend = (y[1] - y[0]) * 1000
    holt_pred: dict[int, int] = {}
    for t in range(1, T):
        holt_pred[t] = level + trend
        level, trend = _holt_step(y[t] * 1000, level, trend)
    # HW replay — init and step shared with ev_forecast_hw:
    # pred[t] = l+b+s[t-7]
    lev, b, sea = _hw_init(y)
    hw_pred: dict[int, int] = {}
    for t in range(7, T):
        s_lag = sea[t - 7]
        hw_pred[t] = lev + b + s_lag
        lev, b, s_new = _hw_step(y[t] * 1000, lev, b, s_lag)
        sea.append(s_new)
    out = []
    for model, pred in (
        ("naive", {t: y[t - 1] * 1000 for t in range(1, T)}),
        ("holt", holt_pred),
        ("hw", hw_pred),
    ):
        errs = [pred[t] - y[t] * 1000 for t in range(14, T)]
        out.append(
            (
                model,
                len(errs),
                _rhalf(sum(abs(e) for e in errs), len(errs)),
                _rhalf(sum(errs), len(errs)),
            )
        )
    return spark.createDataFrame(
        out, "model string, n long, mae_milli long, bias_milli long"
    )
