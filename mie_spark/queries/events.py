"""Event-stream query coverage: windowed aggregation, sessionization,
JSON property extraction, per-user rollups. These are the batch
equivalents of the streaming module (mie_spark/streaming) — same
logical plans, bounded input, so they are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mie_spark.queries import query
from mie_spark.sources import load_table


@query(
    "ev_hourly_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
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
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "ev_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → flag → running
    sum, the canonical window-function formulation. One shuffle on
    user_id serves both window passes and the final aggregate (same
    partitioning reused across stages). Timestamps are emitted as epoch
    microseconds so the oracle comparison is exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1)),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )


@query(
    "ev_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(json_extract_string(props, '$.k')::INT), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction (the reference stores
    JSON-in-String too, e.g. decision `alternatives` — SURVEY §1.2);
    get_json_object stays JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.avg(F.get_json_object(F.col("props"), "$.k").cast("int")), 4
        ).alias("avg_k"),
    )


@query(
    "ev_top_spenders",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS spend, count(*) AS n_purchases
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY spend DESC, user_id
    LIMIT 10
    """,
)
def ev_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("spend"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .orderBy(F.col("spend").desc(), F.col("user_id"))
        .limit(10)
    )
