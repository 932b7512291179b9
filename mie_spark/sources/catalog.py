"""Table catalog over the parquet test corpus.

The driver generates a TPC-H-ish star schema plus ``events`` (stream
table), ``documents`` (text corpus) and ``embeddings`` (vector corpus)
at several scale factors (TESTDATA.md). Every query entry point takes a
``sf_dir`` so the same plan runs unchanged from sf0.001 smoke tests to
a 100 TB cluster layout — only the path changes.

Parquet scans here are the root of every plan, so this is where scan
hygiene is enforced: column pruning and predicate pushdown are left to
Catalyst (we never .cache() eagerly or collect schemas by reading data).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one table; no caching, no schema inference cost
    beyond the parquet footer read.

    ``events.ts`` has shipped in two physical encodings across corpus
    versions: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    accepts as long via legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
    without isAdjustedToUTC (which Spark reads as TIMESTAMP_NTZ). Either
    way, downstream plans want one canonical type — session-tz TIMESTAMP
    — so we normalize based on what the footer actually says. The session
    timezone is pinned to UTC (mie_spark/session.py), making the NTZ cast
    wall-clock-preserving and identical to DuckDB's reading.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if parquet_ts_is_nanos(path):
            # the conf must stay set through EXECUTION of any plan built
            # over this scan (restoring it immediately would break the
            # lazy read), so it is session-sticky — but only set when
            # the footer actually carries TIMESTAMP(NANOS), so sessions
            # over micros-encoded corpora never see mutated behavior
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return normalize_event_ts(df)
    return spark.read.parquet(path)


def parquet_ts_is_nanos(path: str) -> bool:
    """Footer sniff via pyarrow: Spark refuses TIMESTAMP(NANOS) columns
    outright unless legacy.parquet.nanosAsLong is set, so the conf
    decision needs the physical type BEFORE the first spark.read."""
    try:
        import pyarrow.parquet as pq

        field = pq.ParquetFile(path).schema_arrow.field("ts")
        return str(field.type).startswith("timestamp[ns")
    except Exception:  # noqa: BLE001 — dir-of-files or exotic layout
        import glob
        import os

        try:
            import pyarrow.parquet as pq

            part = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if part:
                field = pq.ParquetFile(part[0]).schema_arrow.field("ts")
                return str(field.type).startswith("timestamp[ns")
        except Exception:  # noqa: BLE001
            pass
        return True  # conservative: keep the old always-set behavior


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Coerce ``ts`` to session-tz TIMESTAMP whatever the scan produced."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # nanos-as-long: integer division — ns values overflow double
        # mantissa, so no `/`
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view so ``spark.sql`` — the
    raw-query escape hatch (reference: `mie query "<cozoscript>"`,
    cmd/mie/query.go:22-123) — sees the same names DuckDB's oracle does."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
