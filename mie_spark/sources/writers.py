"""Write-side layout control: partitioned and bucketed tables.

The read path (catalog.py) trusts Catalyst for pruning/pushdown; the
write path is where co-location is earned. Bucketing both sides of a
recurring join on the join key with the same bucket count removes the
shuffle from EVERY subsequent join — at 100 TB that's the difference
between a nightly pipeline and an hourly one. Partitioning by a
low-cardinality column (date, table/type tag) gives scan pruning.

These are thin, opinionated wrappers over the standard writers so the
layout decisions live in one audited place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Parquet partitioned by low-cardinality columns: directory-level
    pruning for any filter on them. Don't partition by high-cardinality
    keys (small-file explosion); bucket those instead."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sort-ordered) managed table.

    Two tables bucketed on the same keys with the same n_buckets join
    WITHOUT an exchange (see tests/test_scale.py, which pins that plan);
    adding sortBy on the join key also removes the per-task sort for
    sort-merge joins. Bucket metadata lives in the session catalog, so
    this requires saveAsTable, not path-based parquet.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# --- format-agnostic I/O (JSON / CSV / ORC / parquet) -----------------------

_FORMATS = ("parquet", "json", "csv", "orc")


def write_format(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write in any supported interchange format.

    Parquet/ORC are the performance formats (columnar, pushdown-able,
    splittable); JSON/CSV exist for interchange parity with the
    reference's export surface (reader.go:707-764). CSV gets an
    explicit header so the file round-trips without positional guessing.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Read any supported format. For JSON/CSV an explicit schema is
    REQUIRED: schema inference reads the data twice and types drift
    between runs — both unacceptable at 100 TB (and CSV inference would
    quietly widen ints to strings on a single dirty row). Parquet/ORC
    carry their own schema."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {_FORMATS}")
    r = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        r = r.schema(schema)
    elif schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)


# --- table maintenance: compaction & clustering -----------------------------

def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite a directory of small files into ~target-sized files.

    Streaming sinks and fine-grained upserts accrete small files; at
    scan time each file costs a task plus footer/open overhead, and a
    100 TB table of 1 MB files is unreadable in practice. Compaction =
    read → coalesce to ceil(bytes/target) → rewrite to a temp dir →
    atomic-ish swap. Returns the output file count. coalesce (not
    repartition) avoids a shuffle: it only merges read splits.
    """
    import math
    import pathlib
    import shutil

    # partitioned layouts (key=value dirs) would be silently FLATTENED
    # by a plain read→rewrite, destroying partition pruning — compact
    # each leaf partition directory individually instead
    root = pathlib.Path(path)
    part_dirs = [d for d in root.iterdir() if d.is_dir() and "=" in d.name]
    if part_dirs:
        raise ValueError(
            f"{path} is a partitioned layout ({part_dirs[0].name}, ...): "
            "compact each leaf partition directory, not the root — a flat "
            "rewrite would destroy the partitioning"
        )
    total = sum(f.stat().st_size for f in root.rglob("*") if f.is_file())
    n_out = max(1, math.ceil(total / target_file_bytes))
    reader = spark.read.format(fmt)
    if fmt == "csv":
        # write_format emits header=true csv; reading without the
        # option would turn every file's header line into a data row
        # and destroy column names before the destructive swap below.
        # NO inferSchema: compaction is a destructive in-place rewrite,
        # and inference MUTATES data on the way through (a string column
        # of zero-padded codes '00123' re-emits as int '123', '1.10' as
        # '1.1') — reading every column as plain string round-trips the
        # bytes losslessly, which is the only safe contract when the
        # originals are deleted right after
        reader = reader.option("header", "true")
    df = reader.load(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = df.coalesce(n_out).write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_out


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Range-cluster rows across files by the given columns, sorted
    within each file — the plain-parquet substitute for Z-ordering on a
    single key prefix. Each output file then covers a narrow min/max
    range of the cluster columns, so parquet row-group statistics let
    point/range scans on those columns skip almost every file.
    repartitionByRange samples the keys to build balanced boundaries;
    the sortWithinPartitions makes page-level stats tight too."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )
