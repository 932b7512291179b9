"""Storage plane: upsert-by-key tables behind two engines.

Engine mapping (SURVEY.md §1.5 — the reference opens CozoDB as `mem`,
`rocksdb`, or `sqlite`, storage/embedded.go:35-70):

- ``mem``      → driver-held pandas frames, surfaced as Spark DataFrames
                 on read. The reference's mem engine is a single-process
                 store too; this keeps the 18-table graph workload
                 (thousands of rows) off the disk entirely for tests.
- ``parquet``  → versioned parquet snapshots per table with an atomic
                 `_CURRENT` pointer file: upsert = read current
                 snapshot, anti-join on keys, union new rows, write
                 snapshot N+1, flip the pointer. This is poor-man's
                 MVCC; on a warehouse deployment the same call maps to
                 one Delta `MERGE INTO` (not shippable in this
                 container), and the pointer-flip is the transaction
                 commit.

Upsert parity with CozoDB `:put` (writer.go:61-67 etc.): insert or
replace whole row by key — idempotent with content-hash IDs.
"""

from __future__ import annotations

import os
import shutil
import threading
import time
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mie_spark.schemas import (
    DEFAULT_EMBEDDING_DIM,
    SCHEMA_VERSION,
    ALL_TABLES,
    key_columns,
    table_schema,
)


def now_s() -> int:
    """Unix seconds (writer.go:47)."""
    return int(time.time())


def _py_native(value: Any, dtype) -> Any:  # noqa: ANN001
    """Coerce pandas/numpy values to the python types Spark's row
    verifier accepts for the given Spark type."""
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        FloatType,
        LongType,
    )

    if value is None or (isinstance(value, float) and pd.isna(value)):
        return None
    if isinstance(dtype, ArrayType):
        if isinstance(value, (list, tuple, np.ndarray)):
            return [_py_native(v, dtype.elementType) for v in value]
        return None
    if isinstance(dtype, (FloatType, DoubleType)):
        return float(value)
    if isinstance(dtype, LongType):
        return int(value)
    if isinstance(dtype, BooleanType):
        return bool(value)
    return str(value)


class MieStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str | None = None,
        embedding_dim: int = DEFAULT_EMBEDDING_DIM,
    ):
        self.spark = spark
        self.path = path
        self.embedding_dim = embedding_dim
        self._mem: dict[str, pd.DataFrame] = {}
        # Writers fully serialize, matching the reference's single
        # RWMutex over the DB (storage/embedded.go:23-25,88-133): every
        # mutation is read-snapshot -> modify -> commit-pointer, so two
        # unserialized writers would lose one's rows. Reads need no lock
        # (snapshots are immutable; the pointer flip is atomic).
        self._write_lock = threading.RLock()
        if path:
            os.makedirs(path, exist_ok=True)
        self.ensure_schema()

    # -- schema ---------------------------------------------------------

    def ensure_schema(self) -> None:
        """Idempotent create-if-missing (client.go:54-122 ensures schema +
        indexes on every open)."""
        if self.meta_get("schema_version") is None:
            self.meta_set("schema_version", SCHEMA_VERSION)

    # -- engine plumbing --------------------------------------------------

    def _empty_pdf(self, table: str) -> pd.DataFrame:
        return pd.DataFrame({f.name: pd.Series(dtype="object") for f in table_schema(table)})

    def _snapshot_dir(self, table: str) -> str | None:
        assert self.path is not None
        pointer = os.path.join(self.path, table, "_CURRENT")
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            version = fh.read().strip()
        return os.path.join(self.path, table, version)

    def _read_pdf(self, table: str) -> pd.DataFrame:
        if self.path is None:
            return self._mem.get(table, self._empty_pdf(table))
        snap = self._snapshot_dir(table)
        if snap is None:
            return self._empty_pdf(table)
        return pd.read_parquet(snap)

    def _write_pdf(self, table: str, pdf: pd.DataFrame) -> None:
        if self.path is None:
            self._mem[table] = pdf.reset_index(drop=True)
            return
        tdir = os.path.join(self.path, table)
        os.makedirs(tdir, exist_ok=True)
        current = self._snapshot_dir(table)
        next_v = (
            f"v{int(os.path.basename(current)[1:]) + 1}" if current else "v1"
        )
        snap = os.path.join(tdir, next_v)
        os.makedirs(snap, exist_ok=True)
        pdf.reset_index(drop=True).to_parquet(os.path.join(snap, "part-0.parquet"))
        tmp_pointer = os.path.join(tdir, "_CURRENT.tmp")
        with open(tmp_pointer, "w") as fh:
            fh.write(next_v)
        os.replace(tmp_pointer, os.path.join(tdir, "_CURRENT"))  # commit point
        if current and os.path.exists(current):
            shutil.rmtree(current, ignore_errors=True)

    # -- reads ------------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        """Spark view of a table; all query operators build on this."""
        if name not in ALL_TABLES:
            raise KeyError(f"unknown table {name!r}")
        pdf = self._read_pdf(name)
        schema = table_schema(name)
        if pdf.empty:
            return self.spark.createDataFrame([], schema)
        # parquet round-trips hand back numpy scalars/arrays, which
        # createDataFrame's strict type checks reject (e.g. numpy.float64
        # inside an ArrayType(FloatType) column) — coerce to python-native
        rows = [
            tuple(_py_native(row[f.name], f.dataType) for f in schema)
            for _, row in pdf.iterrows()
        ]
        return self.spark.createDataFrame(rows, schema)

    # -- writes -----------------------------------------------------------

    def upsert_rows(self, table: str, rows: list[dict[str, Any]]) -> int:
        """Insert-or-replace by key (`:put` parity). Returns rows written."""
        if not rows:
            return 0
        with self._write_lock:
            return self._upsert_rows_locked(table, rows)

    def _upsert_rows_locked(self, table: str, rows: list[dict[str, Any]]) -> int:
        schema = table_schema(table)
        cols = [f.name for f in schema]
        keys = key_columns(table)
        new = pd.DataFrame(rows)
        missing = set(cols) - set(new.columns)
        for col in missing:
            new[col] = None
        new = new[cols]
        existing = self._read_pdf(table)
        if existing.empty:
            out = new
        else:
            # drop existing rows whose key matches an incoming row
            merged_keys = new[keys].apply(tuple, axis=1)
            mask = existing[keys].apply(tuple, axis=1).isin(set(merged_keys))
            out = pd.concat([existing[~mask], new], ignore_index=True)
        # intra-batch dedup: last write wins, like sequential :put
        out = out.drop_duplicates(subset=keys, keep="last")
        self._write_pdf(table, out)
        return len(rows)

    def upsert_df(self, table: str, df: DataFrame) -> int:
        """Distributed upsert: used by bulk ingest paths where the new
        rows are already a DataFrame (e.g. streaming foreachBatch).
        Executes the anti-join in Spark, materializes the snapshot."""
        with self._write_lock:
            return self._upsert_df_locked(table, df)

    def _upsert_df_locked(self, table: str, df: DataFrame) -> int:
        keys = key_columns(table)
        existing = self.table(table)
        kept = existing.join(df.select(*keys).dropDuplicates(keys), keys, "left_anti")
        cols = [f.name for f in table_schema(table)]
        merged = kept.select(*cols).unionByName(
            df.dropDuplicates(keys).select(*cols)
        )
        pdf = merged.toPandas()
        self._write_pdf(table, pdf)
        return df.count()

    def delete_rows(self, table: str, key_values: list[tuple]) -> int:
        with self._write_lock:
            return self._delete_rows_locked(table, key_values)

    def _delete_rows_locked(self, table: str, key_values: list[tuple]) -> int:
        keys = key_columns(table)
        existing = self._read_pdf(table)
        if existing.empty:
            return 0
        mask = existing[keys].apply(tuple, axis=1).isin(set(key_values))
        removed = int(mask.sum())
        self._write_pdf(table, existing[~mask])
        return removed

    # -- meta KV (storage/embedded.go:194-228) ------------------------------

    def meta_get(self, key: str) -> str | None:
        pdf = self._read_pdf("mie_meta")
        if pdf.empty:
            return None
        hit = pdf[pdf["key"] == key]
        return None if hit.empty else str(hit.iloc[-1]["value"])

    def meta_set(self, key: str, value: str) -> None:
        self.upsert_rows("mie_meta", [{"key": key, "value": str(value)}])

    def meta_increment(self, key: str) -> int:
        """Counter RMW done as one upsert (the reference's two-statement
        version is non-atomic, client.go:251-292 — noted in SURVEY §2.4)."""
        with self._write_lock:  # RMW atomic under the writer lock
            current = self.meta_get(key)
            value = (int(current) if current and current.isdigit() else 0) + 1
            self.meta_set(key, str(value))
            return value

    # -- lifecycle ----------------------------------------------------------

    def reset(self) -> None:
        """Drop everything (cmd/mie/reset.go:17-60 deletes the data dir)."""
        with self._write_lock:
            self._reset_locked()

    def _reset_locked(self) -> None:
        self._mem.clear()
        if self.path and os.path.isdir(self.path):
            shutil.rmtree(self.path)
            os.makedirs(self.path, exist_ok=True)
        self.ensure_schema()
