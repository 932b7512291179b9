"""Storage plane: upsert-by-key tables behind two engines.

Engine mapping (SURVEY.md §1.5 — the reference opens CozoDB as `mem`,
`rocksdb`, or `sqlite`, storage/embedded.go:35-70):

- ``mem``      → driver-held pandas frames, surfaced as Spark DataFrames
                 on read. The reference's mem engine is a single-process
                 store too; this is the documented tiny-table latency
                 fast path (unit tests, 18-table graph workloads of
                 thousands of rows) and the ONLY place pandas appears.
- ``parquet``  → versioned parquet snapshots per table with an atomic
                 `_CURRENT` pointer file, read and written entirely by
                 Spark: ``table()`` is a lazy ``spark.read.parquet``
                 (scans distribute, filters push down), upsert =
                 anti-join on keys ∪ new rows executed as one Spark
                 plan whose write action streams straight to snapshot
                 N+1 — no driver materialization at any point, so the
                 write path scales with the cluster, not the driver.
                 The pointer-flip is the transaction commit (poor-man's
                 MVCC); on a warehouse deployment the same call maps to
                 one Delta `MERGE INTO` (not shippable in this
                 container). GC keeps the 2 newest snapshots, so a lazy
                 reader survives exactly ONE commit after it was opened;
                 a handle held across two or more commits loses its
                 files — re-open via table() for fresh reads (the same
                 contract as Delta's VACUUM horizon, just shorter).

                 Snapshots are PARTITIONED by a stable key-hash bucket
                 (``bkt=K`` subdirs, ``merge_buckets`` of them): a merge
                 reads and rewrites ONLY the buckets the batch touches
                 (partition pruning on the read, ``partitionBy`` on the
                 write) and hard-links every untouched bucket's files
                 from the previous snapshot — O(batch) I/O per commit
                 instead of O(table), which is the difference between a
                 usable and an unusable write path at 100 TB. Hard links
                 keep each snapshot a self-contained full table, so the
                 pointer flip, GC, pinning, time travel, and backup all
                 work unchanged (deleting an old version only drops link
                 counts, never shared file content).

Upsert parity with CozoDB `:put` (writer.go:61-67 etc.): insert or
replace whole row by key — idempotent with content-hash IDs.
"""

from __future__ import annotations

import json
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
    AUX_TABLES,
    key_columns,
    table_schema,
)


def now_s() -> int:
    """Unix seconds (writer.go:47)."""
    return int(time.time())


# Per-snapshot zone-map sidecar: {relative part file -> {column ->
# [min, max]}}, collected from parquet FOOTER statistics (no data
# read). The Delta/Iceberg file-stats analog for the snapshot layout.
ZONES_FILE = "_ZONES.json"

# Store-level multi-table transaction manifest: {table -> version}.
# Its atomic rename is the single commit point for a cross-table
# write — readers resolve a table's current version as max(per-table
# pointer, manifest entry), so either EVERY listed table's new version
# is visible or none is. After commit the per-table pointers roll
# forward and the manifest is removed; a crash in between is repaired
# by _recover_txn on the next open (roll-forward, never roll-back).
TXN_FILE = "_TXN_CURRENT"


def _file_zone_stats(path: str) -> dict[str, list]:
    """Column min/max for one parquet file from its footer row-group
    statistics — a metadata-only read (~KB), never the data pages.
    Only top-level primitive columns with full stats coverage are
    emitted: a column missing stats in ANY row group is omitted
    (absence always means "cannot prune this file on this column",
    which is the safe direction). Values are kept JSON-native
    (int/float/str/bool); anything else is dropped."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    zones: dict[str, list] = {}
    poisoned: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name or name in poisoned:  # nested leaf: skip
                continue
            st = col.statistics
            mn = st.min if st is not None and st.has_min_max else None
            mx = st.max if st is not None and st.has_min_max else None
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    mn = None
            ok = all(
                isinstance(v, (int, float, str, bool)) and v == v
                for v in (mn, mx)
            )
            if not ok:
                poisoned.add(name)
                zones.pop(name, None)
                continue
            if name in zones:
                zones[name] = [min(zones[name][0], mn), max(zones[name][1], mx)]
            else:
                zones[name] = [mn, mx]
    return zones


def _py_native(value: Any, dtype) -> Any:  # noqa: ANN001
    """Coerce pandas/numpy values to the python types Spark's row
    verifier accepts for the given Spark type."""
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
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
    if isinstance(dtype, (IntegerType, LongType)):
        return int(value)
    if isinstance(dtype, BooleanType):
        return bool(value)
    return str(value)


def _canon_select(df: DataFrame, schema, extra: tuple[str, ...] = ()) -> DataFrame:  # noqa: ANN001
    """Cast-select to the canonical schema, filling columns the source
    predates with typed NULLs (add-column schema evolution; see
    MieStore.table). ``extra`` carries layout columns (``bkt``) that
    live outside the logical schema."""
    from pyspark.sql import functions as F

    present = set(df.columns)
    return df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in present
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema
        ],
        *extra,
    )


class MieStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str | None = None,
        embedding_dim: int = DEFAULT_EMBEDDING_DIM,
        snapshot_retention: int = 2,
        merge_buckets: int = 16,
    ):
        if snapshot_retention < 1:
            raise ValueError(
                f"snapshot_retention must be >= 1, got {snapshot_retention}"
            )
        if merge_buckets < 1:
            raise ValueError(f"merge_buckets must be >= 1, got {merge_buckets}")
        self.spark = spark
        self.path = path
        self.embedding_dim = embedding_dim
        # Bucket count for the partitioned-merge layout. Buckets are a
        # stable hash of the key columns, so a row's bucket never moves;
        # a merge batch touching B buckets rewrites B/merge_buckets of
        # the table instead of all of it. Size it so one bucket's data
        # fits an executor comfortably at the deployment's table size
        # (16 is right for memory-graph scale; a lake deployment would
        # use hundreds).
        self.merge_buckets = merge_buckets
        # How many newest snapshot versions GC keeps per table (plus any
        # pinned versions). Default 2 = the historical contract (a lazy
        # reader survives exactly one commit); raise it so a reader
        # opened N commits ago keeps its files — the same knob as
        # Delta's VACUUM retention horizon.
        self.snapshot_retention = snapshot_retention
        self._mem: dict[str, pd.DataFrame] = {}
        # Writers fully serialize, matching the reference's single
        # RWMutex over the DB (storage/embedded.go:23-25,88-133): every
        # mutation is read-snapshot -> modify -> commit-pointer, so two
        # unserialized writers would lose one's rows. Reads need no lock
        # (snapshots are immutable; the pointer flip is atomic).
        self._write_lock = threading.RLock()
        if path:
            os.makedirs(path, exist_ok=True)
            self._recover_txn()
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
        version = None
        if os.path.exists(pointer):
            with open(pointer) as fh:
                version = fh.read().strip()
        # a committed-but-not-yet-rolled-forward transaction outranks
        # the per-table pointer: the manifest rename IS the commit
        # point, so every listed table must serve its manifest version
        # the instant the rename lands (all-or-nothing visibility)
        txn_v = self._txn_manifest().get(table)
        if txn_v is not None and os.path.isdir(
            os.path.join(self.path, table, txn_v)
        ):
            if version is None or int(txn_v[1:]) > int(version[1:]):
                version = txn_v
        if version is None:
            return None
        return os.path.join(self.path, table, version)

    def _txn_manifest(self) -> dict[str, str]:
        """The committed multi-table transaction, if one is mid-roll-
        forward ({} otherwise). Best-effort read: a torn tmp file never
        exists at this path (os.replace is atomic), but guard anyway."""
        assert self.path is not None
        p = os.path.join(self.path, TXN_FILE)
        if not os.path.exists(p):
            return {}
        try:
            with open(p) as fh:
                m = json.load(fh)
            return m if isinstance(m, dict) else {}
        except (json.JSONDecodeError, OSError):
            return {}

    def _recover_txn(self) -> None:
        """Roll FORWARD a committed transaction whose per-table pointer
        flips were interrupted by a crash: the manifest rename already
        made every listed version visible (see _snapshot_dir), so
        recovery finishes the flips and clears the manifest. A crash
        BEFORE the manifest rename left nothing visible — orphan
        snapshot dirs are overwritten by the next write at the same
        version number."""
        manifest = self._txn_manifest()
        if not manifest:
            return
        for table, version in sorted(manifest.items()):
            if not os.path.isdir(os.path.join(self.path, table, version)):
                continue  # defensive: never commit a missing snapshot
            pointer = os.path.join(self.path, table, "_CURRENT")
            current = None
            if os.path.exists(pointer):
                with open(pointer) as fh:
                    current = fh.read().strip()
            if current is None or int(version[1:]) > int(current[1:]):
                self._commit_snapshot(table, version)
        os.remove(os.path.join(self.path, TXN_FILE))

    def _read_pdf(self, table: str) -> pd.DataFrame:
        """Mem-engine read (driver pandas). On-disk reads go through
        Spark in table() — never through pandas."""
        assert self.path is None
        return self._mem.get(table, self._empty_pdf(table))

    def _write_pdf(self, table: str, pdf: pd.DataFrame) -> None:
        assert self.path is None
        self._mem[table] = pdf.reset_index(drop=True)

    def _next_snapshot(self, table: str) -> tuple[str, str]:
        """(dir, version) for the next snapshot write."""
        tdir = os.path.join(self.path, table)
        os.makedirs(tdir, exist_ok=True)
        current = self._snapshot_dir(table)
        next_v = (
            f"v{int(os.path.basename(current)[1:]) + 1}" if current else "v1"
        )
        return os.path.join(tdir, next_v), next_v

    def _commit_snapshot(self, table: str, version: str) -> None:
        """Atomic pointer flip, then GC all but the `snapshot_retention`
        newest versions (default 2: the previous one stays so lazy
        readers opened before this commit keep their files). Pinned
        versions (see pin_current) are exempt from GC — they back named
        backups and long-lived readers, the same contract as Delta's
        VACUUM retention."""
        tdir = os.path.join(self.path, table)
        tmp_pointer = os.path.join(tdir, "_CURRENT.tmp")
        with open(tmp_pointer, "w") as fh:
            fh.write(version)
        os.replace(tmp_pointer, os.path.join(tdir, "_CURRENT"))  # commit point
        pinned = set(self.pinned_versions(table))
        versions = sorted(
            (d for d in os.listdir(tdir) if d.startswith("v") and d[1:].isdigit()),
            key=lambda d: int(d[1:]),
        )
        for stale in versions[: -self.snapshot_retention]:
            if stale not in pinned:
                shutil.rmtree(os.path.join(tdir, stale), ignore_errors=True)

    def _bkt(self, table: str):  # noqa: ANN202
        """Stable key-hash bucket for the partitioned-merge layout: a
        row's bucket is a pure function of its key columns, so it never
        moves across rewrites and both sides of a merge agree on it."""
        from pyspark.sql import functions as F

        keys = key_columns(table)
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in keys]), F.lit(self.merge_buckets)
        ).cast("int")

    def _write_df(
        self, table: str, df: DataFrame, defer_commit: bool = False
    ) -> str:
        """Spark-native FULL snapshot write (first write, legacy-layout
        upgrade, or full-coverage batch): the plan executes distributed
        and streams to the next version directory partitioned by bucket;
        nothing passes through the driver. Incremental merges go through
        :meth:`_merge_and_write`, which rewrites only touched buckets.
        ``defer_commit=True`` leaves the snapshot invisible (no pointer
        flip) for the multi-table transaction path; returns the
        version either way."""
        snap, version = self._next_snapshot(table)
        if "bkt" not in df.columns:
            df = df.withColumn("bkt", self._bkt(table))
        df.write.mode("overwrite").partitionBy("bkt").parquet(snap)
        self._write_zone_manifest(snap, self._snapshot_dir(table))
        if not defer_commit:
            self._commit_snapshot(table, version)
        return version

    def _table_has_no_snapshot(self, name: str) -> bool:
        """True when a path-backed table has no committed, non-empty
        snapshot — i.e. ``table(name)`` would return
        ``createDataFrame([], schema)``. THE single emptiness check:
        table() and meta_get's fast path (ADVICE r13) both call this,
        so the two can never drift."""
        snap = self._snapshot_dir(name)
        return snap is None or not self._has_parquet(snap)

    def _has_parquet(self, snap: str) -> bool:
        # Spark writes no part files for an empty DataFrame — only
        # _SUCCESS — and spark.read can't infer schema from that.
        # Walk: part files live inside bkt=K partition subdirs.
        if not os.path.isdir(snap):
            return False
        return any(
            f.endswith(".parquet") for _, _, fs in os.walk(snap) for f in fs
        )

    def _is_bucketed(self, snap: str) -> bool:
        return any(d.startswith("bkt=") for d in os.listdir(snap))

    def _link_untouched(self, prev: str, nxt: str, touched: list[int]) -> None:
        """Carry every untouched bucket into the new snapshot by
        hard-linking its part files — O(files) metadata ops, zero data
        I/O. Hard links make each snapshot self-contained: GC of an old
        version only decrements link counts, shared content survives."""
        touched_dirs = {f"bkt={b}" for b in touched}
        for d in os.listdir(prev):
            if not d.startswith("bkt=") or d in touched_dirs:
                continue
            sdir, ddir = os.path.join(prev, d), os.path.join(nxt, d)
            os.makedirs(ddir, exist_ok=True)
            for fn in os.listdir(sdir):
                if not fn.endswith(".parquet"):
                    continue
                try:
                    os.link(os.path.join(sdir, fn), os.path.join(ddir, fn))
                except OSError:  # cross-device fallback
                    shutil.copy2(os.path.join(sdir, fn), os.path.join(ddir, fn))

    # -- zone maps (file-level data skipping) -----------------------------

    def _write_zone_manifest(self, snap: str, prev: str | None = None) -> None:
        """Collect per-file column min/max into the snapshot's
        ``_ZONES.json`` sidecar, BEFORE the pointer flip commits it.
        Files carried over from the previous snapshot by hard link keep
        their stats without a re-read (detected by inode identity at
        the same relative path), so an incremental merge pays footer
        reads only for the files it actually wrote — the same
        commit-time stats collection Delta/Iceberg do, minus the
        transaction log. At lake scale the footer walk would move into
        the write tasks; here the driver-side walk is O(files) metadata
        I/O and touches no data pages."""
        prev_manifest: dict[str, dict] = {}
        if prev is not None:
            p = os.path.join(prev, ZONES_FILE)
            if os.path.exists(p):
                with open(p) as fh:
                    prev_manifest = json.load(fh)
        manifest: dict[str, dict] = {}
        for root, _, fs in os.walk(snap):
            for fn in fs:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, snap)
                if rel in prev_manifest and prev is not None:
                    prev_file = os.path.join(prev, rel)
                    try:
                        if os.path.samefile(prev_file, full):  # hard link
                            manifest[rel] = prev_manifest[rel]
                            continue
                    except OSError:
                        pass
                manifest[rel] = _file_zone_stats(full)
        tmp = os.path.join(snap, ZONES_FILE + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(snap, ZONES_FILE))

    def zones(self, table: str) -> dict[str, dict] | None:
        """The current snapshot's zone manifest (None when the table is
        empty, on the mem engine, or for pre-zone-map snapshots)."""
        if self.path is None:
            return None
        snap = self._snapshot_dir(table)
        if snap is None:
            return None
        p = os.path.join(snap, ZONES_FILE)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def scan_pruned(
        self, table: str, ranges: dict[str, tuple[Any, Any]]
    ) -> DataFrame:
        """Zone-map-pruned scan: read ONLY the part files whose
        ``[min,max]`` zones can intersect every ``col: (lo, hi)`` range
        (inclusive bounds; ``None`` leaves that side open), then apply
        the same ranges as a residual filter so the result is exactly
        ``table(name)`` filtered — pruning is a physical optimization,
        never a semantics change. A file with no stats for a column is
        always kept (safe direction). Complements bucket pruning:
        buckets serve key point-lookups, zones serve range predicates
        on NON-key columns (created_at, confidence, ...), which is the
        dominant scan shape at lake scale. Falls back to the full scan
        when no manifest exists."""
        from pyspark.sql import functions as F

        schema = table_schema(table)

        def residual(df: DataFrame) -> DataFrame:
            for col, (lo, hi) in ranges.items():
                if lo is not None:
                    df = df.filter(F.col(col) >= F.lit(lo))
                if hi is not None:
                    df = df.filter(F.col(col) <= F.lit(hi))
            return df

        manifest = self.zones(table)
        if manifest is None:
            return residual(self.table(table))
        snap = self._snapshot_dir(table)
        keep = []
        for rel, fz in manifest.items():
            ok = True
            for col, (lo, hi) in ranges.items():
                z = fz.get(col)
                if z is None:
                    continue  # no stats: cannot prune on this column
                zmin, zmax = z
                if (hi is not None and zmin > hi) or (
                    lo is not None and zmax < lo
                ):
                    ok = False
                    break
            if ok:
                keep.append(os.path.join(snap, rel))
        if not keep:
            return self.spark.createDataFrame([], schema)
        return residual(_canon_select(self._read_snapshot(table, *keep), schema))

    # -- reads ------------------------------------------------------------

    def _read_snapshot(self, table: str, *paths: str) -> DataFrame:
        """Read snapshot parquet with the CANONICAL schema requested
        explicitly — the full schema-evolution read contract (r9):

        - ADD-column: files predating the column yield typed NULLs
          (parquet readers null-fill requested columns absent from a
          file's footer).
        - DROP-column: stale columns still present in old files are
          ignored (only requested columns are materialized).
        - Type WIDENING (int->long, float->double, int->double):
          Spark 4's parquet readers up-cast a narrower file type to the
          wider requested type in the scan itself (SPARK-40876) — which
          the previous ``mergeSchema`` read could NOT survive: schema
          merge throws CANNOT_MERGE_SCHEMAS the moment a snapshot's
          hard-linked buckets mix pre- and post-widening file vintages
          (verified empirically; pinned by the widening tests).

        Narrowing and type CHANGES (string->long, ...) are out of
        contract, as in Delta/Iceberg. The ``bkt`` layout partition
        column, when present, is appended by partition discovery."""
        return self.spark.read.schema(table_schema(table)).parquet(*paths)

    def table(self, name: str) -> DataFrame:
        """Spark view of a table; all query operators build on this.
        On-disk: a lazy distributed parquet scan (filters push down,
        columns prune); the cast-select re-asserts the canonical schema
        so float/int widths survive round-trips through any writer."""
        if name not in ALL_TABLES and name not in AUX_TABLES:
            raise KeyError(f"unknown table {name!r}")
        schema = table_schema(name)
        if self.path is not None:
            if self._table_has_no_snapshot(name):
                return self.spark.createDataFrame([], schema)
            snap = self._snapshot_dir(name)
            from pyspark.sql import functions as F

            # SCHEMA EVOLUTION: a snapshot written by an older build is
            # read through _read_snapshot's explicit-schema contract —
            # added columns arrive as typed NULLs, dropped columns are
            # ignored, and int->long / float->double widenings up-cast
            # in the scan. The next merge writes the full current
            # schema, so evolution completes lazily per table, one
            # commit after the code ships (the Delta read contract).
            return _canon_select(self._read_snapshot(name, snap), schema)
        pdf = self._read_pdf(name)
        if pdf.empty:
            return self.spark.createDataFrame([], schema)
        for f in schema:  # mem engine: same add-column contract
            if f.name not in pdf.columns:
                pdf[f.name] = None
        # parquet round-trips hand back numpy scalars/arrays, which
        # createDataFrame's strict type checks reject (e.g. numpy.float64
        # inside an ArrayType(FloatType) column) — coerce to python-native
        rows = [
            tuple(_py_native(row[f.name], f.dataType) for f in schema)
            for _, row in pdf.iterrows()
        ]
        return self.spark.createDataFrame(rows, schema)

    def table_at(self, name: str, version: str) -> DataFrame:
        """Time-travel read of a specific snapshot version (pair with
        pin_current, which guarantees the version survives GC) — the
        Delta `VERSION AS OF` analog on the versioned layout. Raises if
        the version was never written or has been GC'd."""
        if name not in ALL_TABLES:
            raise KeyError(f"unknown table {name!r}")
        if self.path is None:
            raise ValueError("table_at requires the parquet engine (mem has no versions)")
        snap = os.path.join(self.path, name, version)
        if not os.path.isdir(snap):
            raise FileNotFoundError(
                f"{name}@{version} does not exist (GC'd or never written); "
                f"pin versions you need to keep (pin_current)"
            )
        schema = table_schema(name)
        if not self._has_parquet(snap):
            return self.spark.createDataFrame([], schema)
        # same add-column NULL-fill as table(): a pinned version is the
        # reader MOST likely to predate a schema evolution
        return _canon_select(self._read_snapshot(name, snap), schema)

    # -- writes -----------------------------------------------------------

    def upsert_rows(self, table: str, rows: list[dict[str, Any]]) -> int:
        """Insert-or-replace by key (`:put` parity). Returns rows
        actually written: intra-batch duplicates of the same key
        collapse last-write-wins, so the count can be < len(rows)."""
        if not rows:
            return 0
        with self._write_lock:
            return self._upsert_rows_locked(table, rows)

    def _rows_to_df(self, table: str, rows: list[dict[str, Any]]):
        """Dict rows → (key-unique DataFrame in canonical order, n).
        Intra-batch dedup (last write wins, like sequential :put)
        happens driver-side while the rows are still a dict list —
        cheaper than a window over the batch."""
        schema = table_schema(table)
        cols = [f.name for f in schema]
        keys = key_columns(table)
        by_key = {tuple(r.get(k) for k in keys): r for r in rows}
        new = self.spark.createDataFrame(
            [
                tuple(_py_native(r.get(c), f.dataType) for c, f in zip(cols, schema))
                for r in by_key.values()
            ],
            schema,
        )
        return new, len(by_key)

    def _merge_pdf(
        self, table: str, rows: list[dict[str, Any]]
    ) -> tuple[pd.DataFrame, int]:
        """Mem-engine merge: NULL-fill the batch to the table schema,
        replace existing rows on key match, intra-batch dedup (last
        write wins, like sequential :put). Shared by the single-table
        and transactional upsert paths — key/schema semantics live in
        exactly one place. Returns (merged frame, unique-key count)."""
        cols = [f.name for f in table_schema(table)]
        keys = key_columns(table)
        new = pd.DataFrame(rows)
        for col in set(cols) - set(new.columns):
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
        out = out.drop_duplicates(subset=keys, keep="last")
        n = len({tuple(r.get(k) for k in keys) for r in rows})
        return out, n

    def _upsert_rows_locked(self, table: str, rows: list[dict[str, Any]]) -> int:
        if self.path is not None:
            new, n = self._rows_to_df(table, rows)
            self._merge_and_write(table, new)
            return n
        out, n = self._merge_pdf(table, rows)
        self._write_pdf(table, out)
        return n

    def upsert_df(self, table: str, df: DataFrame) -> int:
        """Distributed upsert: used by bulk ingest paths where the new
        rows are already a DataFrame (e.g. streaming foreachBatch).
        Executes the anti-join in Spark, materializes the snapshot."""
        with self._write_lock:
            return self._upsert_df_locked(table, df)

    def atomic_upsert_rows(
        self, updates: dict[str, list[dict[str, Any]]]
    ) -> dict[str, int]:
        """Multi-table TRANSACTIONAL upsert: either every table's batch
        becomes visible or none does (closes SURVEY §7's last risk-
        register item — invalidate_fact's two ordered MERGEs had a
        documented window where readers saw the fact flipped but the
        edge missing).

        Disk engine protocol (write-ahead roll-forward, the manifest
        rename is the commit point):

        1. PREPARE — write every table's next snapshot with the pointer
           flip deferred; nothing is visible yet. A crash here leaves
           only orphan version dirs that the next write overwrites.
        2. COMMIT — one atomic ``os.replace`` of the {table: version}
           manifest to ``_TXN_CURRENT``. Readers resolve a table's
           current version as max(pointer, manifest entry), so this
           single rename makes ALL the new versions visible at once.
        3. ROLL FORWARD — flip each per-table pointer (+ GC), then
           remove the manifest. A crash mid-way is repaired by
           _recover_txn on the next open; readers in the window still
           see the committed state via the manifest.

        Mem engine: build every table's merged frame first, then
        assign all under the lock — an exception during the build
        mutates nothing. Returns per-table written-row counts."""
        updates = {t: rows for t, rows in updates.items() if rows}
        if not updates:
            return {}
        with self._write_lock:
            if self.path is None:
                built: dict[str, pd.DataFrame] = {}
                counts: dict[str, int] = {}
                for table, rows in sorted(updates.items()):
                    built[table], counts[table] = self._merge_pdf(table, rows)
                for table, out in built.items():  # all-or-nothing assign
                    self._write_pdf(table, out)
                return counts
            # 1. PREPARE: invisible snapshots
            versions: dict[str, str] = {}
            counts = {}
            for table, rows in sorted(updates.items()):
                new, n = self._rows_to_df(table, rows)
                v = self._merge_and_write(table, new, defer_commit=True)
                counts[table] = n
                if v is not None:
                    versions[table] = v
            self._commit_txn(versions)
            return counts

    def _commit_txn(self, versions: dict[str, str]) -> None:
        """Steps 2+3 of the transaction protocol: the atomic manifest
        rename (commit point), then per-table pointer roll-forward and
        manifest removal. Callers hold the write lock and have already
        prepared every snapshot with defer_commit=True.

        A pending manifest from an EARLIER commit whose roll-forward
        raised mid-flip (process still alive, exception swallowed by
        the caller) is finished FIRST — overwriting it would silently
        unpublish that transaction's committed-but-unflipped versions
        for every reader that consults the manifest."""
        if not versions:
            return
        if self._txn_manifest():
            self._recover_txn()
        tmp = os.path.join(self.path, TXN_FILE + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(versions, fh)
        os.replace(tmp, os.path.join(self.path, TXN_FILE))  # COMMIT
        for table, version in versions.items():
            self._commit_snapshot(table, version)
        os.remove(os.path.join(self.path, TXN_FILE))

    def atomic_upsert_dfs(
        self, updates: dict[str, DataFrame], checkpoint: bool = True
    ) -> dict[str, int]:
        """DataFrame form of :meth:`atomic_upsert_rows` — the streaming
        foreachBatch sink shape: a micro-batch that lands rows in N
        tables (e.g. nodes + their embeddings) commits them with ONE
        manifest rename, so a reader never sees a node its embedding
        hasn't reached (or a crash mid-batch expose half a batch).
        Each input is localCheckpoint'ed once (after key-dedup): the
        merge write and the returned count both consume it, and an
        expensive lineage (a mapInPandas embedding stage) must not
        execute twice. Callers whose inputs already branch from a
        checkpoint (the embed sink checkpoints once and derives both
        tables' frames from it) pass ``checkpoint=False`` to skip a
        redundant materialization per table per micro-batch. Returned
        counts are unique-KEY counts after intra-batch dedup, the same
        contract as :meth:`atomic_upsert_rows`."""
        updates = dict(updates)
        if not updates:
            return {}
        with self._write_lock:
            counts: dict[str, int] = {}
            if self.path is None:
                built: dict[str, pd.DataFrame] = {}
                for table, df in sorted(updates.items()):
                    keys = key_columns(table)
                    cols = [f.name for f in table_schema(table)]
                    deduped = df.dropDuplicates(keys)
                    if checkpoint:
                        deduped = deduped.localCheckpoint()
                    existing = self.table(table)
                    kept = existing.join(
                        deduped.select(*keys), keys, "left_anti"
                    )
                    merged = kept.select(*cols).unionByName(
                        deduped.select(*cols)
                    )
                    built[table] = merged.toPandas()
                    # unique-key count, matching atomic_upsert_rows
                    counts[table] = deduped.count()
                for table, pdf in built.items():  # all-or-nothing assign
                    self._write_pdf(table, pdf)
                return counts
            versions: dict[str, str] = {}
            for table, df in sorted(updates.items()):
                keys = key_columns(table)
                cols = [f.name for f in table_schema(table)]
                deduped = df.dropDuplicates(keys)
                if checkpoint:
                    deduped = deduped.localCheckpoint()
                v = self._merge_and_write(
                    table,
                    deduped.select(*cols),
                    defer_commit=True,
                )
                # unique-key count, matching atomic_upsert_rows
                counts[table] = deduped.count()
                if v is not None:
                    versions[table] = v
            self._commit_txn(versions)
            return counts

    def _merge_and_write(
        self, table: str, new: DataFrame, defer_commit: bool = False
    ) -> str | None:
        """Bucket-pruned MERGE: current snapshot anti-join keys(new) ∪
        new, restricted to the buckets the batch touches — ONE Spark
        plan whose scan partition-prunes to the touched ``bkt=K`` dirs
        and whose write produces only those dirs; untouched buckets are
        hard-linked from the previous snapshot. O(batch) I/O per commit,
        not O(table). ``new`` must already be key-unique and in
        canonical column order. Falls back to a full (bucketed) rewrite
        when the current snapshot predates the bucketed layout or the
        batch touches every bucket anyway."""
        from pyspark.sql import functions as F

        schema = table_schema(table)
        keys = key_columns(table)
        new = new.withColumn("bkt", self._bkt(table))
        snap = self._snapshot_dir(table)
        if snap is None or not self._has_parquet(snap):
            # first write: all buckets are new
            return self._write_df(table, new, defer_commit=defer_commit)
        touched = sorted(
            r["bkt"] for r in new.select("bkt").distinct().collect()
        )
        if not touched:  # empty batch: nothing to merge
            return None
        if not self._is_bucketed(snap) or len(touched) >= self.merge_buckets:
            existing = _canon_select(
                self._read_snapshot(table, snap), schema
            ).withColumn("bkt", self._bkt(table))
            kept = existing.join(
                new.select(*keys).dropDuplicates(keys), keys, "left_anti"
            )
            return self._write_df(
                table, kept.unionByName(new), defer_commit=defer_commit
            )
        raw = self._read_snapshot(table, snap)
        kept = _canon_select(
            raw.filter(F.col("bkt").isin(touched)),  # partition pruning
            schema,
            extra=("bkt",),
        ).join(new.select(*keys).dropDuplicates(keys), keys, "left_anti")
        nsnap, version = self._next_snapshot(table)
        kept.unionByName(new).write.mode("overwrite").partitionBy(
            "bkt"
        ).parquet(nsnap)
        self._link_untouched(snap, nsnap, touched)
        self._write_zone_manifest(nsnap, snap)
        if not defer_commit:
            self._commit_snapshot(table, version)
        return version

    def _upsert_df_locked(self, table: str, df: DataFrame) -> int:
        keys = key_columns(table)
        cols = [f.name for f in table_schema(table)]
        if self.path is not None:
            # checkpoint first: the merge write AND the returned count
            # both consume df — without this an expensive input lineage
            # (e.g. a mapInPandas embedding stage) would execute twice
            df = df.localCheckpoint()
            self._merge_and_write(
                table, df.dropDuplicates(keys).select(*cols)
            )
            return df.count()
        existing = self.table(table)
        kept = existing.join(df.select(*keys).dropDuplicates(keys), keys, "left_anti")
        merged = kept.select(*cols).unionByName(
            df.dropDuplicates(keys).select(*cols)
        )
        pdf = merged.toPandas()  # mem engine: tiny tables by contract
        self._write_pdf(table, pdf)
        return df.count()

    def compact(self, table: str, cluster_by: tuple[str, ...] = ()) -> int:
        """Rewrite the table's current snapshot with ONE file per
        occupied bucket — the Delta OPTIMIZE analog for the bucketed
        layout. Merges deliberately do NOT coalesce (multiple part
        files per bucket preserve write parallelism and each rewrite
        replaces them wholesale, so counts never accumulate); compact
        is the explicit maintenance call for when a table's buckets
        have fragmented below efficient scan size. Upgrades a
        pre-bucketing snapshot to the bucketed layout as a side effect.
        Returns the number of part files in the new snapshot. No-op
        (returns 0) on an empty table or the mem engine (no files).

        ``cluster_by`` is the OPTIMIZE ZORDER analog: range-partition
        and sort the rewrite by the given NON-key columns so each part
        file covers a narrow value band and the zone-map sidecar
        (:meth:`scan_pruned`) can skip files on range predicates.
        Clustering trades file count for skippability: every range
        task writes into each bucket dir it holds rows for, so the
        snapshot has up to ``merge_buckets`` files per bucket instead
        of one — the standard layout tension between hash bucketing
        (key lookups) and value clustering (range scans)."""
        if self.path is None:
            return 0
        with self._write_lock:
            snap = self._snapshot_dir(table)
            if snap is None or not self._has_parquet(snap):
                return 0
            from pyspark.sql import functions as F

            schema = table_schema(table)
            df = _canon_select(self._read_snapshot(table, snap), schema).withColumn(
                "bkt", self._bkt(table)
            )
            nsnap, version = self._next_snapshot(table)
            if cluster_by:
                arranged = df.repartitionByRange(
                    self.merge_buckets, *[F.col(c) for c in cluster_by]
                ).sortWithinPartitions(*cluster_by)
            else:
                # one task per bucket -> one file per bucket
                arranged = df.repartition(self.merge_buckets, F.col("bkt"))
            arranged.write.mode("overwrite").partitionBy("bkt").parquet(nsnap)
            self._write_zone_manifest(nsnap, snap)
            self._commit_snapshot(table, version)
            return sum(
                1
                for _, _, fs in os.walk(nsnap)
                for f in fs
                if f.endswith(".parquet")
            )

    def delete_rows(self, table: str, key_values: list[tuple]) -> int:
        with self._write_lock:
            return self._delete_rows_locked(table, key_values)

    def _delete_rows_locked(self, table: str, key_values: list[tuple]) -> int:
        keys = key_columns(table)
        if self.path is not None:
            from pyspark.sql import functions as F
            from pyspark.sql.types import StructType

            schema = table_schema(table)
            key_schema = StructType([schema[k] for k in keys])
            doomed = self.spark.createDataFrame(
                [tuple(kv) for kv in key_values], key_schema
            )
            snap = self._snapshot_dir(table)
            if snap is None or not self._has_parquet(snap):
                return 0
            if not self._is_bucketed(snap):
                existing = self.table(table)
                removed = existing.join(doomed, keys, "left_semi").count()
                if removed:
                    self._write_df(table, existing.join(doomed, keys, "left_anti"))
                return removed
            # bucket-pruned delete: only the doomed keys' buckets are
            # scanned and rewritten; the rest hard-link across (same
            # shape as _merge_and_write). A touched bucket losing ALL
            # its rows simply produces no bkt dir — correct.
            touched = sorted(
                r["bkt"]
                for r in doomed.withColumn("bkt", self._bkt(table))
                .select("bkt")
                .distinct()
                .collect()
            )
            if not touched:
                return 0
            raw = self._read_snapshot(table, snap)
            scanned = _canon_select(
                raw.filter(F.col("bkt").isin(touched)), schema, extra=("bkt",)
            )
            removed = scanned.join(doomed, keys, "left_semi").count()
            if removed:
                nsnap, version = self._next_snapshot(table)
                scanned.join(doomed, keys, "left_anti").write.mode(
                    "overwrite"
                ).partitionBy("bkt").parquet(nsnap)
                self._link_untouched(snap, nsnap, touched)
                self._write_zone_manifest(nsnap, snap)
                self._commit_snapshot(table, version)
            return removed
        existing = self._read_pdf(table)
        if existing.empty:
            return 0
        mask = existing[keys].apply(tuple, axis=1).isin(set(key_values))
        removed = int(mask.sum())
        self._write_pdf(table, existing[~mask])
        return removed

    # -- meta KV (storage/embedded.go:194-228) ------------------------------

    def meta_get(self, key: str) -> str | None:
        if self.path is not None:
            # Fast path (r13 optimization, measured): no committed
            # snapshot means the table is empty, so every key is
            # absent — exactly what the Spark path below concludes by
            # collecting a filter over createDataFrame([], schema),
            # at the cost of a full job round-trip (~0.4 s). Shares
            # table()'s emptiness check via _table_has_no_snapshot
            # (ADVICE r13: one helper, so the two paths cannot drift);
            # every fresh-store open pays this via ensure_schema.
            if self._table_has_no_snapshot("mie_meta"):
                return None
            from pyspark.sql import functions as F

            hit = (
                self.table("mie_meta")
                .filter(F.col("key") == key)
                .select("value")
                .collect()
            )
            return None if not hit else str(hit[-1]["value"])
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

    def meta_touch(self, counter_key: str, ts_key: str, ts_value: str) -> int:
        """Counter increment + timestamp set as ONE snapshot write —
        usage recording runs on every tool call, and on a disk store
        each write is a Spark merge job, so batching the pair halves
        the per-call write cost."""
        with self._write_lock:
            current = self.meta_get(counter_key)
            value = (int(current) if current and current.isdigit() else 0) + 1
            self.upsert_rows(
                "mie_meta",
                [
                    {"key": counter_key, "value": str(value)},
                    {"key": ts_key, "value": str(ts_value)},
                ],
            )
            return value

    # -- snapshot pinning ---------------------------------------------------

    def _pin_file(self, table: str) -> str:
        assert self.path is not None
        return os.path.join(self.path, table, "_PINNED")

    def pinned_versions(self, table: str) -> list[str]:
        """Versions exempt from snapshot GC, oldest first."""
        if self.path is None:
            return []
        pf = self._pin_file(table)
        if not os.path.exists(pf):
            return []
        with open(pf) as fh:
            return [v for v in fh.read().split() if v]

    def pin_current(self, table: str) -> str | None:
        """Pin the table's current snapshot version so GC never deletes
        it (cozodb.go:174-201 Backup keeps a full point-in-time copy;
        pinning is the zero-copy equivalent on the versioned layout).
        Returns the pinned version, or None if the table has no data."""
        if self.path is None:
            return None  # mem engine: no snapshot files to pin
        with self._write_lock:
            snap = self._snapshot_dir(table)
            if snap is None:
                return None
            version = os.path.basename(snap)
            pins = self.pinned_versions(table)
            if version not in pins:
                pins.append(version)
                with open(self._pin_file(table), "w") as fh:
                    fh.write("\n".join(pins))
            return version

    def unpin(self, table: str, version: str) -> None:
        """Release a pin; the version becomes GC-eligible at the next
        commit (it is NOT deleted eagerly — a reader may hold it)."""
        if self.path is None:
            return
        with self._write_lock:
            pins = [v for v in self.pinned_versions(table) if v != version]
            pf = self._pin_file(table)
            if pins:
                with open(pf, "w") as fh:
                    fh.write("\n".join(pins))
            elif os.path.exists(pf):
                os.remove(pf)

    def diff_versions(self, table: str, v_from: str, v_to: str) -> DataFrame:
        """Row-level change feed between two snapshot versions — the
        Delta CDF analog on the versioned layout: a full-outer join on
        the table's key columns classifies every row as 'added',
        'removed', or 'changed' (non-key attributes differ), with the
        newer version's attributes for added/changed and the older
        version's for removed. Fully distributed — the join carries
        (keys, fingerprint) plus the projected attributes; nothing
        collects. Pair with pin_current so both endpoints survive GC.

        Change detection hashes the non-key columns (null-safe: a
        sha2 over '\\x01'-joined casts with an explicit null sentinel)
        rather than comparing column-by-column, so adding attributes
        to a table never changes this method."""
        from pyspark.sql import functions as F

        keys = key_columns(table)
        schema = table_schema(table)
        attrs = [f.name for f in schema if f.name not in keys]

        def fp(df: DataFrame) -> DataFrame:
            parts = [
                F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>"))
                for c in attrs
            ]
            return df.withColumn(
                "_fp", F.sha2(F.concat_ws("\x01", *parts), 256)
            )

        old = fp(self.table_at(table, v_from)).select(
            *[F.col(k).alias(f"_k_{k}") for k in keys],
            F.col("_fp").alias("_fp_old"),
            *[F.col(c).alias(f"_old_{c}") for c in attrs],
        )
        new = fp(self.table_at(table, v_to)).select(
            *[F.col(k).alias(f"_k_{k}") for k in keys],
            F.col("_fp").alias("_fp_new"),
            *[F.col(c).alias(f"_new_{c}") for c in attrs],
        )
        j = old.join(new, [f"_k_{k}" for k in keys], "full_outer")
        change = (
            F.when(F.col("_fp_old").isNull(), F.lit("added"))
            .when(F.col("_fp_new").isNull(), F.lit("removed"))
            .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        )
        out_attrs = [
            F.coalesce(F.col(f"_new_{c}"), F.col(f"_old_{c}")).alias(c)
            for c in attrs
        ]
        return (
            j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(
                "change",
                *[F.col(f"_k_{k}").alias(k) for k in keys],
                *out_attrs,
            )
        )

    # -- backup / restore (cozodb.go:174-232 Backup/Restore) ----------------

    def backup(self, dest: str) -> dict[str, str]:
        """Copy every table's current snapshot to ``dest`` as a named,
        self-contained backup (cozodb.go:174-201). Snapshot dirs are
        immutable once committed, so the copy is consistent; the write
        lock only fences the version *choice* (and GC) during the copy.
        Returns {table: version} for what was captured.

        The backup is plain parquet per table — readable by any engine,
        not just this store (the reference's backup is an opaque Cozo
        file; plain parquet is the lake-native improvement)."""
        with self._write_lock:
            os.makedirs(dest, exist_ok=True)
            manifest: dict[str, str] = {}
            for t in ALL_TABLES:
                tdest = os.path.join(dest, t)
                if self.path is not None:
                    snap = self._snapshot_dir(t)
                    if snap is None or not self._has_parquet(snap):
                        # re-using a backup dir: drop any stale copy of a
                        # table that is now empty, or restore would read it
                        shutil.rmtree(tdest, ignore_errors=True)
                        continue
                    # clear first — part-file names never collide across
                    # snapshots, so dirs_exist_ok would MERGE a previous
                    # backup's files into this one and corrupt restores
                    shutil.rmtree(tdest, ignore_errors=True)
                    shutil.copytree(snap, tdest)
                    manifest[t] = os.path.basename(snap)
                else:
                    pdf = self._read_pdf(t)
                    if pdf.empty:
                        # same dest-reuse rule as the parquet branch: a
                        # stale copy of a now-empty table must not linger
                        # for external parquet readers of the backup
                        shutil.rmtree(tdest, ignore_errors=True)
                        continue
                    # route through Spark so array columns serialize with
                    # the canonical schema, not pandas object guessing
                    self.table(t).write.mode("overwrite").parquet(tdest)
                    manifest[t] = "mem"
            import json as _json

            with open(os.path.join(dest, "_MANIFEST.json"), "w") as fh:
                _json.dump({"tables": manifest}, fh)
            return manifest

    def restore(self, src: str) -> dict[str, str]:
        """Replace the store's state with a backup's (cozodb.go:203-232).
        Tables present in the backup are committed as a NEW snapshot
        version (the versioned-write path — lazy readers opened before
        the restore keep their files); tables absent from the backup are
        cleared. Returns the {table: version} manifest restored."""
        import json as _json

        manifest_path = os.path.join(src, "_MANIFEST.json")
        if not os.path.exists(manifest_path):
            raise FileNotFoundError(f"not a mie backup (no _MANIFEST.json): {src}")
        with open(manifest_path) as fh:
            manifest = _json.load(fh)["tables"]
        # validate BEFORE touching any state: a manifest-listed table
        # whose directory is missing means a truncated/partial backup —
        # restoring it would silently wipe live data to empty
        broken = [
            t for t in manifest if not os.path.isdir(os.path.join(src, t))
        ]
        if broken:
            raise FileNotFoundError(
                f"backup at {src} is incomplete: manifest lists {broken} "
                "but the directories are missing"
            )
        with self._write_lock:
            for t in ALL_TABLES:
                tsrc = os.path.join(src, t)
                has_data = t in manifest and os.path.isdir(tsrc)
                if self.path is not None:
                    if has_data:
                        snap, version = self._next_snapshot(t)
                        shutil.copytree(tsrc, snap, dirs_exist_ok=True)
                        self._commit_snapshot(t, version)
                    elif self._snapshot_dir(t) is not None:
                        snap, version = self._next_snapshot(t)
                        os.makedirs(snap, exist_ok=True)  # empty snapshot
                        self._commit_snapshot(t, version)
                else:
                    if has_data:
                        pdf = self._read_snapshot(t, tsrc).toPandas()
                        self._write_pdf(t, pdf)
                    else:
                        self._mem.pop(t, None)
            self.ensure_schema()
            return manifest

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
