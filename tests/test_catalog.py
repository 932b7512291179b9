"""events.ts encoding dispatch (sources/catalog.py).

The corpus has shipped ``ts`` as TIMESTAMP(NANOS) (readable only via
legacy.parquet.nanosAsLong, arriving as long), as TIMESTAMP(MICROS)
without isAdjustedToUTC (arriving as TIMESTAMP_NTZ), and could ship as
plain UTC micros. A corpus re-encoding broke every events read
mid-round-3, so all three paths are pinned here against synthetic
parquet written with explicit pyarrow types: same rows in, identical
session-tz timestamps out.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mie_spark.sources.catalog import load_table, parquet_ts_is_nanos

_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 11, 12],
    "event_type": ["view", "click", "purchase"],
    "value": [1.0, 2.0, 3.0],
    "props": ["{}", "{}", "{}"],
}
_TIMES = [
    dt.datetime(2024, 3, 1, 12, 0, 0, 250000),
    dt.datetime(2024, 3, 1, 12, 30, 0, 500000),
    dt.datetime(2024, 3, 2, 9, 15, 30, 750000),
]


def _write_events(dirpath, ts_type) -> str:
    table = pa.table(
        {
            "event_id": pa.array(_ROWS["event_id"], pa.int64()),
            "ts": pa.array(_TIMES, ts_type),
            "user_id": pa.array(_ROWS["user_id"], pa.int64()),
            "event_type": pa.array(_ROWS["event_type"], pa.string()),
            "value": pa.array(_ROWS["value"], pa.float64()),
            "props": pa.array(_ROWS["props"], pa.string()),
        }
    )
    path = str(dirpath / "events.parquet")
    pq.write_table(table, path)
    return str(dirpath)


_EXPECTED = [t.strftime("%Y-%m-%d %H:%M:%S.%f") for t in _TIMES]


@pytest.mark.parametrize(
    "ts_type,is_nanos",
    [
        (pa.timestamp("ns"), True),  # TIMESTAMP(NANOS): nanosAsLong path
        (pa.timestamp("us"), False),  # MICROS / NTZ: cast path
        (pa.timestamp("us", tz="UTC"), False),  # UTC micros: passthrough
    ],
    ids=["nanos", "micros-ntz", "micros-utc"],
)
def test_ts_encodings_normalize_identically(spark, tmp_path, ts_type, is_nanos):
    sf_dir = _write_events(tmp_path, ts_type)
    assert parquet_ts_is_nanos(f"{sf_dir}/events.parquet") is is_nanos
    df = load_table(spark, sf_dir, "events")
    assert str(df.schema["ts"].dataType) == "TimestampType()"
    got = [
        r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
        for r in df.orderBy("event_id").collect()
    ]
    assert got == _EXPECTED
