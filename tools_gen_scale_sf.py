"""Generate a key-shifted 10x replica of the sf0.1 corpus for the
scale-curve measurement (VERDICT r9 #2) — NOT graded data, purely a
timing corpus. Writes to .scale/sf1/ (gitignored; ~10x sf0.1 bytes).

Replication rules (designed so per-query work scales like a real 10x
corpus rather than degenerating):

- region/nation: dimensions, copied once (real corpora don't grow
  their country list 10x).
- customer/supplier/part/orders/lineitem/events: 10 key-shifted copies
  (every FK shifted consistently), so joins/groupBys see 10x keys at
  the same per-key cardinality and graph queries see 10x nodes at the
  same degree distribution.
- documents: 10 copies; copy i>0 renames every token t -> "t~i", so
  WITHIN a copy all shingle/jaccard/near-dup structure (the planted
  pairs) is preserved exactly while CROSS-copy similarity is zero —
  without this, exact duplicates across copies would make pair
  generation O(copies^2) per doc and the dedup curve would measure
  data degeneracy, not plan scaling.
- embeddings: 10 copies; copy i>0 adds deterministic N(0, 0.05) noise
  (seed = copy) so ANN structure is 10 independent corpora rather
  than every vector having 9 exact twins.

Usage: python tools_gen_scale_sf.py [copies] [dst] [only]
  copies: replica count (default 10 -> sf1)
  dst:    output dir (default /root/repo/.scale/sf1)
  only:   comma-separated table subset (default: all) — the sf10 curve
          (VERDICT r10 #3) needs only documents+embeddings at 100
          copies, so: `python tools_gen_scale_sf.py 100
          /root/repo/.scale/sf10 documents,embeddings`
"""

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def _wanted(t: str) -> bool:
    return ONLY is None or t in ONLY

SHIFTS = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {
        "l_orderkey": 1_000_000,
        "l_partkey": 100_000,
        "l_suppkey": 10_000,
    },
    "events": {"event_id": 1_000_000, "user_id": 1_000_000},
}


def main() -> None:
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        if not _wanted(t):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, shifts in SHIFTS.items():
        if not _wanted(t):
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            proj = ", ".join(
                f"({c} + {i * k})::BIGINT AS {c}"
                if (k := shifts.get(c))
                else c
                for c in cols
            )
            selects.append(
                f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "done")

    if _wanted("documents"):
        _documents(con)
    _embeddings(con)
    _verify(con)


def _documents(con) -> None:
    # documents: token-renamed copies (see module docstring)
    n_docs = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    selects = [f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"]
    for i in range(1, COPIES):
        selects.append(f"""
          SELECT (doc_id + {i * n_docs})::BIGINT AS doc_id,
                 list_aggregate(
                   list_transform(
                     list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
                                 x -> x <> ''),
                     x -> x || '~{i}'),
                   'string_agg', ' ') AS text,
                 lang, source,
                 0::BIGINT AS n_chars
          FROM read_parquet('{SRC}/documents.parquet')
        """)
    con.execute(f"""
      COPY (
        SELECT doc_id, text, lang, source,
               length(text)::BIGINT AS n_chars
        FROM ({' UNION ALL '.join(selects)})
      ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)
    print("documents done")


def _embeddings(con) -> None:
    if not _wanted("embeddings"):
        return
    # embeddings: noise-perturbed copies
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_numpy()
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    n = len(vec_ids)
    out_ids, out_labels, out_vecs = [vec_ids], [labels], [mat]
    for i in range(1, COPIES):
        rng = np.random.RandomState(1000 + i)
        out_ids.append(vec_ids + i * n)
        out_labels.append(labels)
        out_vecs.append(
            (mat + rng.randn(*mat.shape).astype(np.float32) * 0.05)
        )
    big = pa.table(
        {
            "vec_id": np.concatenate(out_ids),
            "embedding": pa.array(
                np.concatenate(out_vecs).tolist(),
                type=pa.list_(pa.float32()),
            ),
            "label": np.concatenate(out_labels).astype(np.int32),
        }
    )
    pq.write_table(big, f"{DST}/embeddings.parquet")
    print("embeddings done")


def _verify(con) -> None:
    # End-of-run row-count verification for EVERY table this run
    # generated — lives in main()'s straight-line flow, not inside
    # _embeddings(), so an `only` subset that excludes embeddings
    # still verifies the tables it DID write (ADVICE r11).
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        if not _wanted(t):
            continue
        cnt = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {cnt} rows")


if __name__ == "__main__":
    main()
