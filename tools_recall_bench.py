"""V1 recall benchmark: LSH / IVF / IVF-PQ vs exact cosine top-k.

Closes VERDICT r5 item #5 — publish recall@10 and recall@50 at sf0.1
against the reference's HNSW operating point. The reference builds
HNSW with m=16, efConstruction=200 (pkg/memory/schema.go:145-152) and
searches with an ef = k*5 over-fetch (reader.go:63-69); typical
published HNSW recall@10 at that setting is ~0.95-0.99. This script
measures our three Spark-native ANN paths at their DEFAULT operating
points over N_QUERIES held-out queries and prints the table that
SCALE.md publishes; tests/test_vector.py pins floors slightly below
the measured numbers so a regression fails loudly.

Usage: python tools_recall_bench.py  [sf_dir]  (~2 min at sf0.1)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mie_spark.operators.hnsw import hnsw_topk
from mie_spark.operators.vector import (
    ann_topk_ivf,
    ann_topk_lsh,
    ann_topk_pq,
    cosine_topk,
    hamming_topk,
)
from mie_spark.sources import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = 20
KS = (10, 50)

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)

emb = load_table(spark, SF, "embeddings")
queries = {
    r["vec_id"]: list(r["embedding"])
    for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
}
corpus = emb.filter(F.col("vec_id") >= N_QUERIES).cache()
corpus.count()

VARIANTS = {
    "lsh (8 planes, multi-probe)": lambda q, k: ann_topk_lsh(
        corpus, "embedding", q, k
    ),
    "hamming (1-bit, cand=100)": lambda q, k: hamming_topk(
        corpus, "embedding", q, k, candidates=100
    ),
    "ivf (16 cells, probe 6)": lambda q, k: ann_topk_ivf(
        corpus, "embedding", q, k
    ),
    "ivf-pq (m=16, rerank 8x)": lambda q, k: ann_topk_pq(
        corpus, "embedding", q, k
    ),
    "hnsw (m=16, ef=200, 8 shards)": lambda q, k: hnsw_topk(
        corpus, "embedding", q, k
    ),
}

recalls: dict[tuple[str, int], list[float]] = {}
for qid, qvec in queries.items():
    for k in KS:
        exact = {r["vec_id"] for r in cosine_topk(corpus, "embedding", qvec, k).collect()}
        for name, fn in VARIANTS.items():
            got = {r["vec_id"] for r in fn(qvec, k).collect()}
            recalls.setdefault((name, k), []).append(len(got & exact) / k)

print(f"\nsf_dir={SF}  corpus={corpus.count()} vecs  queries={len(queries)}")
print(f"{'variant':<30} {'recall@10':>10} {'recall@50':>10}")
for name in VARIANTS:
    row = [sum(recalls[(name, k)]) / len(recalls[(name, k)]) for k in KS]
    print(f"{name:<30} {row[0]:>10.3f} {row[1]:>10.3f}")
