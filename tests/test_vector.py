"""Vector-search tests: ANN recall against the exact ranking (the
oracle can't grade approximate paths, so recall is asserted here) and
IVF training determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mie_spark.operators.vector import (
    ann_topk_ivf,
    ann_topk_lsh,
    cosine_topk,
    train_ivf_centroids,
)
from mie_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def _emb_and_query(spark):
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") != 0)
    q = list(
        load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    )
    return emb, q


def test_ivf_recall_at_10(spark):
    emb, q = _emb_and_query(spark)
    exact = {r["vec_id"] for r in cosine_topk(emb, "embedding", q, 10).collect()}
    approx = {
        r["vec_id"] for r in ann_topk_ivf(emb, "embedding", q, 10).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"


def test_lsh_recall_at_10(spark):
    emb, q = _emb_and_query(spark)
    exact = {r["vec_id"] for r in cosine_topk(emb, "embedding", q, 10).collect()}
    approx = {
        r["vec_id"]
        for r in ann_topk_lsh(emb, "embedding", q, 10, n_planes=4).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.3, f"LSH recall@10 too low: {recall}"


def test_ivf_centroids_deterministic(spark):
    emb, _ = _emb_and_query(spark)
    c1 = train_ivf_centroids(emb, "embedding", n_centroids=8, lloyd_iters=1)
    c2 = train_ivf_centroids(emb, "embedding", n_centroids=8, lloyd_iters=1)
    assert c1 == c2


def test_ivf_probe_widening_converges_to_exact(spark):
    """Probing every cell must equal the exact ranking — IVF is a pure
    partition-pruning optimization, not a different metric."""
    emb, q = _emb_and_query(spark)
    exact = [r["vec_id"] for r in cosine_topk(emb, "embedding", q, 10).collect()]
    full = [
        r["vec_id"]
        for r in ann_topk_ivf(
            emb, "embedding", q, 10, n_centroids=8, n_probe=8
        ).collect()
    ]
    assert exact == full


def test_self_join_expression_path_equals_blocked(spark, monkeypatch):
    """Past the broadcast-matrix size cap the self-join falls back to an
    expression join — force that path and require identical pairs."""
    import mie_spark.operators.vector as V

    emb = load_table(spark, SF, "embeddings")
    blocked = {
        (r["a_id"], r["b_id"]): round(r["sim"], 9)
        for r in V.similarity_self_join(emb, "embedding", threshold=0.45).collect()
    }
    monkeypatch.setattr(V, "_BLOCKED_MAX_CELLS", 0)
    expr = {
        (r["a_id"], r["b_id"]): round(r["sim"], 9)
        for r in V.similarity_self_join(emb, "embedding", threshold=0.45).collect()
    }
    assert set(blocked) == set(expr)
    for k in blocked:
        assert abs(blocked[k] - expr[k]) < 1e-6


def test_self_join_lsh_bucketed_recall(spark):
    """The bucketed (approximate) self-join must keep high recall on the
    strong pairs the exact join finds — at scale it's the only path
    whose shuffle stays sub-quadratic."""
    from mie_spark.operators.vector import similarity_self_join

    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r["a_id"], r["b_id"])
        for r in similarity_self_join(emb, "embedding", threshold=0.45).collect()
    }
    approx = {
        (r["a_id"], r["b_id"])
        for r in similarity_self_join(
            emb, "embedding", threshold=0.45, n_buckets=2
        ).collect()
    }
    assert approx <= exact  # never invents pairs (same exact filter)
    if exact:
        assert len(approx & exact) / len(exact) >= 0.5
