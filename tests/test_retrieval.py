"""Retrieval operators: BM25 scoring, top-k ranking, RRF fusion, and
the packing/mixing pipeline queries built on the same numeric stance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mie_spark.operators.retrieval import bm25_scores, rank_topk, rrf_fuse


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark engine"),          # heavy on one term
        (2, "spark hash"),                        # two terms, short doc
        (3, "spark hash " + "filler " * 50),      # same terms, long doc
        (4, "nothing relevant here at all"),      # no match
        (5, "hash"),                              # one term, shortest
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _scores(corpus, terms=("spark", "hash")):
    out = bm25_scores(corpus, list(terms))
    return {r["doc_id"]: r for r in out.collect()}


def test_bm25_matches_only(corpus):
    s = _scores(corpus)
    assert set(s) == {1, 2, 3, 5}  # doc 4 matches nothing
    assert s[2]["n_terms"] == 2 and s[5]["n_terms"] == 1


def test_bm25_length_normalization(corpus):
    # Same tf for both terms, but doc 3 is ~25x longer: BM25's length
    # normalization must score the short doc strictly higher.
    s = _scores(corpus)
    assert s[2]["score_u"] > s[3]["score_u"]


def test_bm25_tf_saturation(corpus):
    # tf=3 beats tf=1 for the same term and comparable length, but by
    # less than 3x (saturation).
    s = _scores(corpus, terms=("spark",))
    assert s[1]["score_u"] > s[2]["score_u"]
    assert s[1]["score_u"] < 3 * s[2]["score_u"]


def test_bm25_deterministic(corpus):
    a = {r["doc_id"]: r["score_u"] for r in bm25_scores(corpus, ["spark", "hash"]).collect()}
    b = {r["doc_id"]: r["score_u"] for r in bm25_scores(corpus, ["spark", "hash"]).collect()}
    assert a == b


def test_rank_topk_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(3, 100), (1, 100), (2, 200), (4, 50)], ["doc_id", "score_u"]
    )
    top = rank_topk(df, "score_u", "doc_id", 3).collect()
    assert [(r["doc_id"], r["rank"]) for r in top] == [(2, 1), (1, 2), (3, 3)]


def test_rrf_fuse_orders_and_handles_disjoint(spark):
    a = spark.createDataFrame([(10, 1), (11, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(11, 1), (12, 2)], ["doc_id", "rank"])
    fused = rrf_fuse([a, b], "doc_id", ("ra", "rb")).collect()
    by_id = {r["doc_id"]: r for r in fused}
    # doc 11 appears in both lists -> highest fused score
    assert fused[0]["doc_id"] == 11
    assert by_id[11]["rrf"] == pytest.approx(1 / 62 + 1 / 61)
    # single-list docs carry a null rank for the other list
    assert by_id[10]["rb"] is None and by_id[12]["ra"] is None
    assert by_id[10]["rrf"] == pytest.approx(1 / 61)


def test_pack_sequences_bins(spark):
    from mie_spark.queries import QUERIES

    out = (
        QUERIES["pipe_pack_sequences"](spark, "/root/testdata/sf0.001")
        .orderBy("source", "doc_id")
        .collect()
    )
    assert out, "packing produced no rows"
    prev_cum: dict[str, int] = {}
    for r in out:
        # offsets are contiguous per source in doc_id order
        assert r["tok_offset"] == prev_cum.get(r["source"], 0)
        prev_cum[r["source"]] = r["tok_offset"] + r["n_tokens"]
        assert r["first_seq"] == r["tok_offset"] // 256
        assert r["last_seq"] == (r["tok_offset"] + r["n_tokens"] - 1) // 256
        assert r["first_seq"] <= r["last_seq"]


def test_temperature_mix_boosts_small_sources(spark):
    from mie_spark.queries import QUERIES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = QUERIES["samp_temperature_mix"](spark, "/root/testdata/sf0.01")
    kept_counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # overall target is ~half the corpus
    assert sum(kept_counts.values()) == pytest.approx(0.5 * sum(totals.values()), rel=0.15)
    # keep-rate must not increase with source size (temperature boost)
    rates = [
        (totals[s], kept_counts.get(s, 0) / totals[s]) for s in totals
    ]
    rates.sort()
    if len(rates) >= 2 and rates[0][0] < rates[-1][0]:
        assert rates[0][1] >= rates[-1][1] - 0.05
