"""Retrieval queries: BM25 keyword ranking and hybrid keyword+vector
search fused by reciprocal rank.

This generalizes the reference's query modes (exact substring vs
semantic vector search, pkg/tools/query.go:32-41) into the standard
corpus-scale retrieval stack: BM25 turns the unranked substring filter
into a probabilistic ranking, and RRF replaces the client-side
per-type merge (reader.go:110-118) with the standard rank-fusion rule
— both as single declarative plans, both exactly oracle-checked via
integer micro-unit scores (see operators/retrieval.py for the numeric
stance and the scale shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.operators.retrieval import bm25_scores, rank_topk, rrf_fuse
from mie_spark.queries import query
from mie_spark.sources import load_table

# Fixed bag-of-words query for the oracle-checked entries; df for every
# term is non-zero at sf0.001/0.01/0.1.
TERMS = ["spark", "hash", "merge", "window"]

# Shared oracle CTE: BM25 in integer micro-units. Mirrors
# operators/retrieval.py expression-for-expression — every float op
# runs on identical operands in the same order on both engines, and
# per-doc totals are BIGINT sums of per-(doc,term) BIGINTs.
_BM25_CTE = r"""
    dl AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS dl
      FROM documents WHERE text IS NOT NULL
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS total FROM dl
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM tok
      WHERE tok IN ('spark', 'hash', 'merge', 'window')
      GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, count(*) AS df_t FROM tf GROUP BY tok),
    idf AS (
      SELECT tok,
             CAST(round(ln(1.0 + (stats.n - df_t + 0.5) / (df_t + 0.5))
                        * 1000000.0, 0) AS BIGINT) AS idf_u
      FROM dfreq, stats
    ),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(idf_u * ((tf * (1.2 + 1.0)) /
                   (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl /
                                (SELECT total / n FROM stats)))), 0)
                  AS BIGINT) AS score_u
      FROM tf
      JOIN idf USING (tok)
      JOIN dl USING (doc_id)
    ),
    bm25 AS (
      SELECT doc_id, count(*) AS n_terms, sum(score_u)::BIGINT AS score_u
      FROM scored GROUP BY doc_id
    )
"""


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH {_BM25_CTE}
    SELECT doc_id, n_terms,
           round(score_u / 1000000.0, 6) AS score
    FROM bm25
    ORDER BY score_u DESC, doc_id LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed bag of query terms (k1=1.2, b=0.75,
    Lucene-style non-negative idf). The ranked-keyword-search upgrade of
    the reference's ExactSearch substring filter (reader.go:138-162)."""
    docs = load_table(spark, sf_dir, "documents")
    scores = bm25_scores(docs, TERMS)
    top = rank_topk(scores, "score_u", "doc_id", 20)
    return top.select(
        "doc_id",
        "n_terms",
        F.round(F.col("score_u") / F.lit(1e6), 6).alias("score"),
    )


@query(
    "text_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTE},
    kw AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score_u DESC, doc_id) AS rank_kw
      FROM bm25 ORDER BY score_u DESC, doc_id LIMIT 50
    ),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    sem0 AS (
      SELECT vec_id AS doc_id,
             CAST(round(list_cosine_similarity(embedding::DOUBLE[], qe)
                        * 1000000.0, 0) AS BIGINT) AS sim_u
      FROM embeddings, q WHERE vec_id <> 0
    ),
    sem AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY sim_u DESC, doc_id) AS rank_sem
      FROM sem0 ORDER BY sim_u DESC, doc_id LIMIT 50
    )
    SELECT COALESCE(kw.doc_id, sem.doc_id) AS doc_id,
           kw.rank_kw, sem.rank_sem,
           round(
             (CASE WHEN kw.rank_kw IS NOT NULL
                   THEN 1.0 / (60.0 + kw.rank_kw) ELSE 0.0 END)
             + (CASE WHEN sem.rank_sem IS NOT NULL
                     THEN 1.0 / (60.0 + sem.rank_sem) ELSE 0.0 END),
             6) AS rrf
    FROM kw FULL OUTER JOIN sem ON kw.doc_id = sem.doc_id
    """,
)
def text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword top-50 and cosine-similarity
    top-50 (query = stored embedding of vec_id 0, the same "embed the
    query" step as the reference's semantic mode, reader.go:53-60),
    fused by reciprocal rank (k=60). Both ranks are computed over exact
    integer scores AFTER top-k truncation, so the fusion is
    deterministic and the full corpus never sees a global-rank shuffle.
    This is the one-plan replacement for the reference's two sequential
    probes + client-side merge."""
    from mie_spark.functions.vectors import cosine_sim

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])

    kw = rank_topk(bm25_scores(docs, TERMS), "score_u", "doc_id", 50)
    sem_scored = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_sim(F.col("embedding"), q) * F.lit(1e6), 0)
            .cast("bigint")
            .alias("sim_u"),
        )
    )
    sem = rank_topk(sem_scored, "sim_u", "doc_id", 50)
    fused = rrf_fuse([kw, sem], "doc_id", ("rank_kw", "rank_sem"), k=60)
    return fused.select(
        "doc_id", "rank_kw", "rank_sem", F.round("rrf", 6).alias("rrf")
    )


_QLIST = "['spark', 'hash', 'merge', 'window']"


@query(
    "v_rerank_ce",
    oracle=f"""
    WITH {_BM25_CTE},
    cand AS (
      SELECT doc_id FROM bm25 ORDER BY score_u DESC, doc_id LIMIT 50
    ),
    toks2 AS (
      SELECT d.doc_id,
             list_filter(string_split_regex(lower(d.text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents d JOIN cand USING (doc_id)
    ),
    feat AS (
      SELECT doc_id,
             len(list_filter({_QLIST}, q -> list_contains(t, q)))::BIGINT
               AS cov,
             least(999, len(list_filter(range(1, len(t)),
                   i -> list_contains({_QLIST}, t[i])
                    AND list_contains({_QLIST}, t[i + 1]))))::BIGINT AS prox,
             least(999,
                   len(list_filter(t, x -> list_contains({_QLIST}, x))
                  ))::BIGINT AS tfq
      FROM toks2
    ),
    ce AS (
      SELECT doc_id, cov, prox, tfq,
             (1000000 * cov + 1000 * prox + tfq)::BIGINT AS ce_u
      FROM feat
    )
    SELECT doc_id, cov, prox, tfq, ce_u FROM (
      SELECT *, row_number() OVER (ORDER BY ce_u DESC, doc_id) AS rn
      FROM ce
    ) WHERE rn <= 10
    """,
)
def v_rerank_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-style second-stage rerank (VERDICT r9 stretch):
    the BM25 top-50 candidate pool is re-scored by a JOINT
    (query, document) scorer running as an Arrow-batched mapInPandas
    stage — the exact shape of a production reranker, where this
    function body would call the model on each pair (the repo's
    annotate_corpus/mock-provider stage does precisely that for
    labeling). The mock scorer is deterministic integer late
    interaction, so the whole two-stage pipeline hash-grades:
    ce_u = 1e6·coverage + 1e3·proximity + tf, with
    coverage = distinct query terms present (the AND-ness BM25 dilutes
    at high tf), proximity = adjacent token pairs that are both query
    terms (a joint feature NO per-term bag scorer — BM25 included —
    can see; this is what cross-attention buys), tf = capped total
    query-term occurrences.

    Plan/scale: stage 1 is the BM25 aggregate + TakeOrderedAndProject
    (corpus-sized, JVM); stage 2 touches only the 50-row pool — the
    candidate ids broadcast-semi-prune the documents scan, and the
    Python boundary moves 50 (id, text) rows once. At 100 TB the
    reranker cost is O(pool), not O(corpus) — which is the entire point
    of retrieve-then-rerank."""
    import re as _re
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from mie_spark.operators.text import TOKEN_SPLIT_RE

    docs = load_table(spark, sf_dir, "documents")
    cand = rank_topk(bm25_scores(docs, TERMS), "score_u", "doc_id", 50)
    # The pool is k-bounded (50 rows) by construction — collect the ids
    # and push them as an IN filter INTO the documents scan (PushedFilters
    # shows In(doc_id, ...)); a broadcast-semi-join subtree here adds a
    # whole broadcast-exchange job for 50 ids and benches noisier.
    pool_ids = [r["doc_id"] for r in cand.select("doc_id").collect()]
    pool = docs.filter(F.col("doc_id").isin(pool_ids)).select(
        "doc_id", "text"
    )

    qterms = set(TERMS)
    split = _re.compile(TOKEN_SPLIT_RE)
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("cov", LongType()),
            StructField("prox", LongType()),
            StructField("tfq", LongType()),
            StructField("ce_u", LongType()),
        ]
    )

    def score_pairs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one batch of (query, doc) pairs per Arrow chunk — the model
        # forward pass would happen here, batched exactly like this
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = [w for w in split.split((text or "").lower()) if w]
                cov = len(qterms.intersection(t))
                prox = min(
                    999,
                    sum(
                        1
                        for a, b in zip(t, t[1:])
                        if a in qterms and b in qterms
                    ),
                )
                tfq = min(999, sum(1 for w in t if w in qterms))
                rows.append(
                    (
                        int(doc_id),
                        cov,
                        prox,
                        tfq,
                        1_000_000 * cov + 1_000 * prox + tfq,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "cov", "prox", "tfq", "ce_u"]
            )

    scored = pool.mapInPandas(score_pairs, schema=out_schema)
    return scored.orderBy(F.col("ce_u").desc(), "doc_id").limit(10)
