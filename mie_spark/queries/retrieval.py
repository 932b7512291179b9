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
