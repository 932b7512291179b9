"""Retrieval operators: BM25 keyword scoring and reciprocal-rank fusion.

The reference's query surface has two ranking modes — exact substring
match and semantic (vector) search (pkg/tools/query.go:32-41) — and
merges per-type result lists client-side (reader.go:110-118). These
operators are the corpus-scale generalization: BM25 replaces the
unranked substring filter with the standard probabilistic keyword
ranking, and RRF replaces the client-side merge with the standard
rank-fusion rule, so "hybrid search" (keyword + vector) becomes one
declarative plan instead of two sequential probes.

Numeric stance (cross-engine hash stability): per-(doc, term) BM25
contributions are rounded to exact integer micro-units and summed as
BIGINTs, so per-doc totals are identical in any summation order on any
engine; only the final display division touches floats (on identical
operands). Ranks are computed over the integer scores, so downstream
RRF reciprocals are reciprocals of identical integers.

Scale: tf is a (doc, term) aggregate with map-side combine — the
shuffle carries matched (doc, term) pairs only, never raw token
streams (the `isin` filter on the query's handful of terms pushes into
the explode). Document frequency aggregates to |terms| rows and
broadcast-joins back (a COUNT window partitioned by term — the
text_tfidf trick — would funnel each term's millions of rows through
one partition when the term list is this short). Corpus constants
(N, avgdl) are two scalars collected from a column-pruned
pre-aggregate; everything else is one pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mie_spark.operators.text import token_count, tokens

MICRO = 1_000_000


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    Returns (id_col, n_terms, score_u) — one row per document matching
    at least one term; ``score_u`` is the total score in integer
    micro-units (divide by 1e6 for display), ``n_terms`` the number of
    distinct query terms matched.

    Uses the Lucene-style non-negative idf ``ln(1 + (N-df+0.5)/(df+0.5))``
    so high-df terms degrade to ~0 instead of negative weights.

    One LAZY plan, no eager driver actions: the query-term filter runs
    on the token *array* BEFORE explode (only matching tokens ever
    become rows), the doc length rides along with tf (no join back to a
    length table), and the corpus constants (N, avgdl) and per-term
    document frequencies are 1-row / |terms|-row aggregates folded in
    as broadcasts. ``base`` (id, dl, matched-tokens — no text) is
    materialized once with a lazy localCheckpoint (r13, guide §2.4):
    its three consumers (stats, tf→scored, tf→df) otherwise each
    re-run the corpus scan + regex tokenize — the plan's most
    expensive stage — and the scan-level filter Catalyst infers for
    the explode evaluates the tokenize twice MORE per row
    (size(matched)>0 AND isnotnull(matched)). One tokenize pass
    instead of three scans × three evaluations; the checkpoint holds
    the narrow projection, which is what a production corpus run
    persists anyway (localCheckpoint doctrine, SCALE.md).
    """
    # lowercase the TERMS to match the lowercased token stream — a
    # caller passing 'Spark' would otherwise silently match nothing
    term_arr = F.array(*[F.lit(t.lower()) for t in terms])
    # NULL text must not enter the corpus stats: with ANSI off and
    # legacy sizeOfNull, F.size(NULL) is -1, which would count the doc
    # in N and SUBTRACT 1 from total dl — skewing avgdl and every
    # score. Excluding the row matches the oracle, whose NULL dl drops
    # out of sum() and can match no term.
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .withColumn("_toks", tokens(F.lower(F.col(text_col))))
        .select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.filter(
                "_toks", lambda x: F.array_contains(term_arr, x)
            ).alias("_matched"),
        )
    )
    base = base.localCheckpoint(eager=False)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    )
    tf = (
        base.select(id_col, "dl", F.explode("_matched").alias("tok"))
        .groupBy(id_col, "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf has exactly one row per (doc, term), so df is a |terms|-row
    # aggregate — broadcast it back instead of a window partitioned by
    # term (which would funnel each term's rows through one partition).
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    idf_u = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df_t") + F.lit(0.5))
            / (F.col("df_t") + F.lit(0.5))
        )
        * F.lit(float(MICRO)),
        0,
    ).cast("bigint")
    avgdl = F.col("total") / F.col("n")
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            _tf_saturation(F.col("tf"), F.col("dl"), k1, b, avgdl, idf_u).alias(
                "score_u"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("score_u").alias("score_u"),
    )


def _tf_saturation(
    tf: Column, dl: Column, k1: float, b: float, avgdl: Column, idf_u: Column
) -> Column:
    """idf_u × the BM25 tf-saturation factor, rounded to one exact
    BIGINT per (doc, term). The factor's operands are integers and
    shared exact-derivation doubles, so it is bit-identical across
    engines."""
    factor = (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
    )
    return F.round(idf_u * factor, 0).cast("bigint")


def rank_topk(
    df: DataFrame, score_col: str, id_col: str, k: int
) -> DataFrame:
    """Top-k by (integer score desc, id asc) with a 1-based ``rank``
    column. Truncates FIRST via orderBy().limit(k) — a distributed
    TakeOrderedAndProject heap — then assigns ranks with a window over
    only the k survivors, so no global-rank shuffle ever sees the full
    corpus. Deterministic because both sort keys are exact."""
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    top = df.orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_cols: Sequence[str] = ("rank_a", "rank_b"),
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists: full-outer-join on the
    document id, score = Σ 1/(k + rank) over the lists containing the
    doc. Each reciprocal is a function of one small integer, so the
    fused double is bit-identical across engines; ties broken by id.

    Returns (id_col, *rank_cols, rrf) sorted by rrf desc, id asc.
    """
    if len(rankings) != len(rank_cols):
        # a bare assert vanishes under python -O, after which zip would
        # silently truncate the longer sequence
        raise ValueError(
            f"{len(rankings)} rankings but {len(rank_cols)} rank_cols"
        )
    fused = None
    for df, rc in zip(rankings, rank_cols):
        part = df.select(F.col(id_col), F.col("rank").alias(rc))
        fused = part if fused is None else fused.join(part, id_col, "full_outer")
    rrf = None
    for rc in rank_cols:
        term = F.when(
            F.col(rc).isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col(rc))
        ).otherwise(F.lit(0.0))
        rrf = term if rrf is None else rrf + term
    return (
        fused.select(F.col(id_col), *rank_cols, rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    )
