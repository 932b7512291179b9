"""Dedup query coverage (north-star LLM-pipeline operators) over the
``documents`` corpus. The corpus plants 25 near-duplicate pairs at
shingle-Jaccard ≈0.99 with everything else <0.1, so threshold 0.5
separates cleanly and the LSH path (verified candidates) provably
matches the exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
)
from mie_spark.operators.text import simhash64
from mie_spark.queries import query
from mie_spark.sources import load_table

# Exact Jaccard over 3-gram word shingles via inverted-index join —
# shared oracle for both the exact and the MinHash-LSH entry.
_JACCARD_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
           ELSE []::VARCHAR[] END) AS s
  FROM toks
), inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         any_value(a.n) AS a_n, any_value(b.n) AS b_n, count(*) AS common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, round(common::DOUBLE / (a_n + b_n - common), 6) AS jaccard
FROM pairs
WHERE common::DOUBLE / (a_n + b_n - common) >= 0.5
"""


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT content_hash, cnt FROM (
      SELECT sha256(text) AS content_hash, count(*) AS cnt
      FROM (SELECT text FROM documents UNION ALL SELECT text FROM documents)
      GROUP BY 1
    ) WHERE cnt > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash. The corpus has no byte-identical
    dups, so the input is the corpus unioned with itself (a dirty
    double-ingest) — every group must come back with cnt=2. The shuffle
    carries (hash, id), never document bodies."""
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)
    return exact_duplicates(doubled, "doc_id").select("content_hash", "cnt")


@query(
    "dedup_keep_one",
    oracle="""
    SELECT count(*) AS n_unique FROM (
      SELECT DISTINCT text
      FROM (SELECT text FROM documents UNION ALL SELECT text FROM documents)
    )
    """,
)
def dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mie_spark.operators.dedup import dedup_exact

    docs = load_table(spark, sf_dir, "documents").select("text")
    doubled = docs.unionByName(docs)
    return dedup_exact(doubled).agg(F.count(F.lit(1)).alias("n_unique"))


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs; inverted-index join, never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return pairs.select(
        "a_id", "b_id", F.round("jaccard", 6).alias("jaccard")
    )


@query("dedup_minhash_lsh", oracle=_JACCARD_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) → 16×4 banded LSH → exact-Jaccard verification.
    Oracle-checked against the *exact* pair list: at the corpus's
    planted j≈0.99, P(LSH miss) = (1-0.99⁴)¹⁶ ≈ 1e-22, so approximate
    candidate generation + exact verification equals the exact answer.
    This is the 100 TB path: signatures shuffle, documents don't."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.5
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


# The oracle recomputes the SAME 60-bit signature (md5-prefix shingle
# hash — engine-portable by construction, see operators/text.SIMHASH_BITS)
# and then does the all-pairs scan DuckDB-side; the Spark plan instead
# bands the signature (pigeonhole-exact, zero CartesianProduct — pinned
# in tests/test_plans) yet must produce the identical pair list.
_SIMHASH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
           ELSE []::VARCHAR[] END) AS s
  FROM toks
), inv AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
h AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hv FROM inv
), bits AS (
  SELECT doc_id, b.b,
         sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS sm
  FROM h, (SELECT unnest(range(60)) AS b) b
  GROUP BY 1, 2
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN sm > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END)::BIGINT AS simhash
  FROM bits GROUP BY 1
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
"""


@query("dedup_simhash_pairs", oracle=_SIMHASH_ORACLE)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ 7 of 60 bits, via pigeonhole
    banding (8 bands ⇒ perfect recall at ≤7, no all-pairs join). The
    corpus plants near-dups at ≤7 bits apart with everything else ≥15
    at sf0.01, so the banded candidates + exact hamming filter return
    exactly the planted pair list — which the all-pairs DuckDB oracle
    confirms bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash64(docs, "doc_id", "text", n=3)
    return simhash_candidate_pairs(
        sigs, max_hamming=7, id_col="doc_id", sig_col="simhash"
    )


# --- embedding-cosine near-duplicate detection ------------------------------

@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT b.vec_id AS dup_id, min(a.vec_id) AS keep_id
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
    GROUP BY b.vec_id
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: any vector similar (>= 0.45) to a
    lower-id vector is a duplicate; canonical survivor = the smallest
    such partner. Completes the dedup family (exact / minhash-LSH /
    simhash / n-gram-jaccard / embedding-cosine). The pair scan is
    similarity_self_join's auto dispatch: exact blocked BLAS at every
    graded scale (the cell cap covers ~250k 64-dim vectors — all the
    sf dirs), banded-LSH candidates past the cap, where the exact
    oracle itself could no longer run either. The 0.45 threshold sits
    in the banded path's weak-recall regime, so above the cap this
    query's contract is explicitly approximate (see the operator's
    CALLER CONTRACT note)."""
    from mie_spark.operators.vector import similarity_self_join

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity_self_join(emb, "embedding", threshold=0.45)
    return pairs.groupBy(F.col("b_id").alias("dup_id")).agg(
        F.min("a_id").alias("keep_id")
    )


# --- dedup clusters: near-dup pairs → connected components ------------------

# THE pair-detection + transitive-closure recomputation (exact-Jaccard
# pairs at threshold 0.5 via inverted-index join, closure as a recursive
# CTE) — shared WITH-chain prefix for every oracle that grades a query
# built on near-dup clusters: pipe_dedup_clusters appends the cluster
# readout, pipe_keep_best extends the chain with survivor selection.
# One copy, so a threshold or shingle change cannot desynchronize the
# two ground truths.
_CLOSURE_CTE = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
           ELSE []::VARCHAR[] END) AS s
  FROM toks
), inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         any_value(a.n) AS a_n, any_value(b.n) AS b_n, count(*) AS common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pr AS (
  SELECT a_id, b_id FROM pairs
  WHERE common::DOUBLE / (a_n + b_n - common) >= 0.5
), e AS (
  SELECT u, v FROM (
    SELECT a_id AS u, b_id AS v FROM pr
    UNION ALL
    SELECT b_id AS u, a_id AS v FROM pr
  ) t
), reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) t
  UNION
  SELECT e.v, r.r FROM reach r JOIN e ON e.u = r.node
)
"""

_CLUSTER_ORACLE = (
    _CLOSURE_CTE
    + "SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node"
)


@query("pipe_dedup_clusters", oracle=_CLUSTER_ORACLE)
def pipe_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment — the step after pair detection that
    production dedup actually needs (A~B~C must collapse to ONE
    survivor even when A~C was never directly detected): MinHash-LSH
    pairs feed the generic iterative connected-components operator;
    cluster id = min doc_id in the component. The oracle recomputes the
    same thing independently: exact-Jaccard pairs via inverted-index
    join, then transitive closure as a recursive CTE. Two pair
    algorithms, two closure algorithms, one hash."""
    from mie_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", threshold=0.5)
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    cc = connected_components(edges)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# Shared between pipe_decontaminate and its streaming twin
# st_decontaminate (queries/streaming.py) — ONE SQL text grades both,
# the _JACCARD_ORACLE doctrine.
_DECONTAMINATE_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 8
               THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                     t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
                     FOR i IN range(1, len(t) - 6)]
               ELSE []::VARCHAR[] END) AS s
      FROM toks
    ), inv AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    bench AS (SELECT DISTINCT shingle FROM inv WHERE doc_id < 100)
    SELECT i.doc_id, count(DISTINCT i.shingle) AS n_shared
    FROM inv i JOIN bench b ON i.shingle = b.shingle
    WHERE i.doc_id >= 100
    GROUP BY 1
    """


@query("pipe_decontaminate", oracle=_DECONTAMINATE_ORACLE)
def pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the pipeline step that keeps eval
    data out of training corpora: flag any corpus document sharing an
    8-token shingle with the benchmark set (docs 0-99 stand in for the
    held-out suite; the corpus's planted near-dup pairs straddle the
    boundary, so hits exist). Plan: inverted-index join of corpus
    shingles against the DISTINCT benchmark shingles, broadcast —
    real benchmark suites are tiny next to a 100 TB corpus, so the
    corpus never shuffles; contamination is a map-side hash probe."""
    from mie_spark.operators.text import shingles_from_tokens, tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toked.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("toks"), 8)).alias("shingle"),
    )
    bench = sh.filter(F.col("doc_id") < 100).select("shingle").distinct()
    corpus = sh.filter(F.col("doc_id") >= 100)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").cast("long").alias("n_shared"))
    )


@query(
    "dedup_incremental",
    oracle=r"""
    WITH tagged AS (
      SELECT doc_id, source, text,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INTEGER AS bucket,
             sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    existing AS (SELECT DISTINCT fp FROM tagged WHERE bucket < 192),
    new_batch AS (
      SELECT * FROM tagged WHERE bucket >= 192
      UNION ALL
      SELECT * FROM tagged WHERE bucket < 16   -- re-crawl overlap: dups
    )
    SELECT n.source,
           count(*) AS n_new,
           CAST(sum(CASE WHEN e.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_already_seen,
           CAST(sum(CASE WHEN e.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel
    FROM new_batch n LEFT JOIN existing e ON n.fp = e.fp
    GROUP BY n.source
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the shape of every production corpus
    build after day one — a NEW batch arrives and must be deduped
    against the EXISTING corpus, not against itself. The corpus splits
    deterministically (md5 bucket of doc_id): buckets <192 are the
    existing corpus, >=192 the fresh batch, and buckets <16 are
    re-ingested as a simulated re-crawl overlap, so the already-seen
    path carries real nonzero counts. The new batch left-joins the
    existing fingerprint set and reports a per-source novelty census.

    At 100 TB the existing side is a fingerprint-only table (32-byte
    sha256 + nothing else — the index, not the corpus), so the join
    shuffles tiny keys; with the fingerprint table bucketed by fp the
    probe becomes co-partitioned and shuffle-free on the index side.
    The same plan upgrades from exact to near-dup by swapping the
    fingerprint for MinHash band keys (dedup_minhash_lsh's generator) —
    the join topology is identical. The reference's analog is the
    per-item new-content probe (client.check_conflicts_for_content,
    conflicts.go:73-154); this is its corpus-scale batch form."""
    from mie_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = docs.select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp"),
        bucket.alias("bucket"),
    )
    existing = tagged.filter(F.col("bucket") < 192).select("fp").distinct()
    new_batch = tagged.filter(F.col("bucket") >= 192).unionByName(
        tagged.filter(F.col("bucket") < 16)
    )
    seen = F.when(F.col("e_fp").isNotNull(), 1).otherwise(0)
    return (
        new_batch.join(
            existing.select(F.col("fp").alias("e_fp")),
            new_batch["fp"] == F.col("e_fp"),
            "left",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(seen).alias("n_already_seen"),
            F.sum(1 - seen).alias("n_novel"),
        )
    )


@query(
    "dedup_exact_substring",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, len(t) AS n_tokens, i AS pos,
             t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' ||
             t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] || ' ' || t[i+8] AS g
      FROM toks, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ), dup_grams AS (
      SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ), dup_pos AS (
      SELECT doc_id, n_tokens, pos FROM grams JOIN dup_grams USING (g)
    ), isl AS (
      SELECT doc_id, n_tokens, pos,
             sum(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (SELECT doc_id, n_tokens, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dup_pos)
    ), spans AS (
      SELECT doc_id, n_tokens, island, max(pos) + 8 - min(pos) AS covered
      FROM isl GROUP BY 1, 2, 3
    )
    SELECT doc_id, n_tokens::BIGINT AS n_tokens,
           count(*) AS n_dup_spans,
           sum(covered)::BIGINT AS dup_tokens,
           round(sum(covered)::BIGINT / n_tokens::BIGINT, 6) AS dup_ratio
    FROM spans GROUP BY doc_id, n_tokens
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication census (the span-level dedup family:
    flag any 8-token window that also occurs in another document, merge
    overlapping flagged windows into maximal spans). Document-level
    near-dup (MinHash et al.) misses a boilerplate paragraph pasted
    into otherwise-unique pages; this catches exactly the pasted span.

    Plan shape (the 100 TB story): positional gram hashes are one JVM
    array expression per doc; the exploded index is (doc, pos, hash64)
    longs; gram document-frequency is a groupBy on the hash; only
    duplicated grams join back; span merging is one gaps-and-islands
    window keyed by doc. The oracle recomputes everything from scratch
    on gram STRINGS (the Spark side joins on xxhash64 of the gram — a
    collision would show up here as a hash mismatch)."""
    from mie_spark.operators.dedup import exact_substring_stats

    docs = load_table(spark, sf_dir, "documents")
    stats = exact_substring_stats(docs, "doc_id", "text", k=8, min_df=2)
    return stats.withColumnRenamed("doc", "doc_id")


def _semantic_oracle() -> str:
    from mie_spark.operators.dedup import srp_planes

    planes = srp_planes(4, 64)
    bits = " + ".join(
        "(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"{p}::DOUBLE[]) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, ({bits}) AS bucket
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS a_id, b2.vec_id AS b_id, a.bucket,
             list_dot_product(a.v, b2.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b2.v, b2.v))) AS cosine
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    )
    SELECT a_id, b_id, bucket, round(cosine, 6) AS cosine
    FROM pairs WHERE cosine >= 0.4
    """


@query("dedup_semantic", oracle=_semantic_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup: assign every embedding to a
    cluster (deterministic sign-random-projection bucket standing in
    for the usual k-means), then find cosine >= 0.4 pairs ONLY within
    each cluster — the topology that makes semantic dedup tractable at
    100 TB (quadratic cost per cluster, never corpus-wide; boundary
    pairs are the accepted recall trade, here 19 of 24 corpus-wide
    pairs survive at sf0.01). The oracle recomputes bucket + cosine
    from the same literal hyperplane constants, so this approximate
    operator is still hash-graded exactly. Cosine margins to every
    decision boundary (sign flip, threshold, rounding) are >= 1e-4 —
    nine orders above double noise — so the float filter is stable
    across engines."""
    from mie_spark.operators.dedup import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(
        emb, "vec_id", "embedding", dims=64, n_planes=4, threshold=0.4
    )


# keep-best survivor selection: the shared closure chain extended with
# a clusters CTE, then one window picks the best doc per cluster
_KEEP_BEST_ORACLE = (
    _CLOSURE_CTE
    + """, clusters AS (
  SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
)
SELECT c.doc_id, c.cluster_id,
       first_value(c.doc_id) OVER (
         PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id
       ) AS survivor_id,
       c.doc_id = first_value(c.doc_id) OVER (
         PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id
       ) AS keep
FROM clusters c JOIN documents d USING (doc_id)
"""
)


@query("pipe_keep_best", oracle=_KEEP_BEST_ORACLE)
def pipe_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection — the step AFTER near-dup clustering that a
    production pipeline actually ships: within each near-dup cluster
    keep the highest-quality member (here: longest by n_chars,
    deterministic doc_id tiebreak) and mark the rest for drop. Cluster
    assignment reuses the MinHash-LSH → connected-components path;
    survivor choice is one window over the (tiny) clustered subset.
    The keep/drop list is what downstream filtering joins against —
    at 100 TB it is broadcast back against the corpus as an anti-join,
    the same topology as pipe_decontaminate."""
    from mie_spark.operators.graph import connected_components
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", threshold=0.5)
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    cc = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    enriched = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    survivor = F.first("doc_id").over(w)
    return enriched.select(
        "doc_id",
        "cluster_id",
        survivor.alias("survivor_id"),
        (F.col("doc_id") == survivor).alias("keep"),
    )


# --- record linkage: blocked edit-distance matching -----------------------

@query(
    "dedup_fuzzy_names",
    oracle="""
    WITH dirty AS (
      SELECT p_partkey,
             substr(p_name, 1, ('0x' || substr(md5(p_partkey::VARCHAR), 1, 4))
                                 ::INTEGER % length(p_name))
             || substr(p_name, ('0x' || substr(md5(p_partkey::VARCHAR), 1, 4))
                                 ::INTEGER % length(p_name) + 2) AS dirty_name
      FROM part
    ),
    clean AS (SELECT DISTINCT p_name AS clean_name FROM part)
    SELECT c.clean_name, count(*) AS n_matched
    FROM dirty d JOIN clean c
      ON length(c.clean_name) = length(d.dirty_name) + 1
     AND levenshtein(d.dirty_name, c.clean_name) <= 1
    GROUP BY c.clean_name
    """,
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage / entity resolution: link DIRTY records (here a
    deterministic one-character deletion at an md5-derived position —
    the reproducible stand-in for OCR/typo noise, same portable
    hex-prefix rule as samp_hash_split) back to the clean catalog by
    edit distance, BLOCKED so the match never goes all-pairs.

    The block key is exact-length (clean = dirty + 1): Catalyst
    extracts the length equality as a hash-join key, so the plan is an
    equi-join whose per-block candidate lists are small, with
    levenshtein evaluated only INSIDE blocks — the standard blocking
    decomposition of record linkage. At 100 TB the block key grows to
    (length band, char n-gram signature) with the same plan shape; the
    edit-distance predicate stays a JVM expression either way (both
    engines implement classical Levenshtein, so the matched multiset
    is engine-exact). Output: per-clean-name match counts."""
    p = load_table(spark, sf_dir, "part")
    dirty = p.select(
        F.concat(
            F.expr("substring(p_name, 1, "
                   "CAST(conv(substring(md5(CAST(p_partkey AS STRING)), 1, 4), 16, 10) AS INT)"
                   " % length(p_name))"),
            F.expr("substring(p_name, "
                   "CAST(conv(substring(md5(CAST(p_partkey AS STRING)), 1, 4), 16, 10) AS INT)"
                   " % length(p_name) + 2)"),
        ).alias("dirty_name")
    )
    clean = p.select(F.col("p_name").alias("clean_name")).dropDuplicates()
    matched = dirty.join(
        clean,
        (F.length("clean_name") == F.length("dirty_name") + 1)
        & (F.levenshtein("dirty_name", "clean_name") <= 1),
    )
    return matched.groupBy("clean_name").agg(F.count(F.lit(1)).alias("n_matched"))


_CONTAINMENT_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
           ELSE []::VARCHAR[] END) AS s
  FROM toks
), inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
pairs AS (
  SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
         any_value(a.n) AS n_src, count(*) AS common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT src_id, dst_id, common::BIGINT AS common, n_src::BIGINT AS n_src,
       round(common::DOUBLE / n_src, 6) AS containment
FROM pairs
WHERE common * 5 >= 4 * n_src
"""


@query("dedup_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric subset-duplication: docs whose shingle set is >= 80%
    contained in another doc — the near-dup mode Jaccard misses when a
    short doc is embedded in a long one (union-dominated denominator).
    Same inverted-index candidate generation as dedup_ngram_jaccard;
    both orientations of each unordered candidate are checked IN-ROW
    (explode of two structs, no second join), integer cross-multiplied
    cut (5*common >= 4*|src|). The oracle states it as the ordered
    a<>b join; the Spark plan halves that join with a<b + the in-row
    direction flip — identical pair list."""
    from mie_spark.operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


# --- URL canonicalization dedup ---------------------------------------------

@query(
    "dedup_url_canon",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             lower(source) || '.example.com' AS h,
             '/docs/' || (doc_id // 4)::VARCHAR AS bp,
             'a=1&b=' || ((doc_id // 4) % 7)::VARCHAR AS q,
             doc_id % 4 AS v,
             (doc_id // 4)::VARCHAR AS p
      FROM documents
    ),
    urls AS (
      SELECT doc_id,
             CASE v
               WHEN 0 THEN 'https://' || h || bp || '?' || q
               WHEN 1 THEN 'HTTPS://' || upper(h) || ':443' || bp
                           || '?b=' || ((doc_id // 4) % 7)::VARCHAR
                           || '&a=1#sec-' || p
               WHEN 2 THEN 'https://' || h || bp || '/?' || q
                           || '&utm_source=feed'
               ELSE 'https://' || h || ':443' || bp
                    || '?utm_campaign=x&' || q
             END AS url
      FROM raw
    ),
    parts AS (
      SELECT doc_id, url,
             string_split(url, '#')[1] AS no_frag
      FROM urls
    ),
    split1 AS (
      SELECT doc_id, url,
             lower(regexp_extract(no_frag, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(no_frag, '^[A-Za-z]+://', '') AS rest
      FROM parts
    ),
    split2 AS (
      SELECT *, string_split(rest, '/')[1] AS hostport,
             substr(rest, length(string_split(rest, '/')[1]) + 1) AS pathq
      FROM split1
    ),
    split3 AS (
      SELECT doc_id, url, scheme,
             CASE WHEN scheme = 'https'
                  THEN regexp_replace(lower(hostport), ':443$', '')
                  WHEN scheme = 'http'
                  THEN regexp_replace(lower(hostport), ':80$', '')
                  ELSE lower(hostport) END AS host,
             CASE WHEN strpos(pathq, '?') > 0
                  THEN substr(pathq, 1, strpos(pathq, '?') - 1)
                  ELSE pathq END AS path0,
             CASE WHEN strpos(pathq, '?') > 0
                  THEN substr(pathq, strpos(pathq, '?') + 1)
                  ELSE '' END AS qs
      FROM split2
    ),
    canon AS (
      SELECT doc_id, url,
             scheme || '://' || host
             || CASE WHEN path0 = '' THEN '/'
                     WHEN length(path0) > 1 AND path0 LIKE '%/'
                     THEN substr(path0, 1, length(path0) - 1)
                     ELSE path0 END
             || CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canon_url
      FROM (
        SELECT *,
               list_aggregate(
                 list_sort(list_filter(string_split(qs, '&'),
                           x -> x <> '' AND NOT starts_with(x, 'utm_'))),
                 'string_agg', '&') AS cq
        FROM split3
      ) t
    )
    SELECT canon_url,
           count(*) AS n_variants,
           count(DISTINCT url) AS n_raw_forms,
           min(doc_id) AS keeper_doc
    FROM canon
    GROUP BY canon_url
    HAVING count(*) >= 2
    """,
)
def dedup_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the first dedup pass of every web
    crawl: the same resource fetched as `HTTPS://HOST:443/x?b=2&a=1#f`,
    `.../x/?a=1&b=2&utm_source=feed`, etc. collapses to one canonical
    form (lowercase scheme+host, default port stripped, fragment
    dropped, trailing slash trimmed, utm_* tracking params removed,
    remaining params sorted). Variant URLs are derived
    deterministically from doc_id (4 variants per group of 4 docs) on
    BOTH engines; the canonicalizer is implemented independently on
    each — Spark as pure JVM column expressions (regexp/split/
    array_sort/array_join, whole-stage codegen, NO udf), DuckDB as its
    list/regex analogs — so the hash grades the canonicalization
    semantics themselves.

    Plan: map-only derive+canonicalize fused into the scan, ONE
    groupBy over canonical strings (map-side combined), HAVING on the
    count. At 100 TB this is the textbook shuffle-light dedup: the
    shuffle carries (canon_url, partial counts), never raw page
    text."""
    docs = load_table(spark, sf_dir, "documents")
    p = (F.col("doc_id") / 4).cast("long")  # doc_id >= 0: floor == trunc
    pv = F.col("doc_id") % 4
    h = F.concat(F.lower("source"), F.lit(".example.com"))
    bp = F.concat(F.lit("/docs/"), p.cast("string"))
    q = F.concat(F.lit("a=1&b="), (p % 7).cast("string"))
    url = (
        F.when(pv == 0, F.concat(F.lit("https://"), h, bp, F.lit("?"), q))
        .when(
            pv == 1,
            F.concat(
                F.lit("HTTPS://"),
                F.upper(h),
                F.lit(":443"),
                bp,
                F.lit("?b="),
                (p % 7).cast("string"),
                F.lit("&a=1#sec-"),
                p.cast("string"),
            ),
        )
        .when(
            pv == 2,
            F.concat(
                F.lit("https://"), h, bp, F.lit("/?"), q, F.lit("&utm_source=feed")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), h, F.lit(":443"), bp, F.lit("?utm_campaign=x&"), q
            )
        )
    )
    base = docs.select("doc_id", url.alias("url"))
    no_frag = F.element_at(F.split(F.col("url"), "#"), 1)
    base = base.withColumn("no_frag", no_frag)
    base = base.withColumn(
        "scheme", F.lower(F.regexp_extract("no_frag", "^([A-Za-z]+)://", 1))
    ).withColumn("rest", F.regexp_replace("no_frag", "^[A-Za-z]+://", ""))
    base = base.withColumn(
        "hostport", F.element_at(F.split(F.col("rest"), "/", 2), 1)
    ).withColumn("pathq", F.expr("substr(rest, length(hostport) + 1)"))
    host = F.when(
        F.col("scheme") == "https",
        F.regexp_replace(F.lower("hostport"), ":443$", ""),
    ).when(
        F.col("scheme") == "http",
        F.regexp_replace(F.lower("hostport"), ":80$", ""),
    ).otherwise(F.lower("hostport"))
    qpos = F.instr("pathq", "?")
    base = (
        base.withColumn("host", host)
        .withColumn(
            "path0",
            F.when(qpos > 0, F.expr("substr(pathq, 1, instr(pathq, '?') - 1)"))
            .otherwise(F.col("pathq")),
        )
        .withColumn(
            "qs",
            F.when(qpos > 0, F.expr("substr(pathq, instr(pathq, '?') + 1)"))
            .otherwise(F.lit("")),
        )
    )
    cq = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.col("qs"), "&"),
                lambda x: (x != "") & ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    path_c = (
        F.when(F.col("path0") == "", F.lit("/"))
        .when(
            (F.length("path0") > 1) & F.col("path0").endswith("/"),
            F.expr("substr(path0, 1, length(path0) - 1)"),
        )
        .otherwise(F.col("path0"))
    )
    canon = base.select(
        "doc_id",
        "url",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            path_c,
            F.when(cq == "", F.lit("")).otherwise(F.concat(F.lit("?"), cq)),
        ).alias("canon_url"),
    )
    return (
        canon.groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.count_distinct("url").alias("n_raw_forms"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .filter(F.col("n_variants") >= 2)
    )
