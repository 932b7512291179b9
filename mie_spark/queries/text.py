"""Text-analysis query coverage (north-star LLM-pipeline operators)
over the ``documents`` corpus: token stats, quality filtering,
fingerprinting, token histograms, language ID.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.operators.text import (
    avg_token_len,
    fingerprint,
    joined_ngrams,
    lang_id_frame,
    token_count,
    tokens,
    type_token_ratio,
)
from mie_spark.functions.numeric import int_div
from mie_spark.queries import query
from mie_spark.sources import load_table


@query(
    "text_token_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_uniq,
           round(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS ttr,
           round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 6)
             AS avg_token_len
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical-diversity features, all array
    expressions inside whole-stage codegen — the per-document feature
    pass a quality pipeline runs over every shard."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        token_count(text).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens(text))).cast("long").alias("n_uniq"),
        F.round(type_token_ratio(text), 6).alias("ttr"),
        F.round(avg_token_len(text), 6).alias("avg_token_len"),
    )


@query(
    "text_quality_filter",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, lang, len(toks) AS n_tokens,
           round(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS ttr
    FROM t
    WHERE len(toks) BETWEEN 30 AND 1000
      AND len(list_distinct(toks))::DOUBLE / len(toks) > 0.25
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-based quality gate (length band + minimum lexical
    diversity) — the shape of a Gopher/C4-style rule filter."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tok = token_count(text)
    ttr = type_token_ratio(text)
    return (
        docs.filter((n_tok >= 30) & (n_tok <= 1000) & (ttr > 0.25))
        .select(
            "doc_id",
            "lang",
            n_tok.cast("long").alias("n_tokens"),
            F.round(ttr, 6).alias("ttr"),
        )
    )


@query(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (document identity for dedup
    bookkeeping; plays the role of the reference's deterministic
    content-hash IDs, ids.go:16-20)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@query(
    "text_token_histogram",
    oracle=r"""
    SELECT tok, count(*) AS freq
    FROM (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
      FROM documents
    )
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency (vocabulary building): explode →
    groupBy → top-k. Partial aggregation keeps the shuffle at
    |vocab| rows, not |tokens|."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(20)
    )


@query(
    "text_lang_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang AS labeled_lang, text,
             list_transform(
               list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
               x -> lower(x)) AS tok
      FROM documents
    ),
    s AS (
      SELECT doc_id, labeled_lang,
        [
          {'lang': 'en', 'score': len(list_filter(tok, x -> list_contains(
             ['the','a','and','of','to','is','in','that','it','for'], x)))::DOUBLE
             / greatest(len(tok), 1)},
          {'lang': 'es', 'score': len(list_filter(tok, x -> list_contains(
             ['el','la','de','que','y','en','un','por','con','los'], x)))::DOUBLE
             / greatest(len(tok), 1)},
          {'lang': 'fr', 'score': len(list_filter(tok, x -> list_contains(
             ['le','la','de','et','les','des','un','une','est','dans'], x)))::DOUBLE
             / greatest(len(tok), 1)},
          {'lang': 'de', 'score': len(list_filter(tok, x -> list_contains(
             ['der','die','das','und','ist','von','mit','den','ein','nicht'], x)))::DOUBLE
             / greatest(len(tok), 1)},
          {'lang': 'zh', 'score': length(regexp_replace(text, '[^一-鿿]', '', 'g'))::DOUBLE
             / greatest(length(text), 1)}
        ] AS scores
      FROM t
    )
    SELECT doc_id,
           CASE WHEN list_max(list_transform(scores, x -> x.score)) > 0
                THEN list_filter(scores, x -> x.score =
                       list_max(list_transform(scores, y -> y.score)))[1].lang
                ELSE 'und' END AS predicted_lang,
           labeled_lang
    FROM s
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/script-profile language ID. The oracle replicates the
    same tiny profiles in DuckDB SQL (struct-list argmax with identical
    first-wins tie order), so even the heuristic is hash-checked —
    both engines compute hit-rate = int/int in IEEE double, so scores
    agree bitwise. Behavior additionally pinned on known multilingual
    strings in tests. Output is doc_id + predicted lang + the corpus
    label for side-by-side accuracy reads. Since r13 the engine side
    is the single-evaluation lang_id_frame (6.6 -> 0.5 s at sf0.1,
    values bit-identical — see the operator docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    return lang_id_frame(
        docs.select("doc_id", "text", F.col("lang").alias("labeled_lang"))
    ).select("doc_id", "predicted_lang", "labeled_lang")


# THE corpus-cleaning definition (en filter, 30..1000 token band,
# TTR > 0.25, first-doc_id-wins exact dedup on normalized fingerprint)
# — single source of truth for both pipeline queries that build on it:
# pipe_clean_corpus and pipe_training_manifest. The oracle CTE and the
# Spark helper below MUST stay in lockstep; that is the point of there
# being exactly one of each (same convention as events._SESSIONS_CTE).
_CLEAN_CORPUS_CTE = r"""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      FROM documents WHERE lang = 'en'
    ), quality AS (
      SELECT doc_id, source, len(toks) AS n_tokens, fp
      FROM t
      WHERE len(toks) BETWEEN 30 AND 1000
        AND len(list_distinct(toks))::DOUBLE / len(toks) > 0.25
    ), deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    )
"""


def _clean_corpus(docs: DataFrame) -> DataFrame:
    """Spark twin of ``_CLEAN_CORPUS_CTE``: language filter → rule
    quality gate → exact dedup on the normalized fingerprint (first
    doc_id survives). Returns (doc_id, source, n_tokens, fp) with the
    lang filter pushed into the scan; the dedup window is the only
    shuffle."""
    from pyspark.sql.window import Window

    text = F.col("text")
    n_tok = token_count(text)
    ttr = type_token_ratio(text)
    quality = docs.filter(F.col("lang") == "en").filter(
        (n_tok >= 30) & (n_tok <= 1000) & (ttr > 0.25)
    ).select(
        "doc_id", "source", n_tok.alias("n_tokens"), fingerprint(text).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "pipe_clean_corpus",
    oracle=_CLEAN_CORPUS_CTE
    + """
    SELECT source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
    FROM deduped GROUP BY source
    """,
)
def pipe_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep pipeline in ONE lazy plan:
    language filter → rule-based quality gate → exact dedup on the
    normalized fingerprint (first doc_id survives) → per-source corpus
    manifest. Everything stays JVM-side; the lang filter pushes down to
    the parquet scan, and the dedup window + final aggregate are the
    only shuffles. This is the composition story: the same operators
    exposed individually (text_quality_filter, dedup_exact,
    text_fingerprint) fused by Catalyst when chained."""
    deduped = _clean_corpus(load_table(spark, sf_dir, "documents"))
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "text_bpe_tokens",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS n_bpe,
           len(list_distinct(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))) AS n_uniq_bpe
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (restricted to the Java∩RE2 syntax so the SAME pattern runs on both
    engines) — the cheap, distributable stand-in for exact tokenizer
    counts when budgeting a 100 TB corpus."""
    from mie_spark.operators.text import bpe_tokens

    docs = load_table(spark, sf_dir, "documents")
    t = bpe_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_bpe"),
        F.size(F.array_distinct(t)).cast("long").alias("n_uniq_bpe"),
    )


@query(
    "text_tfidf",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
    dfx AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
    n AS (SELECT count(*)::DOUBLE AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, dfx.df,
             tf.tf * round(ln(n.n / dfx.df), 6) AS score
      FROM tf JOIN dfx ON tf.tok = dfx.tok CROSS JOIN n
    )
    SELECT doc_id, tok, tf, df, round(score, 6) AS tfidf
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, tok
      ) AS rn FROM scored
    ) WHERE rn <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document, entirely as DataFrame ops (the
    MLlib HashingTF/IDF shape, but exact terms instead of hashed
    buckets, so it is SQL-oracle-checkable). idf is rounded to 6dp
    BEFORE the tf product on both engines so the rank-order comparison
    never hinges on sub-ulp ln() differences.

    Scale: three shuffles total — the tf aggregate on (doc_id, tok)
    with map-side partial aggregation, then document frequency as a
    COUNT window over tf partitioned by tok (one shuffle of the
    already-aggregated |tf| rows, replacing the groupBy(tok) + shuffle
    join pair that would cost two), then the per-doc ranking window."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = float(docs.count())
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # tf holds one row per (doc, tok), so count(*) per tok partition ==
    # countDistinct(doc) over raw tokens — df lands as a column without
    # any join, and the window shuffles |tf| rows, never raw tokens
    wdf = Window.partitionBy("tok")
    scored = tf.select(
        "doc_id",
        "tok",
        "tf",
        F.count(F.lit(1)).over(wdf).alias("df"),
    ).select(
        "doc_id",
        "tok",
        "tf",
        "df",
        (F.col("tf") * F.round(F.log(F.lit(n_docs) / F.col("df")), 6)).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df", F.round("score", 6).alias("tfidf"))
    )


def _unigram_tf_scored(docs: DataFrame) -> DataFrame:
    """Shared unigram-LM scoring core for text_unigram_logprob and
    pipe_quality_buckets: tf per (doc_id, tok) plus the per-row integer
    micro-nat NLL of that token under the corpus unigram model.

    The corpus total is folded in lazily as a broadcast 1-row aggregate
    of the SAME tf subtree — the oracle's `total AS (SELECT sum(tf)
    FROM tf)` — instead of an eager float(tok.count()): the tf shuffle
    exchange canonicalizes identically on both sides, so ReuseExchange
    evaluates tokenize+explode+aggregate once, where the eager count()
    paid a full extra corpus scan (the plan's most expensive stage) just
    to collect a scalar before the real job even started."""
    from pyspark.sql.window import Window

    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    total = tf.agg(F.sum("tf").cast("double").alias("_total"))
    w = Window.partitionBy("tok")
    nllu = F.round(
        -F.log(F.sum("tf").over(w) / F.col("_total")) * F.lit(1e6), 0
    ).cast("bigint")
    return tf.crossJoin(F.broadcast(total)).select(
        "doc_id", "tf", nllu.alias("nllu")
    )


@query(
    "text_unigram_logprob",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
    total AS (SELECT sum(tf)::DOUBLE AS total FROM tf),
    scored AS (
      SELECT doc_id, tf,
             CAST(round(-ln((sum(tf) OVER (PARTITION BY tok)) / total.total)
                        * 1000000.0, 0) AS BIGINT) AS nllu
      FROM tf CROSS JOIN total
    )
    SELECT doc_id,
           sum(tf)::BIGINT AS n_tokens,
           round(sum(tf * nllu)::BIGINT / sum(tf)::BIGINT / 1000000.0, 6)
             AS avg_nll,
           round(exp(round(sum(tf * nllu)::BIGINT / sum(tf)::BIGINT
                           / 1000000.0, 6)), 2) AS ppl
    FROM scored GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring — the classic perplexity-style
    quality signal for training-data filtering: train p(tok) =
    corpus_count/total on the corpus itself, score each document by the
    mean negative log-likelihood of its tokens (and report exp(·) as
    perplexity). High ppl ⇒ rare-token-heavy (boilerplate/garbage),
    low ⇒ repetitive.

    Numeric stance: the per-token -ln p is rounded to micro-nats and
    carried as an exact BIGINT, so the per-doc sum is integer
    arithmetic — identical across engines regardless of summation
    order — and only the final division/round touches floats (on
    identical operands). DuckDB sums of BIGINT widen to HUGEINT, hence
    the ::BIGINT casts in the oracle.

    Scale: same shape as text_tfidf — tf aggregate on (doc_id, tok)
    with map-side combine, corpus counts as a SUM window over tf
    partitioned by tok (|tf| rows shuffled, never raw tokens), one
    final per-doc aggregate. The LM "model" is never materialized on
    the driver; total token count is the only scalar collected."""
    docs = load_table(spark, sf_dir, "documents")
    scored = _unigram_tf_scored(docs)
    agg = scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("nllu")).alias("s"),
    )
    avg = F.round(F.col("s") / F.col("n_tokens") / F.lit(1e6), 6)
    return agg.select(
        "doc_id",
        "n_tokens",
        avg.alias("avg_nll"),
        F.round(F.exp(avg), 2).alias("ppl"),
    )


@query(
    "text_repeat_ngrams",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tok
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(tok) >= 3
                  THEN [tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
                        for i in range(1, len(tok) - 1)]
                  ELSE [] END AS tri
      FROM t
    )
    SELECT doc_id,
           len(tri) AS n_tri,
           len(list_distinct(tri)) AS n_uniq_tri,
           round(1.0 - len(list_distinct(tri))::DOUBLE / len(tri), 6)
             AS rep_ratio
    FROM g WHERE len(tri) > 0
    """,
)
def text_repeat_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: the share of word trigrams that are
    duplicates of an earlier trigram in the SAME document — the
    boilerplate/spam signal corpus-cleaning pipelines threshold on
    (templated pages repeat internally long before they collide with
    other documents). Pure array expressions per row: no explode, no
    shuffle — at 100 TB this is a map-only pass the scan fuses."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    tri = joined_ngrams(F.col("tok"), 3)
    g = toked.select("doc_id", tri.alias("tri")).filter(F.size("tri") > 0)
    return g.select(
        "doc_id",
        F.size("tri").cast("long").alias("n_tri"),
        F.size(F.array_distinct("tri")).cast("long").alias("n_uniq_tri"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("tri")).cast("double") / F.size("tri"),
            6,
        ).alias("rep_ratio"),
    )


@query(
    "pipe_training_manifest",
    oracle=_CLEAN_CORPUS_CTE
    + """
    SELECT source,
           CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INTEGER < 192
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens
    FROM deduped
    GROUP BY 1, 2
    """,
)
def pipe_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-build composition in ONE lazy plan: language
    filter → rule quality gate → exact dedup on normalized fingerprint
    → deterministic 75/25 hash split → per-(source, split) manifest.
    Each stage is an operator exposed elsewhere (text_quality_filter,
    dedup via fingerprint window, samp_hash_split); chained, Catalyst
    fuses the row-local stages into the scan and the plan still has
    only the dedup window + final aggregate shuffles."""
    from mie_spark.operators.sampling import hash_split

    deduped = _clean_corpus(load_table(spark, sf_dir, "documents"))
    split = hash_split(deduped, "doc_id", train_frac=0.75)
    return split.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "text_redact_pii",
    oracle=r"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR
                  || '@mail.example.com at 10.0.' || (doc_id % 200)::VARCHAR
                  || '.7 or 555-010-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               AS text
      FROM documents
    )
    , s1 AS (  -- sequential count: pattern i runs on text with patterns < i redacted
      SELECT doc_id, text,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c_email,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      FROM dirty
    ), s2 AS (
      SELECT doc_id, c_email,
             len(regexp_extract_all(t1,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c_ip,
             regexp_replace(t1,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
      FROM s1
    )
    SELECT doc_id,
           c_email + c_ip
           + len(regexp_extract_all(t2, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b'))
             AS n_pii,
           sha256(
             regexp_replace(t2, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g')
           ) AS redacted_sha
    FROM s2
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the hygiene pass before corpus text leaves
    quarantine. The corpus is synthetic, so deterministic PII (an
    email, an IP, a phone number derived from doc_id) is injected
    on BOTH engines first; the oracle then hash-compares the redacted
    bytes (sha256) and the span counts, proving the Java-regex and
    RE2 evaluations of the shared pattern subset agree exactly. Pure
    scan-fused regexp_replace chain — no shuffle, no UDF."""
    from mie_spark.operators.text import pii_count, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com at 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7 or 555-010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return dirty.select(
        "doc_id",
        pii_count(F.col("text")).cast("long").alias("n_pii"),
        F.sha2(redact_pii(F.col("text")), 256).alias("redacted_sha"),
    )


@query(
    "pipe_pack_sequences",
    oracle=r"""
    WITH dl AS (
      SELECT source, doc_id,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM dl WHERE n_tokens > 0
    )
    SELECT source, doc_id, n_tokens,
           cum - n_tokens AS tok_offset,
           (cum - n_tokens) // 256 AS first_seq,
           (cum - 1) // 256 AS last_seq
    FROM c
    """,
)
def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard pretraining
    batch-prep step: documents are laid end-to-end in a deterministic
    order and cut into fixed 256-token training sequences; each doc
    reports its token offset and the first/last sequence it lands in.

    Packing is inherently sequential, so the scale trick is WHERE the
    sequence is: packing runs independently per source shard (PARTITION
    BY source), which is exactly how production pipelines shard packing
    — one global pack would serialize the corpus through one partition.
    All integer window math (cumulative sum + shift-right bin split),
    so the oracle match is exact by construction. The reference has no
    batch-prep surface at all (SURVEY §2.11); this is a north-star
    training-pipeline addition."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select(
        "source",
        "doc_id",
        token_count(F.lower(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = dl.withColumn("cum", F.sum("n_tokens").over(w))
    return c.select(
        "source",
        "doc_id",
        "n_tokens",
        (F.col("cum") - F.col("n_tokens")).alias("tok_offset"),
        F.shiftright(F.col("cum") - F.col("n_tokens"), 8).alias("first_seq"),
        F.shiftright(F.col("cum") - F.lit(1), 8).alias("last_seq"),
    )


PACK_BESTFIT_ORACLE = r"""
    WITH RECURSIVE dl AS (
      SELECT source, doc_id,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> ''))::BIGINT AS n_tokens
      FROM documents
    ),
    d AS (
      SELECT source, doc_id, n_tokens,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_tokens DESC, doc_id)::BIGINT AS rn
      FROM dl WHERE n_tokens > 0 AND n_tokens <= 256
    ),
    grp AS (SELECT source, max(rn) AS mx FROM d GROUP BY source),
    ffd AS (
      SELECT source, 0::BIGINT AS rn, NULL::BIGINT AS doc_id,
             NULL::BIGINT AS n_tokens, NULL::BIGINT AS bin,
             NULL::BIGINT AS bin_offset, []::BIGINT[] AS bins
      FROM grp
      UNION ALL
      SELECT f.source, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN list_position(list_transform(f.bins,
                        x -> x + d.n_tokens <= 256), true) = 0
                  THEN len(f.bins)::BIGINT
                  ELSE (list_position(list_transform(f.bins,
                        x -> x + d.n_tokens <= 256), true) - 1)::BIGINT
             END AS bin,
             CASE WHEN list_position(list_transform(f.bins,
                        x -> x + d.n_tokens <= 256), true) = 0
                  THEN 0::BIGINT
                  ELSE f.bins[list_position(list_transform(f.bins,
                        x -> x + d.n_tokens <= 256), true)]::BIGINT
             END AS bin_offset,
             CASE WHEN list_position(list_transform(f.bins,
                        x -> x + d.n_tokens <= 256), true) = 0
                  THEN list_append(f.bins, d.n_tokens)
                  ELSE list_transform(f.bins, (x, i) ->
                        CASE WHEN i = list_position(list_transform(f.bins,
                              x2 -> x2 + d.n_tokens <= 256), true)
                             THEN x + d.n_tokens ELSE x END)
             END AS bins
      FROM ffd f JOIN d ON d.source = f.source AND d.rn = f.rn + 1
    )
    SELECT source, doc_id, n_tokens, bin, bin_offset
    FROM ffd WHERE rn > 0
    """


def pack_token_census(docs: DataFrame) -> DataFrame:
    """The (source, doc_id, n_tokens) census FFD packs over — shared
    by the batch manifest and its streaming twin (st_pack_bestfit):
    per-doc token counts are deterministic, so the max() fold is
    idempotent under micro-batch replay (the st_ab_test doctrine), and
    the window filter runs map-side before any state."""
    dl = docs.select(
        "source",
        "doc_id",
        token_count(F.lower(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter((F.col("n_tokens") > 0) & (F.col("n_tokens") <= 256))
    return dl.groupBy("source", "doc_id").agg(
        F.max("n_tokens").alias("n_tokens")
    )


def ffd_from_census(census: DataFrame) -> DataFrame:
    """First-fit-decreasing packing of a (source, doc_id, n_tokens)
    census into 256-token windows — the shared final projection of
    pipe_pack_bestfit and st_pack_bestfit (same code, same oracle).

    First-fit = LEFTMOST bin with room, found through a min-segment
    tree over bin occupancies (O(log B) per doc instead of the O(B)
    linear probe — the probe is O(docs x bins) per shard, ~150M
    comparisons per shard by sf10). Placements are IDENTICAL to the
    linear probe by construction: "leftmost bin with occupancy
    <= cap - n" IS first-fit, and the recursive-CTE oracle replays
    exactly that rule."""
    import pandas as pd

    CAP = 256

    class _MinTree:
        """Fixed-capacity segment tree over bin occupancies supporting
        leftmost_leq(x) — the smallest bin index whose occupancy is
        <= x — and point updates. Capacity doubles by rebuild when the
        bin count outgrows it (amortized O(1) per append)."""

        def __init__(self) -> None:
            self.cap = 1024
            self.tree = [0] * (2 * self.cap)  # all-zero = empty bins
            self.n = 0  # bins allocated so far

        def _grow(self) -> None:
            old_vals = self.tree[self.cap : self.cap + self.n]
            self.cap *= 2
            self.tree = [0] * (2 * self.cap)
            for i, v in enumerate(old_vals):
                self.tree[self.cap + i] = v
            for i in range(self.cap - 1, 0, -1):
                self.tree[i] = min(self.tree[2 * i], self.tree[2 * i + 1])

        def leftmost_leq(self, x: int, bound: int) -> int:
            """Smallest index i < bound with value <= x, else bound.
            Unallocated leaves hold 0 <= x always, so cap the walk by
            `bound` (the allocated bin count)."""
            if bound == 0 or self.tree[1] > x:
                return bound
            i = 1
            while i < self.cap:
                i *= 2
                if self.tree[i] > x:
                    i += 1
            idx = i - self.cap
            return idx if idx < bound else bound

        def add(self, idx: int, delta: int) -> None:
            if idx >= self.cap:
                self._grow()
            if idx >= self.n:
                self.n = idx + 1
            i = self.cap + idx
            self.tree[i] += delta
            i //= 2
            while i:
                self.tree[i] = min(self.tree[2 * i], self.tree[2 * i + 1])
                i //= 2

        def get(self, idx: int) -> int:
            if idx >= self.n or idx >= self.cap:
                return 0  # unallocated bin: empty by definition
            return self.tree[self.cap + idx]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        tree = _MinTree()
        n_bins = 0
        out_bin: list[int] = []
        out_off: list[int] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            idx = tree.leftmost_leq(CAP - n, n_bins)  # first fit
            if idx == n_bins:
                n_bins += 1
            out_bin.append(idx)
            out_off.append(tree.get(idx))
            tree.add(idx, n)
        return pd.DataFrame(
            {
                "source": pdf["source"],
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "bin": out_bin,
                "bin_offset": out_off,
            }
        )

    return census.groupBy("source").applyInPandas(
        pack,
        schema="source string, doc_id long, n_tokens long, "
        "bin long, bin_offset long",
    )


@query("pipe_pack_bestfit", oracle=PACK_BESTFIT_ORACLE)
def pipe_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence-packing manifest (VERDICT r11
    item #8) — the OTHER packing discipline next to
    pipe_pack_sequences' concat-and-chunk: documents that fit a fixed
    256-token window whole are BIN-PACKED (sorted by token count
    descending, doc_id tiebreak, each doc into the first window with
    room) so no document is ever split across training sequences —
    the packing used when cross-document attention contamination
    matters. Docs longer than the window stay with the chunker
    (pipe_pack_sequences); empty docs are dropped. Output is the
    manifest a loader replays: (source, doc_id, n_tokens, bin,
    bin_offset), all exact BIGINTs.

    Packing is inherently sequential, so the scale shape is the
    pipe_pack_sequences doctrine: FFD runs independently per source
    shard (one applyInPandas group per source, bounded state = the
    bin-occupancy array), never globally — a 100 TB corpus packs as
    thousands of independent shards. The per-shard first-fit scan is
    O(docs x bins); swap the linear probe for a segment tree when a
    single shard's bin count grows past ~10^4 (documented scale path,
    same class as the two_level_rank swap).

    The DuckDB oracle replays FFD EXACTLY as a recursive CTE over the
    same (n_tokens DESC, doc_id) order, carrying each source's
    bin-occupancy array as list state — one recursion step per rank,
    all sources advancing in parallel rows (depth = max docs/source,
    bounded; the pipe_bpe_encode recursion doctrine)."""
    docs = load_table(spark, sf_dir, "documents")
    return ffd_from_census(pack_token_census(docs))


@query(
    "text_bpe_train",
    oracle=r"""
    WITH vocab AS (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2)))
               AS pair,
             freq
      FROM vocab WHERE length(w) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20
    """,
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first merge step of BPE tokenizer training: the most frequent
    adjacent symbol pairs across the corpus (each subsequent merge round
    is this same query over the re-segmented vocab).

    The scale move is aggregating the corpus to a (word, freq) VOCAB
    FIRST and counting pairs over the vocab weighted by frequency —
    pair extraction then touches |vocab| short strings instead of the
    full token stream, which is how real tokenizer trainers survive a
    100 TB corpus (vocab is millions of rows; the corpus is trillions
    of tokens). Two aggregations, both with map-side partials; the
    pair explode fans out over the small side only. Top-k via
    TakeOrderedAndProject with a deterministic (n desc, pair) tie
    order so the oracle match is exact."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(20)
    )


# Shared by pipe_quality_buckets AND pipe_quality_buckets_cuts: the
# cut-point variant must produce the IDENTICAL (tier x source) census
# as the exact ntile tiering — grading both against one ntile oracle is
# the equivalence proof for the scale shape.
_QUALITY_BUCKETS_ORACLE = r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
    total AS (SELECT sum(tf)::DOUBLE AS total FROM tf),
    scored AS (
      SELECT doc_id, tf,
             CAST(round(-ln((sum(tf) OVER (PARTITION BY tok)) / total.total)
                        * 1000000.0, 0) AS BIGINT) AS nllu
      FROM tf CROSS JOIN total
    ),
    per_doc AS (
      SELECT doc_id,
             sum(tf)::BIGINT AS n_tokens,
             sum(tf * nllu)::BIGINT AS s
      FROM scored GROUP BY doc_id
    ),
    tiered AS (
      SELECT doc_id, n_tokens, s,
             ntile(3) OVER (ORDER BY s // n_tokens, doc_id) AS tier
      FROM per_doc
    )
    SELECT t.tier, d.source,
           count(*) AS n_docs,
           sum(t.n_tokens)::BIGINT AS total_tokens,
           (2 * sum(t.s)::BIGINT + sum(t.n_tokens)::BIGINT)
             // (2 * sum(t.n_tokens)::BIGINT) / 1000000.0 AS mean_nll
    FROM tiered t JOIN documents d USING (doc_id)
    GROUP BY t.tier, d.source
    """


@query("pipe_quality_buckets", oracle=_QUALITY_BUCKETS_ORACLE)
def pipe_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-tier bucketing — the CCNet move: score every document
    with the corpus unigram LM, rank, cut into head/middle/tail
    terciles, and report the (tier x source) census that drives
    tier-weighted sampling of the training mix.

    Numeric stance matches text_unigram_logprob: per-token -ln p in
    micro-nats as BIGINT, per-doc score = integer sum, tier rank on
    INTEGER division (s div n_tokens) — every comparison the tiering
    makes is exact integer math, so tier assignment is bit-stable
    across engines; floats only appear in the final reported mean over
    identical integer operands.

    Scale: the ntile here is a global sort of per-DOC stats (one row
    per document — the corpus never sorts). The 100 TB shape is
    EXECUTABLE as pipe_quality_buckets_cuts below (distributed
    two-level rank locates the exact ntile boundary keys, broadcast
    cut-point comparison assigns tiers) — graded against this same
    oracle, proving the two forms produce the identical census."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        _unigram_tf_scored(docs)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("nllu")).cast("bigint").alias("s"),
        )
    )
    tiered = per_doc.withColumn(
        "tier",
        F.ntile(3)
        .over(Window.orderBy(F.expr("s div n_tokens"), F.col("doc_id")))
        .cast("bigint"),
    )
    return (
        tiered.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("tier", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            # integer half-up in micro-nats (r7 hardening: round() of
            # s/n/1e6 can straddle a 7th-decimal tie when n reduces
            # into the 2^7*5^k class — the w_distribution_stats lesson)
            (
                int_div(
                    2 * F.sum("s").cast("bigint") + F.sum("n_tokens").cast("bigint"),
                    2 * F.sum("n_tokens").cast("bigint"),
                )
                / F.lit(1e6)
            ).alias("mean_nll"),
        )
    )


@query("pipe_quality_buckets_cuts", oracle=_QUALITY_BUCKETS_ORACLE)
def pipe_quality_buckets_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pipe_quality_buckets' documented 100 TB shape, now EXECUTABLE
    (VERDICT r8 #3): instead of a global ntile sort, tier assignment
    happens by comparing each doc's (score, doc_id) key against TWO
    broadcast cut-point keys — the keys at the exact ntile boundary
    ranks b1 = (n+2) div 3 and b2 = (2n+2) div 3 (ntile(3)'s
    biggest-buckets-first sizing), located with the distributed
    two-level rank (operators/rank.py — range partitions + partitioned
    row_number + broadcast prefix-count carry; no single-partition
    window anywhere). Because the composite key is unique, key <= k_b1
    is EXACTLY rank <= b1, so the census is bit-identical to the exact
    ntile tiering — which is why this query grades against the SAME
    ntile oracle as its sibling: the green row is the equivalence
    proof, not just a self-consistent answer. At 100 TB the cut-point
    probe stays one range shuffle of per-DOC stats + a 2-row broadcast;
    swapping the exact boundary rank for an approx_percentile cut is
    then a one-line relaxation that keeps this plan shape."""
    from mie_spark.operators.rank import two_level_rank

    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        _unigram_tf_scored(docs)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("nllu")).cast("bigint").alias("s"),
        )
        .withColumn("qv", F.expr("s div n_tokens"))
    )
    ranked = two_level_rank(per_doc, order_cols=["qv", "doc_id"], out="rn")
    # three consumers (bounds agg, cut-point join, tier assignment):
    # materialize the ranked per-doc stats once so the rank window and
    # its carry run once, not per consumer
    ranked = ranked.localCheckpoint(eager=False)
    # boundary ranks from the ranked (checkpointed) side: n = max rank
    bounds = ranked.agg(F.max("rn").alias("n")).select(
        F.explode(
            F.array(
                F.struct(
                    F.expr("(n + 2) div 3").alias("rn"),
                    F.lit(1).alias("which"),
                ),
                F.struct(
                    F.expr("(2 * n + 2) div 3").alias("rn"),
                    F.lit(2).alias("which"),
                ),
            )
        ).alias("b")
    ).select("b.rn", "b.which")
    cut_row = (
        ranked.join(F.broadcast(bounds), "rn")
        .groupBy()
        .agg(
            F.max(F.when(F.col("which") == 1, F.col("qv"))).alias("c1q"),
            F.max(F.when(F.col("which") == 1, F.col("doc_id"))).alias("c1d"),
            F.max(F.when(F.col("which") == 2, F.col("qv"))).alias("c2q"),
            F.max(F.when(F.col("which") == 2, F.col("doc_id"))).alias("c2d"),
        )
    )
    above = lambda cq, cd: (
        (F.col("qv") > F.col(cq))
        | ((F.col("qv") == F.col(cq)) & (F.col("doc_id") > F.col(cd)))
    ).cast("long")
    tiered = ranked.crossJoin(F.broadcast(cut_row)).withColumn(
        "tier", F.lit(1) + above("c1q", "c1d") + above("c2q", "c2d")
    )
    return (
        tiered.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("tier", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (
                int_div(
                    2 * F.sum("s").cast("bigint") + F.sum("n_tokens").cast("bigint"),
                    2 * F.sum("n_tokens").cast("bigint"),
                )
                / F.lit(1e6)
            ).alias("mean_nll"),
        )
    )


@query(
    "pipe_dataset_card",
    oracle=r"""
    WITH t AS (
      SELECT source, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           sum(len(toks))::BIGINT AS total_tokens,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT fp) AS n_unique,
           ((count(*) - count(DISTINCT fp))::BIGINT * 2000000 + count(*))
             // (2 * count(*)) / 1000000.0 AS dup_rate,
           (sum(len(toks))::BIGINT * 2000000 + count(*))
             // (2 * count(*)) / 1000000.0 AS mean_tokens,
           (sum(CASE WHEN len(toks) BETWEEN 30 AND 1000
                     AND len(list_distinct(toks))::DOUBLE / len(toks) > 0.25
                THEN 1 ELSE 0 END)::BIGINT * 2000000 + count(*))
             // (2 * count(*)) / 1000000.0 AS quality_pass_rate
    FROM t
    GROUP BY source
    """,
)
def pipe_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source "dataset card" a corpus release ships with — doc
    and token counts, language spread, exact-dup rate, mean length, and
    rule-gate pass rate — computed in ONE grouped pass over the corpus
    (every metric is an aggregate over per-row expressions, so the scan
    happens once and the shuffle carries |sources| rows of partial
    aggregates). All three ratios are emitted via the integer half-up
    6dp formula (r7 hardening): the denominator is a per-source DOC
    COUNT, which can land on the 2^7*5^k tie class (640, 3200, ...)
    where round(int/int, 6) diverges between the engines — the
    w_distribution_stats lesson."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tok = token_count(text)
    enriched = docs.select(
        "source",
        "lang",
        n_tok.cast("long").alias("n_toks"),
        fingerprint(text).alias("fp"),
        (
            (n_tok >= 30) & (n_tok <= 1000) & (type_token_ratio(text) > 0.25)
        ).cast("long").alias("passes"),
    )
    return enriched.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("fp").alias("n_unique"),
        (
            int_div(
                (F.count(F.lit(1)) - F.count_distinct("fp")) * 2000000
                + F.count(F.lit(1)),
                2 * F.count(F.lit(1)),
            )
            / F.lit(1e6)
        ).alias("dup_rate"),
        (
            int_div(
                F.sum("n_toks") * 2000000 + F.count(F.lit(1)),
                2 * F.count(F.lit(1)),
            )
            / F.lit(1e6)
        ).alias("mean_tokens"),
        (
            int_div(
                F.sum("passes") * 2000000 + F.count(F.lit(1)),
                2 * F.count(F.lit(1)),
            )
            / F.lit(1e6)
        ).alias("quality_pass_rate"),
    )


@query(
    "pipe_chunk_overlap",
    oracle=r"""
    WITH dl AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS n
      FROM documents
    ),
    c AS (
      -- last start = ceil((n-128)/96): generation stops once a window
      -- has reached the document end, so no chunk is ever a strict
      -- subset of its predecessor ((n-33)//96 == ceil((n-128)/96) for
      -- n > 128)
      SELECT doc_id, n,
             unnest(range(0, CASE WHEN n <= 128 THEN 1
                                  ELSE ((n - 33) // 96) + 1 END)) AS i
      FROM dl WHERE n > 0
    )
    SELECT doc_id,
           i AS chunk_idx,
           i * 96 AS start_tok,
           least(i * 96 + 128, n) AS end_tok,
           least(i * 96 + 128, n) - i * 96 AS chunk_tokens
    FROM c
    """,
)
def pipe_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — the RAG / long-context prep step that
    cuts each document into 128-token windows at stride 96 (32-token
    overlap so no boundary sentence is orphaned). Chunk starts are
    i*stride for i in [0, ceil((n-128)/96)] (0 alone when n <= 128):
    generation STOPS once a window has reached the document end, so no
    chunk is ever a strict subset of its predecessor — a naive
    floor((n-1)/stride) bound emits a degenerate fully-contained tail
    chunk for every n with n mod 96 in [1, 32], double-indexing the
    document tail. Pure integer window math, exact by construction on
    both engines.

    Scale: unlike pipe_pack_sequences (whose offsets chain through a
    cumulative sum), chunk boundaries depend only on the document's OWN
    length — a map-only pass with a per-row explode, no shuffle at any
    corpus size; the scan fuses the sequence/posexplode into codegen."""
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id",
        token_count(F.lower(F.col("text"))).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    c = dl.select(
        "doc_id",
        "n",
        # `div`, not `/`: Spark `/` on longs is double division, which
        # loses exactness past 2^53 where the oracle's integer // does
        # not; (n-33) div 96 == ceil((n-128)/96) for n > 128
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr("CASE WHEN n <= 128 THEN 0 ELSE (n - 33) div 96 END"),
            )
        ).alias("i"),
    )
    end = F.least(F.col("i") * 96 + 128, F.col("n"))
    return c.select(
        "doc_id",
        F.col("i").alias("chunk_idx"),
        (F.col("i") * 96).alias("start_tok"),
        end.alias("end_tok"),
        (end - F.col("i") * 96).alias("chunk_tokens"),
    )


@query(
    "text_vocab_coverage",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok),
    vocab AS (SELECT tok FROM freq ORDER BY freq DESC, tok LIMIT 1000)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT::DOUBLE
                 / count(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV census: build the top-1000 corpus
    vocabulary (freq desc, token asc — a total order, so the cutoff is
    deterministic on both engines) and report each document's
    out-of-vocabulary token rate — the signal that sizes a tokenizer's
    vocab or flags domain-shifted shards before training.

    Scale: the vocab is a bounded top-k (TakeOrdered, no global sort)
    and is BROADCAST back against the token stream — the corpus-side
    tokens never shuffle for the membership probe; the only wide
    exchanges are the two aggregates (corpus term counts, per-doc
    rollup), both with map-side partial aggregation. `ReuseExchange`
    shares the tokenize+explode subtree between the vocab build and
    the probe side at runtime."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(1000)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "tok", "left")
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.round(n_oov.cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
    )


@query(
    "text_quality_model",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_tokens,
             list_sum(list_transform(toks,
               x -> (((('0x' || substr(md5(x), 1, 4))::BIGINT % 64)
                      * 37 + 11) % 1000 - 500)))::BIGINT AS w_sum
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, n_tokens, w_sum,
           round(1.0 / (1.0 + exp(-(w_sum / (1000.0 * n_tokens)))), 6)
             AS score
    FROM f
    """,
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE as a scan-fused expression —
    the fasttext-style filtering pass (CCNet / FineWeb shape) that
    scores every document of a 100 TB corpus without a model server or
    a UDF: hashing-trick unigram features (md5-prefix bucket, 64 dims)
    look up per-bucket weights, the weighted sum accumulates in exact
    integer milli-units via F.aggregate over the token array (no
    explode, no shuffle — map-only at any scale), and only the final
    sigmoid touches floats, on identical integer operands.

    The weight table here is a deterministic stand-in (affine map of
    the bucket index) so the oracle can replay it; a trained model
    deploys as a 64-entry broadcast map — same plan, same cost. The
    per-token weight expression is engine-portable md5 arithmetic, the
    same construction as the sampling family's hash-cutoff rules."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    ).filter(F.size("toks") > 0)

    def tok_weight(x: F.Column) -> F.Column:
        bucket = F.conv(F.substring(F.md5(x), 1, 4), 16, 10).cast("long") % 64
        return (bucket * 37 + 11) % 1000 - 500

    f = toked.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform(F.col("toks"), tok_weight),
            F.lit(0).cast("long"),
            lambda acc, w: acc + w,
        ).alias("w_sum"),
    )
    logit = F.col("w_sum") / (F.lit(1000.0) * F.col("n_tokens"))
    return f.select(
        "doc_id",
        "n_tokens",
        "w_sum",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )


@query(
    "pipe_bpe_vocab",
    oracle=r"""
    SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> x <> '')) AS w
      FROM documents
    ) GROUP BY w ORDER BY freq DESC, w LIMIT 500
    """,
)
def pipe_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-graded sub-oracle for pipe_bpe_encode's DISTRIBUTED stage:
    the word-frequency vocabulary the BPE trainer consumes (top-500 by
    freq with a deterministic word tie-break). The trainer's sequential
    merge loop stays rows-only by nature (merge k changes what merge
    k+1 counts), but its *input* is plain SQL — grading it exactly
    pins the corpus-scaling part of the pipeline, leaving only the
    bounded driver-side recurrence to the pytest digests. Plan: one
    map-side-combined aggregate + TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "w")
        .limit(500)
    )


def _bpe_encode_oracle(n_merges: int = 30) -> str:
    """The FULL BPE pipeline replayed in SQL (graduates pipe_bpe_encode
    from rows-only — the v_pq_codes doctrine taken to completion):
    every training round is an unrolled CTE triple {pair counts over
    the current symbolized vocab, argmax with the exact (count desc,
    pair lex asc) tie order, merge application}, and the encode stage
    re-applies the learned merges to every distinct corpus word before
    joining back to occurrences.

    The key construction is the merge-application FOLD: the imperative
    leftmost non-overlapping scan (operators/text.py bpe_encode) is
    exactly a left fold over symbols — merge when acc's last element
    is `a` and the incoming symbol is `b` — because a just-created
    token a||b can never equal `a` (b is non-empty), so a fold never
    re-merges output of the same round, which is precisely the
    imperative scan's skip-by-two rule. Symbols ride as single-element
    lists so DuckDB's 2-arg list_reduce (first element = seed) types
    the accumulator as LIST<VARCHAR>. Empty-pair rounds (vocabulary
    fully merged) keep the vocab unchanged via the LEFT JOIN NULL
    sentinel, mirroring the trainer's early break."""
    fold = (
        "CASE WHEN ma IS NULL THEN syms ELSE "
        "list_reduce(list_transform(syms, s -> [s]), "
        "(acc, x) -> CASE WHEN len(acc) >= 1 AND acc[-1] = ma "
        "AND x[1] = mb "
        "THEN list_append(acc[1:len(acc)-1], ma || mb) "
        "ELSE list_concat(acc, x) END) END"
    )
    parts = [
        r"""
    WITH occ AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    v0 AS MATERIALIZED (
      SELECT list_transform(range(1, length(w) + 1), i -> w[i]) AS syms,
             count(*)::BIGINT AS freq
      FROM occ GROUP BY w
    ),
    dw0 AS MATERIALIZED (
      SELECT w, list_transform(range(1, length(w) + 1), i -> w[i]) AS syms
      FROM (SELECT DISTINCT w FROM occ)
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f""",
    p{k} AS MATERIALIZED (
      SELECT p.a AS a, p.b AS b, sum(freq)::BIGINT AS c
      FROM (SELECT unnest(list_transform(range(1, len(syms)),
                     i -> {{'a': syms[i], 'b': syms[i + 1]}})) AS p, freq
            FROM v{k - 1} WHERE len(syms) >= 2)
      GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (SELECT a AS ma, b AS mb FROM p{k} ORDER BY c DESC, a, b LIMIT 1),
    v{k} AS MATERIALIZED (SELECT {fold} AS syms, freq FROM v{k - 1} LEFT JOIN b{k} ON TRUE),
    dw{k} AS MATERIALIZED (SELECT w, {fold} AS syms FROM dw{k - 1} LEFT JOIN b{k} ON TRUE)"""
        )
    parts.append(
        f""",
    enc AS (
      SELECT w, len(syms)::BIGINT AS n_syms,
             len(list_filter(syms, s -> length(s) > 1))::BIGINT AS n_merged
      FROM dw{n_merges}
    )
    SELECT d.doc_id,
           count(o.w)::BIGINT AS n_words,
           coalesce(sum(e.n_syms), 0)::BIGINT AS n_syms,
           coalesce(sum(e.n_merged), 0)::BIGINT AS n_merged_syms
    FROM documents d
    LEFT JOIN occ o ON o.doc_id = d.doc_id
    LEFT JOIN enc e ON e.w = o.w
    GROUP BY d.doc_id"""
    )
    return "".join(parts)


@query("pipe_bpe_encode", oracle=_bpe_encode_oracle())
def pipe_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer fit + apply in one pipeline: word-frequency
    vocabulary (distributed aggregate over the corpus — the part that
    scales with data), 30 merge rounds of the classic sequential BPE
    loop over that bounded vocab (train_bpe_merges; driver-side by
    construction, exactly like HF tokenizers/SentencePiece, cap-guarded
    collect), then corpus-wide ENCODE with the learned merges as an
    Arrow-batched map-only pass (bpe_encode) reporting per-document
    symbol counts and merge compression.

    Hash-oracled IN FULL since r11 (previously rows-only): the oracle
    unrolls all 30 training rounds in SQL — the v_pq_codes doctrine —
    and replays the encode as a per-word left fold (see
    _bpe_encode_oracle for why the fold is exactly the imperative
    leftmost-scan). Exactness needs no margin argument: every decision
    is integer (pair counts) or string-equality, and the argmax tie
    order (count desc, pair lex asc) is the same total order on both
    engines. The digest pins in tests/test_rows_only_digests.py stay
    as the cheap regression tripwire."""
    from mie_spark.operators.text import bpe_encode, train_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = train_bpe_merges(vocab, n_merges=30)
    return bpe_encode(docs, merges)


# Shared by pipe_tokenizer_drift (batch) and st_tokenizer_drift
# (streaming twin in queries/streaming.py) — identical SQL text, the
# st_drift_ks doctrine.
TOKENIZER_DRIFT_ORACLE = r"""
    WITH tok AS (
      SELECT source, doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    census AS (
      SELECT source, w,
             count(*)::BIGINT AS n_curr,
             count(CASE WHEN doc_id % 10 <> 0 THEN 1 END)::BIGINT AS n_prev
      FROM tok GROUP BY source, w
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, sum(n_prev)::BIGINT AS freq FROM census GROUP BY w
      ) WHERE freq > 0 ORDER BY freq DESC, w LIMIT 20
    ),
    per_source AS (
      SELECT c.source,
             sum(c.n_prev)::BIGINT AS tok_prev,
             sum(CASE WHEN v.w IS NULL THEN c.n_prev ELSE 0 END)::BIGINT
               AS oov_prev,
             sum(c.n_curr)::BIGINT AS tok_curr,
             sum(CASE WHEN v.w IS NULL THEN c.n_curr ELSE 0 END)::BIGINT
               AS oov_curr
      FROM census c LEFT JOIN vocab v ON c.w = v.w
      GROUP BY c.source
    )
    SELECT source, tok_prev, oov_prev, tok_curr, oov_curr,
           CASE WHEN tok_prev > 0 THEN
             ((oov_prev * 2000000 + tok_prev) // (2 * tok_prev))::BIGINT
           END AS oov_ppm_prev,
           ((oov_curr * 2000000 + tok_curr) // (2 * tok_curr))::BIGINT
             AS oov_ppm_curr,
           CASE WHEN tok_prev > 0 THEN
             abs(((oov_curr * 2000000 + tok_curr) // (2 * tok_curr))
                 - ((oov_prev * 2000000 + tok_prev) // (2 * tok_prev)))
               >= 5000
           ELSE
             ((oov_curr * 2000000 + tok_curr) // (2 * tok_curr)) >= 5000
           END AS drift
    FROM per_source
    """


@query("pipe_tokenizer_drift", oracle=TOKENIZER_DRIFT_ORACLE)
def pipe_tokenizer_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary drift gate (VERDICT r10 stretch): when a
    corpus refresh lands, does the SHIPPED tokenizer still cover it?
    The vocabulary is the top-20 words (freq desc, word asc — the
    pipe_bpe_vocab rule) of the PREVIOUS snapshot (doc_id % 10 <> 0,
    pipe_corpus_delta's simulated-crawl convention: every 10th doc is
    new this crawl), and the gate compares per-source out-of-vocabulary
    rates between snapshots — a source whose OOV rate moved >= 5000 ppm
    (0.5%) needs tokenizer retraining before the next pretraining run
    (the dq_drift_ks sibling for the tokenizer).

    Exactness: rates are integer PPM via the half-up formula
    ((2*oov*10^6 + tok) div (2*tok)) — no float division anywhere, so
    the drift comparison is a pure BIGINT predicate on both engines
    (and 2*oov*10^6 stays < 2^63 well past sf10 under ANSI). Plan: one
    tokenize scan feeds BOTH snapshot censuses (the prev snapshot is a
    conditional count, not a second scan), the 20-row vocab broadcasts
    back onto the (source, word) census, and the per-source rollup is
    map-side-combinable — two small shuffles at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return tokenizer_drift_from_census(
        tokenizer_census(docs).localCheckpoint()
    )


def tokenizer_census(docs: DataFrame) -> DataFrame:
    """The (source, word, n_curr, n_prev) token census both drift
    forms aggregate to — ONE definition so the batch gate and its
    streaming twin stay bit-identical (the twin-grading contract).
    Vocabulary-bounded: O(sources x distinct words) rows at any corpus
    size. Batch callers localCheckpoint it (it is consumed twice —
    vocab derivation + rollup — and Catalyst does not reuse the
    exchange across the consumers, PLANS.md r11); the streaming twin
    materializes it through the state store instead."""
    tok = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )
    return tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("n_curr"),
        F.count(F.when(F.col("doc_id") % 10 != 0, 1)).alias("n_prev"),
    )


def tokenizer_drift_from_census(census: DataFrame) -> DataFrame:
    """Vocab + per-source OOV-ppm drift projection over a (source, w,
    n_curr, n_prev) census — the bounded stage shared by
    pipe_tokenizer_drift and st_tokenizer_drift (census in, one row
    per source out)."""
    vocab = (
        census.groupBy("w")
        .agg(F.sum("n_prev").alias("freq"))
        .filter(F.col("freq") > 0)
        .orderBy(F.col("freq").desc(), "w")
        .limit(20)
        .select("w", F.lit(1).alias("iv"))
    )
    marked = census.join(F.broadcast(vocab), "w", "left")
    per_source = marked.groupBy("source").agg(
        F.sum("n_prev").alias("tok_prev"),
        F.sum(
            F.when(F.col("iv").isNull(), F.col("n_prev")).otherwise(0)
        ).alias("oov_prev"),
        F.sum("n_curr").alias("tok_curr"),
        F.sum(
            F.when(F.col("iv").isNull(), F.col("n_curr")).otherwise(0)
        ).alias("oov_curr"),
    )
    # A source with tok_prev = 0 is NEW this crawl (whole sources do
    # appear: src0/src10's doc_ids are all = 0 mod 10 at sf0.01) — its
    # prev rate is undefined (NULL, and the naked formula would divide
    # by zero under the driver's ANSI session), so a new source gates
    # on its ABSOLUTE current OOV rate instead of the delta.
    ppm_prev = F.when(
        F.col("tok_prev") > 0,
        int_div(
            F.col("oov_prev") * 2_000_000 + F.col("tok_prev"),
            F.col("tok_prev") * 2,
        ),
    )
    ppm_curr = int_div(
        F.col("oov_curr") * 2_000_000 + F.col("tok_curr"),
        F.col("tok_curr") * 2,
    )
    drift = F.when(
        F.col("tok_prev") > 0, F.abs(ppm_curr - ppm_prev) >= 5000
    ).otherwise(ppm_curr >= 5000)
    return per_source.select(
        "source",
        "tok_prev",
        "oov_prev",
        "tok_curr",
        "oov_curr",
        ppm_prev.alias("oov_ppm_prev"),
        ppm_curr.alias("oov_ppm_curr"),
        drift.alias("drift"),
    )


@query(
    "pipe_corpus_delta",
    oracle=r"""
    WITH curr AS (
      SELECT doc_id, source,
             sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    prev AS (
      -- simulated previous snapshot, deterministic on both engines:
      -- every 10th doc is new this crawl (absent before), every 7th
      -- changed content, and a disjoint synthetic id range models docs
      -- that disappeared from the source since last crawl
      SELECT doc_id, source,
             sha256(lower(trim(regexp_replace(
               CASE WHEN doc_id % 7 = 0 THEN text || ' (old revision)'
                    ELSE text END, '\s+', ' ', 'g')))) AS fp
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT doc_id + 10000000, source,
             sha256('gone:' || doc_id::VARCHAR) AS fp
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT coalesce(c.source, p.source) AS source,
           CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN c.doc_id IS NULL THEN 'removed'
                WHEN c.fp <> p.fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS n
    FROM curr c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id
    GROUP BY 1, 2
    """,
)
def pipe_corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — the CDC census an incremental re-crawl
    pipeline runs before ingest: full-outer-join current vs previous
    snapshot on document id, classify added / removed / changed /
    unchanged by normalized content fingerprint, report the per-source
    census that decides how much downstream work (re-embed, re-dedup)
    the refresh actually costs.

    The previous snapshot is SIMULATED deterministically (both engines
    derive it from the same table with the same arithmetic) so the
    classification itself is hash-graded. Scale: one equi-join on the
    id — both snapshots shuffle once on doc_id; fingerprints are
    computed scan-side so the join carries (id, source, 32-byte fp),
    never text. The real deployment replaces `prev` with the stored
    manifest table (dedup_incremental is the content-level sibling)."""
    docs = load_table(spark, sf_dir, "documents")
    curr = docs.select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp")
    )
    prev_changed = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        "source",
        fingerprint(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" (old revision)")),
            ).otherwise(F.col("text"))
        ).alias("fp"),
    )
    prev_gone = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        "source",
        F.sha2(
            F.concat(F.lit("gone:"), F.col("doc_id").cast("string")), 256
        ).alias("fp"),
    )
    prev = prev_changed.unionByName(prev_gone)
    c, p = curr.alias("c"), prev.alias("p")
    j = c.join(p, F.col("c.doc_id") == F.col("p.doc_id"), "full_outer")
    status = (
        F.when(F.col("p.doc_id").isNull(), F.lit("added"))
        .when(F.col("c.doc_id").isNull(), F.lit("removed"))
        .when(F.col("c.fp") != F.col("p.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("c.source"), F.col("p.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- character-level entropy (gibberish / boilerplate signal) ---------------

@query(
    "text_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c
      FROM documents
    ), filtered AS (
      SELECT doc_id, c FROM ch WHERE c <> ''
    ), tf AS (
      SELECT doc_id, c, count(*)::BIGINT AS cnt
      FROM filtered GROUP BY doc_id, c
    ), agg AS (
      SELECT doc_id,
             sum(cnt)::BIGINT AS n_chars_t,
             count(*)::BIGINT AS n_distinct,
             sum(cnt * CAST(round(ln(cnt) * 1000000.0, 0) AS BIGINT))::BIGINT
               AS s
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_chars_t, n_distinct,
           (CAST(round(ln(n_chars_t) * 1000000.0, 0) AS BIGINT)
            - (2 * s + n_chars_t) // (2 * n_chars_t)) / 1000000.0
             AS entropy_nats
    FROM agg
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-unigram Shannon entropy per document — the classic
    cheap gibberish/boilerplate detector (near-zero entropy = repeated
    filler, anomalously high = random noise; natural text sits in a
    narrow band). Uses H = ln(n) - (1/n)*sum(c*ln(c)) so every ln
    argument is an exact integer COUNT: each ln is evaluated on
    identical operands by both engines, rounded once to micro-nats,
    and everything after that is order-independent BIGINT arithmetic
    (doctrine: the half-up mean is (2S+n) div 2n, S >= 0). Plan:
    explode to chars, one (doc_id, char) aggregate with map-side
    combine (alphabet is tiny so partial aggs collapse hard), one
    per-doc aggregate on the same doc_id key. No driver state; at
    100 TB the shuffle carries (doc_id, char, count) — bounded by
    |docs| x |alphabet|, never the text."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lnu = lambda col: F.round(F.log(col) * F.lit(1e6), 0).cast("long")
    agg = tf.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars_t"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("cnt") * lnu(F.col("cnt"))).alias("s"),
    )
    from mie_spark.queries.relational import int_div

    mean_half_up = int_div(
        F.col("s").cast("decimal(38,0)") * 2 + F.col("n_chars_t"),
        F.col("n_chars_t").cast("decimal(38,0)") * 2,
    )
    return agg.select(
        "doc_id",
        "n_chars_t",
        "n_distinct",
        ((lnu(F.col("n_chars_t")) - mean_half_up) / F.lit(1e6)).alias(
            "entropy_nats"
        ),
    )


# --- bigram-LM document scoring (conditional perplexity) --------------------

@query(
    "text_bigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    bg AS (
      SELECT doc_id, unnest(list_zip(l[:-2], l[2:])) AS pair
      FROM toks
    ),
    tf AS (
      SELECT doc_id, pair[1] AS w1, pair[2] AS w2,
             count(*)::BIGINT AS tf
      FROM bg GROUP BY 1, 2, 3
    ),
    vocab AS (SELECT count(DISTINCT w2)::BIGINT AS v FROM tf),
    scored AS (
      SELECT doc_id, tf,
             CAST(round(-ln(
               ((sum(tf) OVER (PARTITION BY w1, w2))::BIGINT + 1)
               / ((sum(tf) OVER (PARTITION BY w1))::BIGINT + vocab.v)::DOUBLE
             ) * 1000000.0, 0) AS BIGINT) AS nllu
      FROM tf CROSS JOIN vocab
    )
    SELECT doc_id,
           sum(tf)::BIGINT AS n_bigrams,
           round(sum(tf * nllu)::BIGINT / sum(tf)::BIGINT / 1000000.0, 6)
             AS avg_nll,
           round(exp(round(sum(tf * nllu)::BIGINT / sum(tf)::BIGINT
                           / 1000000.0, 6)), 2) AS ppl
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring with add-one smoothing — the
    conditional upgrade of text_unigram_logprob: score each doc by the
    mean -ln P(w2|w1) under corpus counts, P = (c(w1,w2)+1)/(c(w1·)+V).
    A doc of corpus-common words in an UNCOMMON order now scores badly
    (word-salad detection), which the unigram model cannot see.

    Numerics: every ln argument is a ratio of exact BIGINTs evaluated
    in double on identical operands, rounded ONCE to micro-nats; the
    per-doc fold is integer. Plan: bigrams come from an in-row
    arrays_zip of two slices (no self-join), the (doc, w1, w2) tf
    aggregate shuffles compact counts, corpus conditionals are two
    SUM windows over the tf table (partition (w1,w2) and (w1) — counts
    move, never tokens), V is a 1-row broadcast. The LM is never
    materialized on the driver."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("l")
    )
    # slice length clamped at 0: a doc tokenizing to zero tokens would
    # otherwise request length -1, which is a runtime error in Spark
    n = F.greatest(F.size("l") - 1, F.lit(0))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("l"), 1, n).alias("w1"),
                F.slice(F.col("l"), 2, n).alias("w2"),
            )
        ).alias("pair"),
    )
    tf = bg.groupBy(
        "doc_id",
        F.col("pair.w1").alias("w1"),
        F.col("pair.w2").alias("w2"),
    ).agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.agg(F.count_distinct("w2").alias("v"))
    wb = Window.partitionBy("w1", "w2")
    wp = Window.partitionBy("w1")
    nllu = F.round(
        -F.log(
            (F.sum("tf").over(wb) + 1)
            / (F.sum("tf").over(wp) + F.col("v")).cast("double")
        )
        * F.lit(1e6),
        0,
    ).cast("bigint")
    scored = tf.crossJoin(F.broadcast(vocab)).select(
        "doc_id", "tf", nllu.alias("nllu")
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        F.sum(F.col("tf") * F.col("nllu")).alias("s"),
    )
    avg = F.round(F.col("s") / F.col("n_bigrams") / F.lit(1e6), 6)
    return agg.select(
        "doc_id",
        "n_bigrams",
        avg.alias("avg_nll"),
        F.round(F.exp(avg), 2).alias("ppl"),
    )


@query(
    "pipe_funnel_census",
    oracle=_CLEAN_CORPUS_CTE
    + r"""
    , ftoks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ft
      FROM documents
    ),
    sh8 AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ft) >= 8
               THEN [ft[i] || ' ' || ft[i+1] || ' ' || ft[i+2] || ' ' || ft[i+3] || ' ' ||
                     ft[i+4] || ' ' || ft[i+5] || ' ' || ft[i+6] || ' ' || ft[i+7]
                     FOR i IN range(1, len(ft) - 6)]
               ELSE []::VARCHAR[] END) AS s
      FROM ftoks
    ),
    inv AS (SELECT doc_id, unnest(s) AS shingle FROM sh8),
    bench AS (SELECT DISTINCT shingle FROM inv WHERE doc_id < 100),
    contam AS (
      SELECT DISTINCT i.doc_id FROM inv i JOIN bench b ON i.shingle = b.shingle
      WHERE i.doc_id >= 100
    ),
    decon AS (
      SELECT * FROM deduped
      WHERE doc_id >= 100
        AND doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    budgeted AS (
      SELECT * FROM (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY source
                                        ORDER BY md5(doc_id::VARCHAR), doc_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM decon
      ) WHERE cum - n_tokens < 500
    )
    SELECT '0_raw' AS stage, count(*)::BIGINT AS n_docs,
           sum(len(ft))::BIGINT AS n_tokens FROM ftoks
    UNION ALL
    SELECT '1_clean', count(*)::BIGINT, sum(n_tokens)::BIGINT FROM deduped
    UNION ALL
    SELECT '2_decontaminated', count(*)::BIGINT, sum(n_tokens)::BIGINT FROM decon
    UNION ALL
    SELECT '3_budgeted', count(*)::BIGINT, sum(n_tokens)::BIGINT FROM budgeted
    """,
)
def pipe_funnel_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-data prep pipeline as one composed plan, with
    a per-stage survivor census — the funnel report every corpus build
    publishes: raw corpus → clean (lang gate + rule quality + exact
    fingerprint dedup, the shared _clean_corpus stage) → benchmark
    decontamination (drop the bench stand-in docs AND any doc sharing
    an 8-token shingle with them, the pipe_decontaminate rule) →
    per-source token budget (md5-ordered take-until-crossing, the
    samp_token_budget rule at 500 tokens).

    Every stage reuses the exact rule its standalone query grades, so
    the composition — not new logic — is what this hash checks: stage
    counts and token sums must agree with DuckDB replaying the same
    four-CTE chain. Plan: the census is four aggregates over one shared
    lineage; shuffles are the dedup window, the shingle semi-join
    (bench side broadcast), and the budget window — each inherited
    from its stage, nothing added by the composition."""
    from pyspark.sql.window import Window

    from mie_spark.operators.text import shingles_from_tokens, tokens

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(token_count(F.col("text")).cast("long").alias("n"))
    clean = _clean_corpus(docs)
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toked.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("toks"), 8)).alias("shingle")
    )
    bench = sh.filter(F.col("doc_id") < 100).select("shingle").distinct()
    contam = (
        sh.filter(F.col("doc_id") >= 100)
        .join(F.broadcast(bench), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    decon = clean.filter(F.col("doc_id") >= 100).join(contam, "doc_id", "left_anti")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    budgeted = decon.withColumn(
        "cum", F.sum("n_tokens").over(w).cast("long")
    ).filter(F.col("cum") - F.col("n_tokens") < 500)

    def census(df: DataFrame, stage: str, tok_col: str) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_col).cast("long").alias("n_tokens"),
        ).select("stage", "n_docs", "n_tokens")

    return (
        census(raw, "0_raw", "n")
        .unionByName(census(clean, "1_clean", "n_tokens"))
        .unionByName(census(decon, "2_decontaminated", "n_tokens"))
        .unionByName(census(budgeted, "3_budgeted", "n_tokens"))
    )


# --- PMI collocation mining -------------------------------------------------

@query(
    "text_pmi_collocations",
    oracle=r"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    bg AS (SELECT unnest(list_zip(l[:-2], l[2:])) AS pair FROM toks),
    tf AS (
      SELECT pair[1] AS w1, pair[2] AS w2, count(*)::BIGINT AS c12
      FROM bg GROUP BY 1, 2
    ),
    nn AS (SELECT sum(c12)::BIGINT AS n FROM tf),
    m AS (
      SELECT w1, w2, c12,
             (sum(c12) OVER (PARTITION BY w1))::BIGINT AS c1,
             (sum(c12) OVER (PARTITION BY w2))::BIGINT AS c2
      FROM tf
    )
    SELECT w1, w2, c12,
           CAST(round(ln((c12 * nn.n)::DOUBLE / (c1 * c2)::DOUBLE)
                      * 1000000.0, 0) AS BIGINT) AS pmi_micro
    FROM m CROSS JOIN nn
    WHERE c12 >= 20
    ORDER BY pmi_micro DESC, w1, w2
    LIMIT 50
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information — the
    phrase-discovery pass (think "new york", "machine learning") that
    tokenizer-vocab and phrase-aware chunking pipelines run over a
    corpus: PMI(w1,w2) = ln( c(w1,w2)·N / (c(w1·)·c(·w2)) ), ranked
    over bigrams seen >= 20 times.

    Numerics: the ln argument is one IEEE division of two exact BIGINT
    products (ANSI-safe: c12·N <= N², far below 2^63 at any graded SF),
    evaluated on identical operands by both engines and rounded ONCE to
    micro-nats — the doctrine every LM/entropy query here follows.

    Plan: bigrams are an in-row arrays_zip (no self-join); the corpus
    tf aggregate shuffles (w1, w2, count) — bounded by bigram TYPES,
    never token instances; the marginals are two window sums over that
    compact tf table and N is a 1-row broadcast. TakeOrderedAndProject
    caps the result at 50. At 100 TB the heavy text is read once,
    map-side combined, and everything downstream is vocab-sized."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.lower(F.col("text"))).alias("l"))
    n = F.greatest(F.size("l") - 1, F.lit(0))
    bg = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("l"), 1, n).alias("w1"),
                F.slice(F.col("l"), 2, n).alias("w2"),
            )
        ).alias("pair")
    )
    tf = bg.groupBy(
        F.col("pair.w1").alias("w1"), F.col("pair.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("c12"))
    nn = tf.agg(F.sum("c12").alias("n"))
    w1w = Window.partitionBy("w1")
    w2w = Window.partitionBy("w2")
    m = tf.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(w1w).alias("c1"),
        F.sum("c12").over(w2w).alias("c2"),
    )
    pmi_micro = (
        F.round(
            F.log(
                (F.col("c12") * F.col("n"))
                / (F.col("c1") * F.col("c2")).cast("double")
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("pmi_micro")
    )
    return (
        m.crossJoin(F.broadcast(nn))
        .filter(F.col("c12") >= 20)
        .select("w1", "w2", "c12", pmi_micro)
        .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
        .limit(50)
    )


# --- Gopher-style quality rule table (per-doc signals + flags) ---------------

@query(
    "text_gopher_rules",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '...', ''))) // 3
               AS n_symbols
      FROM documents
    ), m AS (
      SELECT doc_id, n_symbols,
             len(toks)::BIGINT AS n_words,
             list_sum(list_transform(toks, x -> length(x)))::BIGINT
               AS sum_word_len,
             len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))::BIGINT
               AS alpha_words,
             len(list_filter(toks, x -> x IN ('the','be','to','of','and',
                                              'that','have','with')))::BIGINT
               AS stopword_hits
      FROM t
    )
    SELECT doc_id, n_words, sum_word_len,
           round(sum_word_len::DOUBLE / n_words, 6) AS mean_word_len,
           n_symbols::BIGINT AS n_symbols, alpha_words, stopword_hits,
           (n_words BETWEEN 50 AND 100000) AS flag_word_count,
           (sum_word_len BETWEEN 3 * n_words AND 10 * n_words)
             AS flag_mean_word_len,
           (10 * n_symbols <= n_words) AS flag_symbol_ratio,
           (5 * alpha_words >= 4 * n_words) AS flag_alpha_ratio,
           (stopword_hits >= 2) AS flag_stopwords,
           ((n_words BETWEEN 50 AND 100000)
            AND sum_word_len BETWEEN 3 * n_words AND 10 * n_words
            AND 10 * n_symbols <= n_words
            AND 5 * alpha_words >= 4 * n_words
            AND stopword_hits >= 2) AS keep
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-table quality filter (Rae et al. 2021, App. A —
    the public rule set RedPajama-v2/Dolma ship as per-doc "quality
    signals"): emit the RAW signals alongside each rule's verdict, not
    just the gate, so downstream mixes can re-threshold without
    re-scanning the corpus. Rules over this corpus (no newlines, so the
    line-level bullet/ellipsis rules are vacuous and omitted):
    50 <= words <= 100k; mean word length in [3, 10]; symbol-to-word
    ratio ('#' + '...') <= 0.1; >= 80% words alphabetic; >= 2 stopword
    occurrences from Gopher's 8-word list (occurrence count, the
    RedPajama-v2 reading — this corpus has at most one DISTINCT member).

    Every flag is a cross-multiplied integer comparison (3n <= s <=
    10n, 10*sym <= n, 5*alpha >= 4n) so no rule can straddle a float
    boundary between engines; the only float is the reported
    round(int/int, 6) mean, inside the 6-decimal safe band (verify
    skill doctrine). One scan, all signals fused into a single
    projection — whole-stage codegen, zero shuffles, the per-shard
    map pass a 100 TB quality sweep actually runs."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    hash_cnt = F.length(text) - F.length(F.replace(text, F.lit("#")))
    ell_cnt = F.expr(
        "(length(text) - length(replace(text, '...', ''))) div 3"
    )
    toks = tokens(text)
    m = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_word_len"),
        (hash_cnt + ell_cnt).cast("long").alias("n_symbols"),
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]")))
        .cast("long")
        .alias("alpha_words"),
        F.size(
            F.filter(
                toks,
                lambda x: x.isin(
                    "the", "be", "to", "of", "and", "that", "have", "with"
                ),
            )
        )
        .cast("long")
        .alias("stopword_hits"),
    )
    n, s = F.col("n_words"), F.col("sum_word_len")
    f_wc = (n >= 50) & (n <= 100000)
    f_mwl = (s >= 3 * n) & (s <= 10 * n)
    f_sym = 10 * F.col("n_symbols") <= n
    f_alpha = 5 * F.col("alpha_words") >= 4 * n
    f_sw = F.col("stopword_hits") >= 2
    return m.select(
        "doc_id",
        "n_words",
        "sum_word_len",
        F.round(s / n, 6).alias("mean_word_len"),
        "n_symbols",
        "alpha_words",
        "stopword_hits",
        f_wc.alias("flag_word_count"),
        f_mwl.alias("flag_mean_word_len"),
        f_sym.alias("flag_symbol_ratio"),
        f_alpha.alias("flag_alpha_ratio"),
        f_sw.alias("flag_stopwords"),
        (f_wc & f_mwl & f_sym & f_alpha & f_sw).alias("keep"),
    )


@query(
    "pipe_span_corruption",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             x -> x <> ''))::BIGINT AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT d.doc_id, d.n_tokens, g.b,
             least(d.n_tokens - g.b * 20, 20) AS m,
             1 + ('0x' || substr(md5(d.doc_id::VARCHAR || ':' ||
                                     g.b::VARCHAR), 1, 2))::INTEGER % 5
               AS len,
             ('0x' || substr(md5(d.doc_id::VARCHAR || ':' ||
                                 g.b::VARCHAR), 3, 2))::INTEGER AS obase
      FROM d
      JOIN LATERAL (
        SELECT unnest(range(0, ((d.n_tokens + 19) // 20)::BIGINT)) AS b
      ) g ON true
      WHERE d.n_tokens > 0
    ),
    sp AS (
      SELECT doc_id, n_tokens, b, m, len,
             obase % (21 - len) AS o
      FROM b
    ),
    k AS (
      SELECT doc_id, n_tokens, b,
             CASE WHEN o < m THEN least(o + len, m) - o ELSE 0 END
               AS masked,
             CASE WHEN o < m THEN
               -- sum of positions 20b+o .. 20b+min(o+len,m)-1
               (least(o + len, m) - o)
                 * (2 * (20 * b + o) + least(o + len, m) - o - 1) // 2
             ELSE 0 END AS pos_sum
      FROM sp
    )
    SELECT doc_id, max(n_tokens)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_blocks,
           sum(masked)::BIGINT AS n_masked,
           sum(pos_sum)::BIGINT AS mask_pos_sum
    FROM k GROUP BY doc_id
    """,
)
def pipe_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption manifest, deterministic and
    shard-local: the token stream is cut into 20-token blocks and each
    block masks ONE contiguous span whose length (1..5, mean 3 ~ the
    T5 mean) and offset derive from md5(doc_id:block) — expected mask
    rate 3/20 = 15%, the T5 default. Blockwise placement makes spans
    non-overlapping BY CONSTRUCTION (no gaps-and-islands merge pass)
    and means a 100 TB corpus can generate its masking schedule
    map-only, per shard, with zero coordination — reproducible across
    re-runs, retries, and engines because the schedule is a pure
    function of (doc_id, block).

    The manifest grades exactly: n_masked and the positional checksum
    mask_pos_sum (sum of masked token positions via the arithmetic-
    series formula — integer, order-free) are BIGINTs both engines
    derive from n_tokens alone, so the hash proves the two engines
    would mask the SAME positions, not just the same count. Plan:
    pure map-only per-doc expressions — the block walk is a bounded
    HOF over sequence(0, ceil(n/20)-1) folded in-row, so there is no
    explode and no shuffle at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"),
            lambda x: x != "",
        )
    ).cast("long")
    d = docs.select("doc_id", n_tokens.alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    nblocks = int_div(F.col("n_tokens") + 19, 20).cast("long")
    blocks = F.sequence(F.lit(0).cast("long"), nblocks - 1)

    def per_block(b):
        h = F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), b.cast("string")
            )
        )
        ln = 1 + F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % 5
        obase = F.conv(F.substring(h, 3, 2), 16, 10).cast("long")
        o = obase % (21 - ln)
        m = F.least(F.col("n_tokens") - b * 20, F.lit(20).cast("long"))
        end = F.least(o + ln, m)
        masked = F.when(o < m, end - o).otherwise(F.lit(0).cast("long"))
        pos_sum = F.when(
            o < m,
            int_div((end - o) * (2 * (b * 20 + o) + end - o - 1), 2),
        ).otherwise(F.lit(0).cast("long"))
        return F.struct(
            masked.alias("masked"), pos_sum.cast("long").alias("pos_sum")
        )

    k = d.select(
        "doc_id",
        "n_tokens",
        nblocks.alias("n_blocks"),
        F.transform(blocks, per_block).alias("bk"),
    )
    return k.select(
        "doc_id",
        "n_tokens",
        "n_blocks",
        F.aggregate(
            F.col("bk"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x["masked"],
        ).alias("n_masked"),
        F.aggregate(
            F.col("bk"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x["pos_sum"],
        ).alias("mask_pos_sum"),
    )
