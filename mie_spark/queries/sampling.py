"""Deterministic sampling queries (training-data pipeline surface).

Sampling is usually unverifiable across engines; the hash-cutoff
construction in operators/sampling.py makes it exact — both engines
compute the same md5-prefix rule, so even the *membership* of each
sample is oracle-checked, not just its size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.operators.sampling import (
    fixed_k_per_stratum,
    hash_bucket,
    hash_split,
    shuffle_shards,
    stratified_sample,
    token_budget_sample,
)
from mie_spark.operators.text import token_count
from mie_spark.queries import query
from mie_spark.sources import load_table


@query(
    "samp_hash_split",
    oracle="""
    SELECT CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INTEGER < 192
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def samp_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """75/25 train/test split, deterministic by document id hash (0xc0 /
    0x100 = 75%). Split assignment is a scan-fused projection — no
    shuffle, no rand(), so every run and every engine lands each doc in
    the same split; the only shuffle is the 2-group count that proves
    it."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", train_frac=0.75)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "samp_stratified",
    oracle="""
    SELECT lang, count(*) AS n_kept
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INTEGER <
          CASE lang WHEN 'en' THEN 32 WHEN 'de' THEN 128 ELSE 64 END
    GROUP BY lang
    """,
)
def samp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-language keep rates (en 12.5%,
    de 50%, rest 25%) — the rebalancing step of a multilingual corpus
    build. Same deterministic hash rule per stratum; the filter fuses
    into the parquet scan so rejected rows never leave the reader."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "lang",
        "doc_id",
        fractions={"en": 0.125, "de": 0.5},
        default_frac=0.25,
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "samp_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT source, count(*)::DOUBLE AS n_s FROM documents GROUP BY source
    ),
    stats AS (
      SELECT sum(n_s) AS n_total, sum(sqrt(n_s)) AS s FROM counts
    ),
    cut AS (
      SELECT source,
             CAST(floor(least(1.0, 0.5 * n_total * sqrt(n_s) / s / n_s)
                        * 1048576.0) AS BIGINT) AS cutoff
      FROM counts, stats
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN cut USING (source)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 5))::BIGINT < cut.cutoff
    """,
)
def samp_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (T=2, i.e. alpha=1/2) — the
    multilingual-corpus rebalancing rule: each source's share of a
    half-size corpus is proportional to sqrt(its count), boosting small
    sources and damping giants. Per-source keep-rates derive from a
    3-row aggregate chain (groupBy source → scalar stats → cutoffs)
    that broadcast-joins back to the scan, and membership is the same
    engine-portable md5-prefix rule as hash_split — 20 hash bits here,
    so even 1e-5 keep-rates quantize faithfully — making the *exact
    membership* of the mixed corpus oracle-checkable. The filter is a
    pure per-row predicate: re-runs and late shards agree, and the
    only shuffle anywhere is the tiny counts aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_s")
    )
    stats = counts.agg(
        F.sum("n_s").alias("n_total"), F.sum(F.sqrt("n_s")).alias("s")
    )
    p = F.least(
        F.lit(1.0),
        F.lit(0.5)
        * F.col("n_total")
        * F.sqrt(F.col("n_s"))
        / F.col("s")
        / F.col("n_s"),
    )
    cut = counts.crossJoin(F.broadcast(stats)).select(
        "source",
        F.floor(p * F.lit(1048576.0)).cast("bigint").alias("cutoff"),
    )
    # 5 hex chars = 20 bits, max 1048575 — fits hash_bucket's int32
    return (
        docs.join(F.broadcast(cut), "source")
        .filter(hash_bucket(F.col("doc_id"), chars=5) < F.col("cutoff"))
        .select("doc_id", "source")
    )


@query(
    "samp_shuffle_shards",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             md5(doc_id::VARCHAR) AS shuffle_key,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 8 AS shard
      FROM documents
    )
    SELECT shard, count(*) AS n_docs,
           min(shuffle_key) AS first_key, max(shuffle_key) AS last_key
    FROM s GROUP BY shard
    """,
)
def samp_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 export shards: shard
    membership and within-shard order are pure functions of doc_id
    (operators/sampling.py shuffle_shards), so the oracle checks the
    exact per-shard membership boundaries (min/max sort key), not just
    sizes. The production write is repartition(shard) +
    sortWithinPartitions(key) — one hash shuffle, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    sharded = shuffle_shards(docs, "doc_id", n_shards=8)
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("shuffle_key").alias("first_key"),
        F.max("shuffle_key").alias("last_key"),
    )


@query(
    "samp_fixed_k",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def samp_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-5 deterministic docs per source (reservoir-sampling
    analog, operators/sampling.py fixed_k_per_stratum): rows rank by
    md5(id) within their stratum — a reproducible uniform order — so
    the oracle checks the exact membership of every per-source sample,
    row for row."""
    docs = load_table(spark, sf_dir, "documents")
    out = fixed_k_per_stratum(docs, "source", "doc_id", k=5)
    return out.select("source", "doc_id", F.col("rk").cast("long").alias("rk"))


@query(
    "samp_token_budget",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               ::BIGINT AS n_toks,
             md5(doc_id::VARCHAR) AS key
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_toks,
             CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY key, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t
    )
    SELECT doc_id, source, n_toks, cum
    FROM c
    WHERE cum - n_toks < 300
    """,
)
def samp_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Take ~300 tokens per source": deterministic budget fill
    (operators/sampling.py token_budget_sample). Docs are ordered by
    md5(doc_id) — a reproducible uniform shuffle — and kept while their
    cumulative token count starts under the budget, so the sampled
    MEMBERSHIP itself is oracle-checked, not just the totals. The one
    shuffle is the per-source window; everything else fuses into the
    scan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).cast("long").alias("n_toks")
    )
    return token_budget_sample(docs, "source", "doc_id", "n_toks", budget=300)


@query(
    "samp_epoch_mix",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source,
             CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2.5
                  WHEN source IN ('src5','src6','src7','src8','src9') THEN 1.0
                  ELSE 0.5 END AS e
      FROM documents
    ),
    expanded AS (
      SELECT r.doc_id, r.source, r.e, ep.epoch
      FROM rated r
      JOIN (SELECT unnest(range(0, 3)) AS epoch) ep
        ON ep.epoch < ceil(r.e)
    )
    SELECT source, epoch,
           count(*)::BIGINT AS n_docs,
           sum(doc_id)::BIGINT AS id_sum
    FROM expanded
    WHERE epoch < floor(e)
       OR ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INTEGER
          < round((e - floor(e)) * 256)
    GROUP BY source, epoch
    """,
)
def samp_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted mixing manifest (operators/sampling.epoch_mix):
    high-quality sources src0-4 repeat 2.5 epochs, src5-9 run once,
    the rest downsample to half an epoch — the Pile/Dolma oversampling
    shape. Full epochs keep every doc; the fractional epoch keeps a
    deterministic md5-selected half (1/256-quantized, pure function of
    the id). Graded by per-(source, epoch) doc counts plus an id-sum
    membership checksum, so the hash pins exactly WHICH docs each
    epoch carries, not just how many."""
    from mie_spark.operators.sampling import epoch_mix

    docs = load_table(spark, sf_dir, "documents")
    rates = {f"src{i}": 2.5 for i in range(5)}
    rates.update({f"src{i}": 1.0 for i in range(5, 10)})
    mixed = epoch_mix(
        docs.select("doc_id", "source"),
        "doc_id",
        "source",
        rates,
        default_epochs=0.5,
    )
    return mixed.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


@query(
    "samp_weighted_k",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT + 1)
                / 16777216.0) / CAST(n_chars AS DOUBLE) AS k
      FROM documents WHERE n_chars > 0
    ),
    top AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY k DESC, doc_id) AS rk
      FROM t
    )
    SELECT doc_id, n_chars, rk FROM top WHERE rk <= 20
    """,
)
def samp_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis via operators/sampling.weighted_sample_k):
    a 20-doc corpus sample where selection probability scales with
    n_chars — the standard biased-draw a mixing pipeline uses to favor
    long documents while staying fully reproducible (uniform u comes
    from the md5-of-id rule, no rand() state). Oracle replays the
    identical key = ln((hash6+1)/16^6)/w ranking; the only float op
    beyond IEEE arithmetic is ln over identical doubles, whose
    cross-engine 1-ulp wiggle can flip an order only between keys
    within ~4e-15 of each other — unreachable at corpus key spacing.
    Plan: scan-fused key expression, TakeOrderedAndProject — the rank
    window runs over the 20 survivors, never the corpus."""
    from mie_spark.operators.sampling import weighted_sample_k

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return weighted_sample_k(docs, "doc_id", "n_chars", k=20)


@query(
    "pipe_interleave",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             (CAST(substr(source, 4) AS INT) % 3) + 1 AS w
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, w,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS r
      FROM d
    ),
    k AS (SELECT *, (r * (6 // w))::BIGINT AS vkey FROM r)
    SELECT doc_id, source, w::BIGINT AS w, vkey,
           row_number() OVER (ORDER BY vkey, source, r)::BIGINT
             AS train_pos
    FROM k
    """,
)
def pipe_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted source interleaving — the training-ORDER
    manifest (the stage after mixing decides proportions: a data
    loader needs one reproducible global sequence in which source s
    appears ~w_s/W of the time in every prefix, not just overall —
    weighted fair queuing applied to dataset mixing; torchdata/Mosaic
    StreamingDataset interleave semantics). Per source: docs take the
    md5-of-id shuffle order (the samp_* convention). The WFQ virtual
    finish time r/w_s orders the merge; with integer weights in {1,2,3}
    the key r*(6/w_s) is an exact BIGINT, so the manifest hash-grades
    bit-for-bit — no float virtual clock.

    Scale: the per-source shuffle rank is an ordinary partitioned
    window; the GLOBAL position is two_level_rank (range partition +
    partitioned row_number + broadcast carry — never a one-partition
    window). Weights derive deterministically from the source name
    suffix ((suffix % 3) + 1) so the corpus exercises unequal rates."""
    from mie_spark.operators.rank import two_level_rank
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            (F.substring("source", 4, 10).cast("int") % 3) + 1
        ).alias("w"),
    )
    per_src = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = d.withColumn("r", F.row_number().over(per_src))
    k = r.withColumn("vkey", F.expr("CAST(r * (6 div w) AS BIGINT)"))
    ranked = two_level_rank(
        k, order_cols=["vkey", "source", "r"], out="train_pos"
    )
    return ranked.select(
        "doc_id",
        "source",
        F.col("w").cast("long").alias("w"),
        "vkey",
        F.col("train_pos").cast("long").alias("train_pos"),
    )
