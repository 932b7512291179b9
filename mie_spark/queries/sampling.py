"""Deterministic sampling queries (training-data pipeline surface).

Sampling is usually unverifiable across engines; the hash-cutoff
construction in operators/sampling.py makes it exact — both engines
compute the same md5-prefix rule, so even the *membership* of each
sample is oracle-checked, not just its size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.operators.sampling import hash_split, stratified_sample
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
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5), 16, 10
    ).cast("bigint")
    return (
        docs.join(F.broadcast(cut), "source")
        .filter(bucket < F.col("cutoff"))
        .select("doc_id", "source")
    )
