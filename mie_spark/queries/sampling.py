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
           sum(n_chars) AS total_chars
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
