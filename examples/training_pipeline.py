"""End-to-end training-data prep with mie_spark — a runnable tour.

Chains the engine's LLM-pipeline operators over the synthetic corpus
the way a pretraining data job would over a crawl shard: quality
signals -> language/quality cut -> exact + near dedup -> benchmark
decontamination -> temperature-mixed sampling -> token-budget packing
-> dataset card. Every stage is a registered, oracle-graded query
(mie_spark/queries/*) — this file just shows them composed.

Run:  python examples/training_pipeline.py [SF_DIR]
      (default /root/testdata/sf0.001; sf0.01 takes a few seconds more)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from mie_spark.queries import QUERIES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("mie_spark_training_pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    stages = [
        # (registry query, what it contributes to the pipeline)
        ("text_gopher_rules", "per-doc quality rule table (Gopher cuts)"),
        ("text_lang_id", "n-gram language id"),
        ("text_quality_filter", "combined keep/drop decision"),
        ("dedup_exact", "content-hash exact dedup"),
        ("dedup_minhash_lsh", "MinHash-LSH near-dup candidate pairs"),
        ("pipe_decontaminate", "benchmark n-gram decontamination"),
        ("samp_temperature_mix", "temperature-weighted source mixing"),
        ("samp_token_budget", "token-budget trim"),
        ("pipe_pack_sequences", "concat-and-chunk sequence packing"),
        ("pipe_dataset_card", "final dataset card (counts per stage)"),
    ]
    for name, why in stages:
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        print(f"{name:24s} {n:7d} rows  — {why}")
        df.show(3, truncate=60)

    # the same census as ONE fused plan (per-stage survivor counts):
    print("fused funnel census (pipe_funnel_census):")
    QUERIES["pipe_funnel_census"](spark, sf_dir).show(truncate=False)


if __name__ == "__main__":
    main()
