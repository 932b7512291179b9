"""Measure the sf0.1 -> sf1 scale curve for the most expensive headline
queries (VERDICT r9 #2: convert the 100 TB story from argued to
demonstrated). Runs each query at both scale factors (sf1 = the 10x
key-shifted replica from tools_gen_scale_sf.py), reports the median
wall time and the implied scaling exponent  e = log10(t_sf1 / t_sf01)
— e == 1.0 is linear in rows, e < 1 means fixed overhead dominates,
e > 1 flags super-linear work that would not survive 100x.

Usage: python tools_scale_curve.py [runs]   (default 3)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from mie_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scale/sf1"

# The 10 most expensive BENCH_r09 queries + this round's additions that
# carry new machinery worth a measured curve.
QUERIES_TO_CURVE = [
    "pipe_bpe_encode",
    "v_ann_ivf_topk",
    "st_txn_rollup",
    "st_dedup_minhash",
    "st_attribution_join",
    "g_mis",
    "g_pagerank",
    "g_ppr",
    "g_hits",
    "dedup_minhash_lsh",
    # r10 additions
    "v_ivf_cells",
    "st_decontaminate",
    "v_rerank_ce",
    "v_ann_hnsw_topk",
    # late-r10 additions: one per new plan-shape family — the
    # (type, day, bucket) census gate, the census + two_level_cumsum
    # prefix sum (batch and streaming forms), the k-pass farthest-point
    # loop, and the bounded-driver forecast recurrences.
    "dq_drift_ks",
    "w_exact_quantiles",
    "st_exact_quantiles",
    "v_kcenter_coreset",
    "ev_forecast_backtest",
    # r12 additions: the integer-DCT pHash pair census (mapInPandas
    # codec + banded join), the per-shard FFD pack (batch + streaming
    # census twin), the sequential-boundary census, and the one-scan
    # counter gates.
    "mm_phash_hamming",
    "pipe_pack_bestfit",
    "st_pack_bestfit",
    "ev_ab_boundary",
    "ev_hll_registers",
    "dq_schema_drift",
]


def main() -> None:
    digit_args = [a for a in sys.argv[1:] if a.isdigit()]
    runs = int(digit_args[0]) if digit_args else 3
    spark = get_spark("mie_spark_scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    from mie_spark.queries import QUERIES

    # same warmups as bench.py: JVM/codegen + the Python worker pool
    QUERIES["s2_point_lookup"](spark, SF01).collect()

    def _warm(it):  # noqa: ANN001, ANN202
        import numpy  # noqa: F401

        yield from it

    spark.range(0, 64, 1, 32).mapInPandas(_warm, "id long").count()

    only = [a for a in sys.argv[1:] if not a.isdigit()]
    to_run = [n for n in QUERIES_TO_CURVE if not only or n in only]
    print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s} {'exp':>6s}")
    for name in to_run:
        meds = {}
        for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).collect()
                samples.append(time.perf_counter() - t0)
            meds[sf_name] = statistics.median(samples)
        ratio = meds["sf1"] / meds["sf0.1"]
        import math

        exp = math.log10(ratio)
        print(
            f"{name:28s} {meds['sf0.1']:8.2f} {meds['sf1']:8.2f} "
            f"{ratio:7.2f} {exp:6.2f}"
        )


if __name__ == "__main__":
    main()
