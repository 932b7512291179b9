"""Audit every registered query for single-partition (global ordered)
windows — the classic 100 TB sort bottleneck the r8 verdict caught in
ev_rfm. Uses mie_spark.plans.unpartitioned_window_count, which
disambiguates WindowExec's two-bracket printings (a global ORDERED
window vs a partitioned unordered one).

Every hit must be a documented bounded exception (input provably
bounded by construction — days, months, vocab, sketch cells, a top-k
pool — never by the data volume). The expected set below IS that
documentation; a new name appearing here means either a new bounded
exception (add it, with the bound) or a real scale bug (fix it, the
ev_rfm -> two_level_rank path).

Usage: python tools_window_audit.py   (~3 min; nonzero exit on drift)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

# name -> (expected count, the bound that makes it safe)
EXPECTED = {
    "ev_concurrency": (1, "per-day carry: one row per calendar day"),
    "w_lag_monthly_delta": (1, "monthly lag: one row per month"),
    "text_hybrid_rrf": (2, "rank windows over two top-50 pools"),
    "samp_weighted_k": (1, "rank over the k=20 survivors, post-limit"),
    "pipe_quality_buckets": (
        1,
        "ntile over per-doc stats; executable scale shape = "
        "pipe_quality_buckets_cuts (two_level_rank)",
    ),
    "v_mmr_pool": (1, "rank over the top-50 pool"),
    "ev_survival": (1, "at-risk suffix sum: one row per tenure week"),
    "ev_survival_daily": (1, "at-risk suffix sum: one row per tenure day"),
    "pipe_interleave": (
        1,
        "two_level_rank prefix-carry: one row per range partition",
    ),
    "ev_changepoint": (
        2,
        "cumsum + global max over the <=|days| daily census",
    ),
    "w_exact_quantiles": (
        1,
        "two_level_cumsum carry: one row per range partition",
    ),
    "dq_drift_ks": (
        1,
        "day-rank + day-count over the <=|days| distinct-day census, "
        "planned as one Window node "
        "(CDF windows are partitioned by event_type)",
    ),
    "v_hnsw_rerank": (
        1,
        "exact global re-rank over the <= shards x k = 80 candidate "
        "pool (the hnsw_topk final stage)",
    ),
    "v_embed_drift": (
        1,
        "corpus ppm rollup over the <= |panel| per-query rows "
        "(pmod(vec_id,29)=0 probe panel, ~3% of the corpus)",
    ),
    "ev_ab_boundary": (
        2,
        "final-enrollment max + first-crossing min over the <= |days| "
        "prefix census (window-max instead of agg+crossJoin: the "
        "scalar pattern duplicated the census subtree, PLANS r12)",
    ),
}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mie_spark.plans import unpartitioned_window_count
    from mie_spark.queries import QUERIES

    flagged: dict[str, int] = {}
    for name, fn in QUERIES.items():
        if name.startswith("st_"):
            # streaming queries execute on plan construction; their
            # batch twins cover the window audit
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        n = unpartitioned_window_count(df)
        if n:
            flagged[name] = n
    drift = []
    for name, n in sorted(flagged.items()):
        want = EXPECTED.get(name)
        if want is None:
            drift.append(f"NEW global window: {name} x{n} — bound it or fix it")
        elif want[0] != n:
            drift.append(f"{name}: {n} global windows, expected {want[0]}")
    for name in EXPECTED:
        if name not in flagged:
            drift.append(f"{name}: expected bounded exception vanished (ok if replanned; update EXPECTED)")
    print(f"audited {sum(1 for n in QUERIES if not n.startswith('st_'))} queries; "
          f"{len(flagged)} with global windows, all expected: {not drift}")
    for name, n in sorted(flagged.items()):
        why = EXPECTED.get(name, ("?", "UNDOCUMENTED"))[1]
        print(f"  {name} x{n}: {why}")
    for d in drift:
        print("DRIFT:", d)
    return 1 if drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
