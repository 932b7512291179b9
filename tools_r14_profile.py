"""Round-13 optimization profiler: isolate each query with the noop
sink (guide §1.4) and capture its .explain("formatted") plan.

For a list of query names (args, default: the bench worst-list), run
each query N times with the noop sink — full materialization of every
column, no count()-pruning, no sink cost — and write
plans/r14/<query>_<tag>.txt with the formatted physical plan. Timing
via median-of-N alongside first-run, printed as one JSON line per
query. Jobs are labeled (setJobDescription) so a live UI run maps
stages to queries.

Usage:
    python tools_r14_profile.py [--tag before|after] [names...]

Streaming (st_*) queries execute their drain at plan-construction
time; their "plan" file records the drained-sink scan plus a note, and
the timing covers the full drain + readback (what the bench measures).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mie_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = max(1, int(os.environ.get("R14_PROFILE_RUNS", "3")))

DEFAULT = [
    "st_exact_quantiles",
    "dedup_minhash_lsh",
    "st_dedup_minhash",
    "st_attribution_join",
    "w_exact_quantiles",
    "a_assoc_rules",
    "g_ppr",
    "v_ann_ivf_topk",
    "v_kcenter_coreset",
    "st_txn_rollup",
    "v_ann_hnsw_topk",
    "g_pagerank",
    "g_hits",
    "v_ivf_cells",
    "g_mis",
    "st_hourly_agg",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = "before"
    confs: list[tuple[str, str]] = []
    for a in sys.argv[1:]:
        if a.startswith("--tag"):
            tag = a.split("=", 1)[1] if "=" in a else "before"
        elif a.startswith("--conf="):
            k, v = a[len("--conf="):].split("=", 1)
            confs.append((k, v))
    names = args or DEFAULT

    spark = get_spark("r14_profile")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in confs:
        spark.conf.set(k, v)
    from mie_spark.queries import QUERIES

    # same warmup as bench.py: JVM/codegen + python worker pool
    QUERIES["s2_point_lookup"](spark, SF_DIR).collect()

    def _warm(it):  # noqa: ANN001, ANN202
        import numpy  # noqa: F401

        yield from it

    spark.range(0, 64, 1, 32).mapInPandas(_warm, "id long").count()

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        if name not in QUERIES:
            print(json.dumps({"query": name, "error": "unknown"}), flush=True)
            continue
        spark.sparkContext.setJobDescription(f"r14 {tag}: {name}")
        samples = []
        df = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if name.startswith("st_"):
            plan = (
                "NOTE: streaming query — the drain executes at plan-construction\n"
                "time; this is the drained-sink readback plan. Timing covers the\n"
                "full drain (source -> state -> sink) plus this readback.\n\n"
            ) + plan
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        srt = sorted(samples)
        med = (
            srt[len(srt) // 2]
            if len(srt) % 2
            else (srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "noop_median": round(med, 3),
                    "first": samples[0],
                    "samples": samples,
                    "tag": tag,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
