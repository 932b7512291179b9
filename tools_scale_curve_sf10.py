"""Measure the sf1 -> sf10 scale curve for the three steepest rows of
the r10 sf0.1->sf1 curve (VERDICT r10 #3: pipe_bpe_encode 0.96,
v_ann_hnsw_topk 0.78, st_dedup_minhash 0.62 — exactly the ones whose
story predicts flattening at the next decade). sf10 is the 100-copy
key-shifted replica of sf0.1 (documents+embeddings only, the tables
these queries touch): `python tools_gen_scale_sf.py 100
/root/repo/.scale/sf10 documents,embeddings`.

Also measures v_ann_hnsw_topk under FIXED 8 shards at both SFs — the
regime the r10 curve measured and the one shards="auto" (the r11
shipping form) exists to avoid: fixed shards grow per-segment n 10x per
decade (n·log n·ef_c build), auto adds segments at constant ~4096 size.

Usage: python tools_scale_curve_sf10.py [runs]   (default 3)
"""

import math
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from mie_spark.session import get_spark  # noqa: E402

SF1 = "/root/repo/.scale/sf1"
SF10 = "/root/repo/.scale/sf10"

QUERIES_TO_CURVE = [
    "pipe_bpe_encode",
    "v_ann_hnsw_topk",
    "st_dedup_minhash",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("mie_spark_scale_curve_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    from mie_spark.queries import QUERIES
    from mie_spark.sources import load_table
    from mie_spark.operators.hnsw import hnsw_topk
    from mie_spark.queries.vector import _query_vec

    def fixed8_hnsw(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings").filter("vec_id <> 0")
        return hnsw_topk(emb, "embedding", _query_vec(spark, sf_dir), k=10,
                         shards=8)

    targets = {n: QUERIES[n] for n in QUERIES_TO_CURVE}
    targets["v_ann_hnsw_topk[fixed8]"] = fixed8_hnsw

    # warmup
    QUERIES["s2_point_lookup"](spark, SF1).collect()
    print(f"load at start: {os.getloadavg()}")
    print(f"{'query':28s} {'sf1':>9s} {'sf10':>9s} {'ratio':>7s} {'exp':>6s}")
    for name, fn in targets.items():
        meds = {}
        for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                ts.append(time.perf_counter() - t0)
            meds[sf_name] = statistics.median(ts)
        ratio = meds["sf10"] / meds["sf1"]
        exp = math.log10(ratio)
        print(
            f"{name:28s} {meds['sf1']:9.2f} {meds['sf10']:9.2f} "
            f"{ratio:7.2f} {exp:6.2f}"
        )
    print(f"load at end: {os.getloadavg()}")


if __name__ == "__main__":
    main()
