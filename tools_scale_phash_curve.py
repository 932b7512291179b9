"""Measure the pHash band-bucket saturation lever (VERDICT r12 item
#5 / SCALE.md r12 residual): extend the mm_phash_hamming curve one
more point — 500k images (the r12 sf10 point) -> 2M images — and show
the two-level banding lever holds the next decade's exponent.

The corpus is the same deterministic synthetic_ppm_corpus the graded
query uses, driven by a bare doc_id range (the generator only reads
ids), so this measures the production pipeline: codec chain ->
signature census -> banded pair census. At 2M images the unique-sig
census (~n/25 mosaic groups + perturbation variants) crosses the
100k auto threshold and two-level banding engages; the single-level
counterfactual is measured at the same size.

Also measures the banding stage ALONE with synthetic unique
signatures (``sigs`` mode): random far-apart 60-bit signatures plus a
planted near-dup tail, single- vs two-level at n_u = 250k / 1M / 2M —
the codec-free measurement that located the real crossover (fitted
n_u ~ 7e6; below it the lever's key emission loses ~3x, hence the 5M
auto threshold) and exposed the AQE post-distinct coalescing bug
(band join on 2 of 32 cores) the repartition pin in
simhash_candidate_pairs now prevents.

Usage: python tools_scale_phash_curve.py [corpus|sigs|all] [n_u,n_u,...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from mie_spark.session import get_spark  # noqa: E402


def sig_sweep(spark, sizes=(250_000, 1_000_000, 2_000_000)) -> None:
    """Banding stage alone on synthetic unique signatures: md5-derived
    far-apart sigs (collisions negligible at these n) + a planted 1%%
    near-dup tail (each flips 3 low bits of a base sig) so the output
    is non-trivial at every size."""
    from mie_spark.operators.dedup import simhash_candidate_pairs

    for n_u in sizes:
        base = spark.range(0, n_u).select(
            F.col("id").alias("asset_id"),
            F.when(
                F.col("id") % 100 == 99,
                F.conv(
                    F.substring(F.md5((F.col("id") - F.lit(1)).cast("string")), 1, 15),
                    16, 10,
                ).cast("long").bitwiseAND(F.lit((1 << 60) - 1))
                .bitwiseXOR(F.lit(7)),
            ).otherwise(
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 15),
                    16, 10,
                ).cast("long").bitwiseAND(F.lit((1 << 60) - 1))
            ).alias("phash"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        base.count()
        for lever in (False, True):
            t0 = time.perf_counter()
            n_pairs = simhash_candidate_pairs(
                base, max_hamming=6, id_col="asset_id", sig_col="phash",
                two_level=lever,
            ).count()
            print(
                f"sigs n_u={n_u} two_level={lever}: "
                f"{time.perf_counter() - t0:.1f}s ({n_pairs} pairs)",
                flush=True,
            )
        base.unpersist()


def corpus_curve(spark) -> None:
    from mie_spark.operators.dedup import simhash_candidate_pairs
    from mie_spark.queries.multimodal import phash_signature_census

    results: dict[tuple[int, str], float] = {}
    for n in (500_000, 2_000_000):
        ids = spark.range(0, n).select(F.col("id").alias("doc_id"))
        t0 = time.perf_counter()
        sigs = phash_signature_census(ids).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_imgs = sigs.count()
        t_census = time.perf_counter() - t0
        n_uniq = sigs.select("phash").distinct().count()
        print(
            f"n={n}: census {t_census:.1f}s ({n_imgs} imgs, "
            f"{n_uniq} unique sigs)",
            flush=True,
        )
        levers = [True, False] if n >= 2_000_000 else [False]
        for lever in levers:
            t0 = time.perf_counter()
            pairs = simhash_candidate_pairs(
                sigs, max_hamming=6, id_col="asset_id", sig_col="phash",
                two_level=lever,
            )
            n_pairs = pairs.count()
            dt = time.perf_counter() - t0
            results[(n, "two_level" if lever else "single")] = dt
            print(
                f"n={n} two_level={lever}: banding {dt:.1f}s "
                f"({n_pairs} pairs)",
                flush=True,
            )
        results[(n, "census")] = t_census
        sigs.unpersist()
    t1 = results[(500_000, "census")] + results[(500_000, "single")]
    t2 = results[(2_000_000, "census")] + results[(2_000_000, "single")]
    exp = math.log(t2 / t1) / math.log(4)
    print(
        f"end-to-end 500k {t1:.1f}s -> 2M {t2:.1f}s (single-level at "
        f"both — the shipping auto choice below the ~7e6-unique "
        f"crossover): exponent {exp:.2f}"
    )
    print(
        f"2M banding: single {results[(2_000_000, 'single')]:.1f}s vs "
        f"two-level {results[(2_000_000, 'two_level')]:.1f}s — below "
        f"the crossover the lever loses to its own key emission"
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("phash_scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    if mode in ("sigs", "all"):
        if len(sys.argv) > 2:
            sig_sweep(spark, tuple(int(x) for x in sys.argv[2].split(",")))
        else:
            sig_sweep(spark)
    if mode in ("corpus", "all"):
        corpus_curve(spark)


if __name__ == "__main__":
    main()
