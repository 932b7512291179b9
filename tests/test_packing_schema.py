"""Semantic properties of the r12 packing/schema operators — what the
hash oracle can't state: the FFD invariants (capacity, first-fit
minimality, bin contiguity) and the schema-drift verdict semantics.
"""

from __future__ import annotations

import collections

SF = "/root/testdata/sf0.001"
WINDOW = 256


def test_pack_bestfit_ffd_invariants(spark):
    """Capacity is never exceeded; bin ids are contiguous from 0 per
    source; offsets replay the occupancy exactly; and the placement is
    genuinely FIRST-fit in decreasing order: replaying the manifest in
    (n_tokens desc, doc_id) order, each doc's bin is the LOWEST-index
    bin that had room at its turn."""
    from mie_spark.queries import QUERIES

    rows = QUERIES["pipe_pack_bestfit"](spark, SF).collect()
    by_source = collections.defaultdict(list)
    for r in rows:
        by_source[r["source"]].append(r)
    assert by_source  # corpus non-empty
    for source, rs in by_source.items():
        rs.sort(key=lambda r: (-r["n_tokens"], r["doc_id"]))
        bins: list[int] = []
        for r in rs:
            n = int(r["n_tokens"])
            assert 0 < n <= WINDOW
            first_fit = next(
                (i for i, occ in enumerate(bins) if occ + n <= WINDOW),
                len(bins),
            )
            assert r["bin"] == first_fit, (source, r)
            if first_fit == len(bins):
                bins.append(0)
            assert r["bin_offset"] == bins[first_fit]
            bins[first_fit] += n
            assert bins[first_fit] <= WINDOW
        assert sorted({r["bin"] for r in rs}) == list(range(len(bins)))


def test_pack_bestfit_covers_every_packable_doc(spark):
    """Every doc with 0 < tokens <= WINDOW appears exactly once in the
    manifest — packing drops nothing it claims to cover (longer docs
    are the chunker's job, pipe_pack_sequences)."""
    from pyspark.sql import functions as F

    from mie_spark.operators.text import token_count
    from mie_spark.queries import QUERIES
    from mie_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    want = {
        (r["source"], r["doc_id"])
        for r in docs.select(
            "source",
            "doc_id",
            token_count(F.lower(F.col("text"))).alias("n"),
        )
        .filter((F.col("n") > 0) & (F.col("n") <= WINDOW))
        .collect()
    }
    got = [
        (r["source"], r["doc_id"])
        for r in QUERIES["pipe_pack_bestfit"](spark, SF).collect()
    ]
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


def test_schema_drift_exercises_every_verdict(spark):
    """The simulated rollout hits every branch at the graded corpus:
    the real field k is stable, legacy_tag dropped, exp_flag added, u
    type-changed — and the counters are internally consistent."""
    from mie_spark.queries import QUERIES

    rows = {
        r["field"]: r for r in QUERIES["dq_schema_drift"](spark, SF).collect()
    }
    assert {f: rows[f]["status"] for f in rows} == {
        "k": "stable",
        "legacy_tag": "dropped",
        "exp_flag": "added",
        "u": "type_changed",
    }
    for r in rows.values():
        assert r["present_prev"] <= r["rows_prev"]
        assert r["present_curr"] <= r["rows_curr"]
        assert (
            r["n_num_prev"] + r["n_str_prev"] + r["n_bool_prev"]
            == r["present_prev"]
        )
        assert (
            r["n_num_curr"] + r["n_str_curr"] + r["n_bool_curr"]
            == r["present_curr"]
        )


def test_pack_bestfit_streaming_twin_equals_batch(spark):
    """st_pack_bestfit drains the same census through the same FFD
    projection: its manifest must equal the batch manifest row-for-row
    (the ninth twin family's equality contract)."""
    from mie_spark.queries import QUERIES

    st = sorted(
        tuple(r) for r in QUERIES["st_pack_bestfit"](spark, SF).collect()
    )
    ba = sorted(
        tuple(r) for r in QUERIES["pipe_pack_bestfit"](spark, SF).collect()
    )
    assert st == ba and st


def test_pack_bestfit_tree_equals_linear_probe_adversarially(spark):
    """The segment-tree first-fit must place EXACTLY like the linear
    probe on shapes the graded corpus never reaches: thousands of bins
    (forces the tree's capacity-doubling rebuild past 1024) and
    adversarial size mixes that make leftmost-feasible non-trivial."""
    import random

    from mie_spark.queries.text import ffd_from_census

    rng = random.Random(12)
    rows = []
    # shard A: 3000 docs of 200 tokens -> no two fit together -> 3000
    # bins (rebuild at 1024 and 2048)
    rows += [("big", i, 200) for i in range(3000)]
    # shard B: adversarial mix across the whole size range
    rows += [("mix", i, rng.randint(1, 256)) for i in range(4000)]
    census = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long"
    )
    got = ffd_from_census(census).collect()
    by_source = {}
    for r in got:
        by_source.setdefault(r["source"], []).append(r)
    assert len(by_source["big"]) == 3000 and len(by_source["mix"]) == 4000
    for source, rs in by_source.items():
        rs.sort(key=lambda r: (-r["n_tokens"], r["doc_id"]))
        bins = []
        for r in rs:
            n = int(r["n_tokens"])
            first_fit = next(
                (i for i, occ in enumerate(bins) if occ + n <= 256),
                len(bins),
            )
            assert r["bin"] == first_fit, (source, dict(r.asDict()))
            if first_fit == len(bins):
                bins.append(0)
            assert r["bin_offset"] == bins[first_fit]
            bins[first_fit] += n
    assert max(r["bin"] for r in by_source["big"]) == 2999


def test_schema_drift_streaming_twin_equals_batch(spark):
    """st_schema_drift drains the same 11-counter census through the
    same 4-row assembly: its verdict report must equal the batch
    gate's row-for-row (the tenth twin family's equality contract)."""
    from mie_spark.queries import QUERIES

    st = sorted(
        tuple(r) for r in QUERIES["st_schema_drift"](spark, SF).collect()
    )
    ba = sorted(
        tuple(r) for r in QUERIES["dq_schema_drift"](spark, SF).collect()
    )
    assert st == ba and len(st) == 4
