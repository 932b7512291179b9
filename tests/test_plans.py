"""Scan-hygiene and plan-shape regression tests.

These pin the physical properties that decide 100 TB behavior: filters
reaching the parquet scan, column pruning, broadcast joins on dimension
tables, single-shuffle aggregates, and shuffle reuse across window +
aggregate stages. A refactor that silently de-optimizes a plan (e.g.
a UDF blocking pushdown, a lost broadcast hint) fails here long before
a benchmark would catch it.
"""

from __future__ import annotations

from mie_spark.plans import (
    broadcast_join_count,
    exchange_count,
    pushed_filters,
    read_schemas,
)
from mie_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_projection_prunes_scan(spark):
    """s1 projects 4 columns of part — the scan must read exactly those."""
    df = QUERIES["s1_scan_projection"](spark, SF)
    schemas = read_schemas(df)
    assert len(schemas) == 1
    assert set(schemas[0]) <= {"p_partkey", "p_name", "p_size", "p_retailprice"}


def test_filters_reach_parquet_scan(spark):
    """Substring + equality predicates must appear as PushedFilters, not
    post-scan Filter-only."""
    df = QUERIES["f2_substring_match"](spark, SF)
    assert pushed_filters(df), "no filter pushed to the parquet scan"


def test_dimension_joins_broadcast(spark):
    """j3 joins lineitem to part and supplier — both dimension sides must
    broadcast; the whole plan needs zero shuffles."""
    df = QUERIES["j3_edge_attr_traversal"](spark, SF)
    assert broadcast_join_count(df) >= 2
    assert exchange_count(df) == 0


def test_q1_single_shuffle(spark):
    """Pricing summary is one partial-agg + one exchange + final agg —
    any second shuffle is a regression."""
    df = QUERIES["q1_pricing_summary"](spark, SF)
    assert exchange_count(df) == 1


def test_q5_one_shuffle_rest_broadcast(spark):
    """The 6-way join shuffles the fact chain once; every dimension join
    is broadcast."""
    df = QUERIES["q5_local_supplier_volume"](spark, SF)
    assert exchange_count(df) <= 2
    assert broadcast_join_count(df) >= 3


def test_sessionize_reuses_partitioning(spark):
    """Both window passes and the final aggregate share ONE shuffle on
    user_id — the shuffle-reuse claim in the query's docstring, pinned."""
    df = QUERIES["ev_sessionize"](spark, SF)
    assert exchange_count(df) == 1


def test_topk_has_no_shuffle(spark):
    """orderBy().limit() must compile to TakeOrderedAndProject (per-
    partition heaps + driver merge), never a global sort exchange."""
    df = QUERIES["o3_topk"](spark, SF)
    assert exchange_count(df) == 0
