"""Registry of oracle-checked queries.

Every operator family from SURVEY.md §2 (plus the LLM-pipeline
extensions) is demonstrated by at least one named query here. Each entry
is a ``(spark, sf_dir) -> DataFrame`` callable; SQL-expressible entries
also register the equivalent DuckDB SQL string so the driver can
hash-compare results (CORRECTNESS_r{N}.json).

Contract (see __spark_entry__.py): column names must match between the
Spark plan and the oracle SQL — every computed column is aliased
identically on both sides, and floating-point aggregates are rounded on
both sides so the order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the same tables.

    Queries with no oracle (genuinely non-SQL-expressible: LSH banding,
    iterative graph algorithms, streaming) get the driver's weaker
    rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects; keep at bottom to avoid cycles.
    from mie_spark.queries import (  # noqa: F401
        analytic,
        dedup,
        events,
        graph,
        multimodal,
        relational,
        sampling,
        streaming,
        text,
        vector,
    )


_load_all()
