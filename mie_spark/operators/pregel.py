"""GraphX-parity vertex-centric primitives in DataFrame form.

BASELINE's north star names GraphX; GraphFrames (the DataFrame face of
it) is an external jar this pure-PySpark build can't ship. These two
functions are the DataFrame re-expression of its core API —
``aggregateMessages`` (one superstep: triplet join → per-edge message →
reduce by target vertex) and the ``Pregel`` loop (superstep cadence,
lineage-truncating checkpoints, optional convergence halt) — so every
iterative graph algorithm in :mod:`mie_spark.operators.graph` shares
ONE message/aggregate/update skeleton instead of re-implementing the
loop hygiene per algorithm.

Scale stance (unchanged from the hand-rolled loops these replace):

- One superstep = one shuffle keyed on the node id; the vertex-state
  table keeps the same partitioning across supersteps so the triplet
  join co-locates (AQE keeps it local when the edge side is
  pre-partitioned by src, as pagerank does).
- ``localCheckpoint`` per superstep truncates lineage — without it the
  plan grows linearly and Catalyst re-analysis dominates after ~20
  rounds (the classic iterative-Spark failure mode). Fixed-iteration
  algorithms use ``eager=False`` so the whole loop still runs as one
  job; convergence-checked algorithms materialize eagerly because the
  halt probe is an action anyway.
- The halt probe is a cheap aggregate action, never a ``collect()`` of
  the state.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A reducer is either a list of aggregate Columns over the message
# column ``msg`` (the GraphX mergeMsg fast path — sum/min/count run as
# one map-side-combined groupBy) or a callable DataFrame->DataFrame for
# reductions that aren't a single agg expression (e.g. label
# propagation's most-frequent-label argmax, which needs a count + a
# per-node window).
Reducer = Sequence[Column] | Callable[[DataFrame], DataFrame]


def aggregate_messages(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    to_dst: Column | None = None,
    to_src: Column | None = None,
    agg: Reducer,
    node_col: str = "node",
) -> DataFrame:
    """One aggregateMessages superstep over ``edges`` (src, dst, *attrs).

    ``to_dst`` is evaluated over the triplet formed by joining the
    sending vertex's state onto the edge (state of ``src`` for messages
    flowing src→dst, state of ``dst`` for ``to_src``); it may reference
    edge attributes and vertex-state columns by name. ``vertices=None``
    skips the state join entirely (messages that only depend on the
    edge, e.g. degree counting sends ``lit(1)`` both ways).

    Returns one row per message-receiving node: ``groupBy(node_col)``
    over the union of both message directions, reduced by ``agg``.
    """
    if to_dst is None and to_src is None:
        raise ValueError("at least one of to_dst/to_src is required")
    parts = []
    if to_dst is not None:
        t = (
            edges
            if vertices is None
            else edges.join(vertices, edges["src"] == vertices[node_col])
        )
        parts.append(t.select(F.col("dst").alias(node_col), to_dst.alias("msg")))
    if to_src is not None:
        t = (
            edges
            if vertices is None
            else edges.join(vertices, edges["dst"] == vertices[node_col])
        )
        parts.append(t.select(F.col("src").alias(node_col), to_src.alias("msg")))
    msgs = parts[0]
    for p in parts[1:]:
        msgs = msgs.unionAll(p)
    if callable(agg):
        return agg(msgs)
    return msgs.groupBy(node_col).agg(*agg)


def pregel(
    vertices: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    rounds: int,
    *,
    eager: bool = True,
    halt: Callable[[DataFrame, DataFrame], bool] | None = None,
) -> DataFrame:
    """Run ``step`` (full vertex-state update for one superstep, built
    from :func:`aggregate_messages`) for at most ``rounds`` supersteps.

    Each new state is ``localCheckpoint(eager=...)``-ed — the lineage
    cadence every iterative DataFrame algorithm needs. ``halt(prev,
    new)`` (optional) is evaluated after each superstep; returning True
    stops the loop with ``new`` as the result — algorithms with a
    convergence probe pair it with ``eager=True`` since the probe
    materializes the state anyway, while fixed-iteration algorithms
    pass ``halt=None, eager=False`` and run the whole loop as one job.
    """
    state = vertices
    for i in range(rounds):
        new = step(state, i).localCheckpoint(eager=eager)
        if halt is not None and halt(state, new):
            return new
        state = new
    return state
