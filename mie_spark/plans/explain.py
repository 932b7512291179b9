"""Physical-plan inspection helpers.

The reference has no plan layer at all — its "plan" is a CozoScript
string and the optimizer is opaque inside CozoDB (SURVEY.md §3, §4.2).
In a Spark-first rebuild the plan IS the product: whether a filter
reached the parquet scan or a join broadcast decides whether a query
runs in seconds or hours at 100 TB. This module turns `.explain
("formatted")` into assertable facts so tests/test_plans.py can pin
scan hygiene (pushdown, pruning), join strategy, and shuffle counts —
the properties the 1000-executor deployment depends on.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what .explain prints)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _split_top_level(body: str) -> list[str]:
    """Split a comma-separated list at bracket depth 0 only:
    ``In(category, [a,b]), IsNotNull(x)`` is TWO entries, not three —
    a naive split would mangle every comma-bearing filter."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in body:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans, flattened.
    Empty list means NO filter reached any scan — a red flag for any
    query that filters a base table on a parquet-representable predicate."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(_split_top_level(body))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (ReadSchema).
    A scan reading 16 columns for a 2-column projection is a pruning
    failure that multiplies IO by 8× at scale."""
    plan = formatted_plan(df)
    out: list[list[str]] = []
    marker = "ReadSchema: struct<"
    # angle-bracket-depth scan, not a [^>]* regex: nested types close
    # angles too (struct<id:bigint,embedding:array<float>,extra:string>
    # would truncate at 'array<float' and silently DROP every later
    # column — fabricating the pruning facts this helper exists to pin)
    pos = 0
    while True:
        start = plan.find(marker, pos)
        if start < 0:
            break
        i = start + len(marker)
        depth = 1
        body_chars: list[str] = []
        while i < len(plan) and depth > 0:
            ch = plan[i]
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
                if depth == 0:
                    break
            body_chars.append(ch)
            i += 1
        body = "".join(body_chars)
        cols = []
        field_depth = 0
        cur: list[str] = []
        for ch in body:
            if ch == "<":
                field_depth += 1
            elif ch == ">":
                field_depth -= 1
            if ch == "," and field_depth == 0:
                cols.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            cols.append("".join(cur))
        out.append([c.split(":")[0].strip() for c in cols if ":" in c])
        pos = i
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges and
    AQE re-used/wrapped nodes). Each one is a full network shuffle of
    its input at scale — the unit of cost to minimize."""
    # formatted mode prints node headers like "(6) Exchange" with the
    # partitioning in a separate Arguments section; BroadcastExchange is
    # a distinct node name so \b keeps it out.
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    # detail headers only ("(6) BroadcastHashJoin"), so each join node
    # counts once even though it also appears in the plan tree
    plan = formatted_plan(df)
    return len(
        re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", plan)
    )


def cartesian_product_count(df: DataFrame) -> int:
    """Number of CartesianProduct / BroadcastNestedLoopJoin nodes — the
    all-pairs joins that are quadratic at scale. Candidate-generation
    operators (simhash banding, LSH self-joins) pin this to zero;
    deliberate tiny-side broadcasts (a scalar aggregate row, a literal
    query set) are the only acceptable BroadcastNestedLoop uses and get
    pinned per-query."""
    plan = formatted_plan(df)
    return len(
        re.findall(r"\(\d+\) (?:CartesianProduct|BroadcastNestedLoopJoin)", plan)
    )


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of WindowExec nodes with NO partition spec — each one
    funnels its whole input through a single task (Spark's
    "No Partition Defined" warning). The executed-plan string prints a
    partitioned window as ``Window [exprs], [partSpec], [orderSpec]``
    and an unpartitioned one with the middle group MISSING (not as an
    empty ``[]``) — but a partitioned window with NO ordering ALSO
    prints two groups (``[exprs], [partSpec]``), so two-group lines
    are disambiguated by whether the trailing group is an ORDER spec
    (contains ASC/DESC tokens): ordered trailing group = global sort,
    unordered = partition spec, fine. The repo rule: zero on any
    data-scaled input; the only sanctioned uses are provably bounded
    carriers (per-day carry in ev_concurrency, per-partition count
    carry in operators/rank.py, vocab/sketch/top-k-pool marginals) and
    those pin ``<= N`` per query."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = 0
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        depth = 0
        groups: list[str] = []
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            elif depth > 0:
                groups[-1] += ch
        if len(groups) >= 3:
            continue  # [exprs], [partSpec], [orderSpec] — partitioned
        last = groups[-1] if len(groups) == 2 else ""
        if len(groups) < 2 or " ASC" in last or " DESC" in last:
            n += 1  # ordered with no partition spec: the global sort
    return n


def wholestage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen regions the plan compiles to. More,
    wider spans = more of the query runs as generated JVM loops instead
    of volcano iterators."""
    plan = formatted_plan(df)
    return len(set(re.findall(r"codegen id : (\d+)", plan)))
