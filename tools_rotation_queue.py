"""Derive the 50-slot grading-window rotation queue mechanically.

Steady-state rotation policy (VERDICT r12 item #8, stable from r13 on):

1. Queries added this round, or whose GRADED path (Spark plan or oracle
   SQL text) changed this round, are windowed on arrival. They are
   listed explicitly as ``NEW_THIS_ROUND`` at the top of
   ``mie_spark/queries/__init__._GRADE_FIRST`` — this is the only
   hand-maintained input.
2. The remaining slots fill oldest-driver-row-first: for every registry
   entry, find the most recent ``CORRECTNESS_r{N}.json`` containing a
   row for it; sort by ``(last_round ascending, name ascending)`` and
   take entries until the window holds 50.

Run this tool at the start of each round to print the derived queue;
``tests/test_registry.py::test_grade_first_matches_rotation_policy``
pins ``_GRADE_FIRST`` to this derivation so the queue can never drift
from the policy silently.
"""

from __future__ import annotations

import glob
import json
import os
import re

WINDOW = 50

REPO = os.path.dirname(os.path.abspath(__file__))


def last_driver_round() -> dict[str, int]:
    """Most recent round with a driver CORRECTNESS row, per query name."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def rotation_queue(registry_names: list[str], new_this_round: list[str]) -> list[str]:
    """The derived window: new arrivals first, then oldest-row-first."""
    last = last_driver_round()
    queue = list(new_this_round)
    stale = sorted(
        (n for n in registry_names if n not in queue),
        key=lambda n: (last.get(n, 0), n),
    )
    queue.extend(stale[: WINDOW - len(queue)])
    return queue


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from mie_spark.queries import _NEW_THIS_ROUND, QUERIES

    queue = rotation_queue(list(QUERIES.keys()), _NEW_THIS_ROUND)
    last = last_driver_round()
    for name in queue:
        print(f"{name:40s} last_driver_row=r{last.get(name, 0):02d}")


if __name__ == "__main__":
    main()
