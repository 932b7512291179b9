"""The grading-window rotation queue can never drift from its policy.

VERDICT r12 item #8: the 50-slot window the driver hash-checks each
round is derived mechanically (tools_rotation_queue.py) — new-or-
changed-graded-path arrivals first, then oldest-driver-row-first. This
pin fails the suite if ``_GRADE_FIRST`` is edited by hand in a way the
policy doesn't produce.
"""

from __future__ import annotations

import tools_rotation_queue
from mie_spark.queries import _GRADE_FIRST, _NEW_THIS_ROUND, QUERIES


def test_grade_first_matches_rotation_policy():
    derived = tools_rotation_queue.rotation_queue(list(QUERIES.keys()), _NEW_THIS_ROUND)
    assert _GRADE_FIRST == derived


def test_grade_first_leads_registry_order():
    assert list(QUERIES.keys())[: len(_GRADE_FIRST)] == _GRADE_FIRST
    assert len(_GRADE_FIRST) == tools_rotation_queue.WINDOW
