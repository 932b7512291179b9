"""Domain constraints, enforced at the API layer (the reference enforces
them in Go, not in the DB — pkg/memory/helpers.go:13-57, writer.go:39-44).
"""

from __future__ import annotations

VALID_FACT_CATEGORIES = (
    "personal",
    "professional",
    "preference",
    "technical",
    "relationship",
    "general",
)

VALID_ENTITY_KINDS = (
    "person",
    "company",
    "project",
    "product",
    "technology",
    "place",
    "other",
)

VALID_DECISION_STATUSES = ("active", "superseded", "reversed")

VALID_ENTITY_ROLES = ("subject", "alternative", "stakeholder", "context")


def coerce_category(category: str | None) -> str:
    """Invalid categories coerce to 'general' (writer.go:39-41)."""
    return category if category in VALID_FACT_CATEGORIES else "general"


def validate_entity_kind(kind: str) -> None:
    """Store tool rejects invalid kinds outright (store.go:194-196)."""
    if kind not in VALID_ENTITY_KINDS:
        raise ValueError(
            f"invalid entity kind {kind!r}; valid: {', '.join(VALID_ENTITY_KINDS)}"
        )


def validate_decision_status(status: str) -> None:
    if status not in VALID_DECISION_STATUSES:
        raise ValueError(
            f"invalid status {status!r}; valid: {', '.join(VALID_DECISION_STATUSES)}"
        )


def validate_entity_role(role: str) -> None:
    if role not in VALID_ENTITY_ROLES:
        raise ValueError(
            f"invalid role {role!r}; valid: {', '.join(VALID_ENTITY_ROLES)}"
        )


def clamp_confidence(confidence: float | None) -> float:
    """Clamped to (0, 1], default 0.8 (writer.go:42-44)."""
    if confidence is None or confidence <= 0 or confidence > 1:
        return 0.8
    return float(confidence)
