"""Deterministic content-hash identity.

Parity with the reference (pkg/memory/ids.go:16-47):
    GenerateID(prefix, fields...) = prefix + ":" + hex(sha256(join(fields, "|")))[:16]
Entity and topic names are lowercased before hashing (case-insensitive
dedup); prefixes double as type tags for dispatch (`fact:` `dec:` `ent:`
`evt:` `top:`, reader.go:310-325).

Same content ⇒ same ID ⇒ upsert gives idempotent, dedup-by-construction
writes.

KNOWN reference-inherited semantics (kept for parity — the content-hash
idempotency story depends on byte-identical IDs): the field separator
`|` is NOT escaped, exactly as in the reference's
``strings.Join(fields, "|")`` (ids.go:16-20). Fields that themselves
contain `|` can therefore collide under permutation or re-splitting —
e.g. ``generate_id("fact", "", "|") == generate_id("fact", "|", "")``
(both join to ``"||"``). This is the same class of inherited quirk as
the threshold comparison in SURVEY §2.10: documented, tested at the
boundary, deliberately not "fixed".

Provided both as plain Python (driver-side single writes) and
as Spark column expressions (bulk ingest: sha2 + substring stay in
whole-stage codegen, so a 100 TB ingest derives IDs with zero Python).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

PREFIXES = ("fact", "dec", "ent", "evt", "top")


def generate_id(prefix: str, *fields: str) -> str:
    digest = hashlib.sha256("|".join(fields).encode("utf-8")).hexdigest()
    return f"{prefix}:{digest[:16]}"


def fact_id(content: str, category: str) -> str:
    return generate_id("fact", content, category)


def decision_id(title: str, rationale: str) -> str:
    return generate_id("dec", title, rationale)


def entity_id(name: str, kind: str) -> str:
    return generate_id("ent", name.lower(), kind)


def event_id(title: str, event_date: str) -> str:
    return generate_id("evt", title, event_date)


def topic_id(name: str) -> str:
    return generate_id("top", name.lower())


def node_type_of(node_id: str) -> str:
    """Prefix-dispatch (writer.go:409-425): `fact:` is 5 chars, the rest 4."""
    for prefix, table in (
        ("fact:", "mie_fact"),
        ("dec:", "mie_decision"),
        ("ent:", "mie_entity"),
        ("evt:", "mie_event"),
        ("top:", "mie_topic"),
    ):
        if node_id.startswith(prefix):
            return table
    raise ValueError(f"unrecognized node id prefix: {node_id!r}")


# --- column-expression variants (bulk/distributed ingest) -------------------

def id_expr(prefix: str, *field_cols: Column) -> Column:
    """concat_ws silently SKIPS null fields (and their separator), which
    would let ('a', NULL, 'b') collide with ('a', 'b') and let a NULL
    category hash differently from the driver path's coerced value — so
    nulls are made explicit before joining. The driver-path Python ids
    never see nulls (coercion happens first); this keeps the column
    variant on the same footing."""
    joined = F.concat_ws("|", *[F.coalesce(c.cast("string"), F.lit("\x00")) for c in field_cols])
    return F.concat(F.lit(prefix), F.lit(":"), F.substring(F.sha2(joined, 256), 1, 16))


def fact_id_expr(content: Column, category: Column) -> Column:
    """Mirrors ids.fact_id + validators.coerce_category: a NULL/unknown
    category coerces to 'general' BEFORE hashing, so bulk-ingest ids
    equal driver-path ids for the same logical fact (the dedup
    invariant: same content => same ID)."""
    from mie_spark.validators import VALID_FACT_CATEGORIES

    coerced = F.when(
        category.isin(*sorted(VALID_FACT_CATEGORIES)), category
    ).otherwise(F.lit("general"))
    return id_expr("fact", content, coerced)


def entity_id_expr(name: Column, kind: Column) -> Column:
    return id_expr("ent", F.lower(name), kind)


def topic_id_expr(name: Column) -> Column:
    return id_expr("top", F.lower(name))
