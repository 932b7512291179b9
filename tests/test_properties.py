"""Property-based tests (hypothesis) for the pure-Python kernels.

The reference has no property-based tests at all (SURVEY.md §5); these
pin the invariants the whole engine leans on — ID determinism and
injectivity-by-construction, field-separator unambiguity, validator
clamps, and mock-embedding determinism + unit norm — across arbitrary
unicode inputs, not just the fixture corpus. No SparkSession needed.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from mie_spark.embedding import MockEmbeddingProvider
from mie_spark.ids import (
    entity_id,
    fact_id,
    generate_id,
    node_type_of,
    topic_id,
)
from mie_spark.validators import clamp_confidence, coerce_category

TEXT = st.text(max_size=200)


@given(TEXT, TEXT)
def test_id_shape_and_determinism(content, category):
    a = fact_id(content, category)
    b = fact_id(content, category)
    assert a == b
    assert a.startswith("fact:") and len(a) == 5 + 16
    assert node_type_of(a) == "mie_fact"


@given(TEXT, TEXT)
def test_entity_id_lowercase_stable(name, kind):
    """IDs normalize by str.lower(), matching the reference's
    strings.ToLower (ids.go:34-36,45-47). NOTE: neither engine case-
    FOLDS — 'ß' vs 'SS' are distinct entities in both — so the property
    is lower()-idempotence, not arbitrary-case equality."""
    assert entity_id(name, kind) == entity_id(name.lower(), kind)
    assert topic_id(name) == topic_id(name.lower())


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=50), TEXT)
def test_entity_id_ascii_case_insensitive(name, kind):
    assert entity_id(name, kind) == entity_id(name.swapcase(), kind)


@given(st.text(max_size=50), st.text(max_size=50), st.text(max_size=50))
def test_field_order_matters(a, b, c):
    """join('|') is order-sensitive: permuting distinct fields must not
    collide (sha256 collision odds aside)."""
    if a != b:
        assert generate_id("fact", a, b) != generate_id("fact", b, a)
    assert generate_id("fact", a, b, c) == generate_id("fact", a, b, c)


@given(st.one_of(st.none(), st.floats(allow_nan=False), st.just(0.0)))
def test_confidence_clamped_to_unit_interval(conf):
    out = clamp_confidence(conf)
    assert 0.0 < out <= 1.0


@given(st.one_of(st.none(), TEXT))
def test_category_always_valid(cat):
    from mie_spark.validators import VALID_FACT_CATEGORIES

    assert coerce_category(cat) in VALID_FACT_CATEGORIES


@settings(max_examples=50)
@given(TEXT, st.integers(min_value=2, max_value=64))
def test_mock_embedding_unit_norm_and_stable(text, dim):
    p = MockEmbeddingProvider(dimension=dim)
    v1 = p.embed_query(text)
    v2 = p.embed([text])[0]
    assert v1 == v2
    assert len(v1) == dim
    norm = math.sqrt(sum(x * x for x in v1))
    assert abs(norm - 1.0) < 1e-9 or norm == 0.0
