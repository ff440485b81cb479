"""Property-based tests (hypothesis) for the type-promotion lattice:
promote must be a join (least upper bound) — commutative, associative,
idempotent, with UNKNOWN as bottom — and inference must be stable under
batch splitting/reordering."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from empujar_spark.types import (
    UNKNOWN,
    ColumnType,
    infer_column_types,
    infer_value_type,
    promote,
)

kinds = st.sampled_from(
    ["unknown", "boolean", "long", "double", "timestamp", "varchar", "text",
     "binary"]
)
elements = st.sampled_from(
    ["tinyint", "smallint", "int", "bigint", "float", "double", "string",
     "boolean", "timestamp", "array<float>", "array<int>", "array<string>"]
)
scalar_types = st.builds(
    lambda k, n: ColumnType(k, n if k == "varchar" else 0),
    kinds,
    st.integers(min_value=1, max_value=1000),
)
array_types = st.builds(lambda e: ColumnType("array", element=e), elements)
col_types = st.one_of(scalar_types, array_types)

scalar_values = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=300),
    st.datetimes(min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2100, 1, 1)),
)
values = st.one_of(scalar_values, st.lists(scalar_values, max_size=4))


@given(col_types, col_types)
def test_promote_commutative(a, b):
    assert promote(a, b) == promote(b, a)


@given(col_types, col_types, col_types)
@settings(max_examples=300)
def test_promote_associative(a, b, c):
    assert promote(promote(a, b), c) == promote(a, promote(b, c))


@given(col_types)
def test_promote_idempotent(a):
    assert promote(a, a) == a


@given(col_types)
def test_unknown_is_bottom(a):
    assert promote(ColumnType(UNKNOWN), a) == a


@given(st.lists(values, max_size=20))
def test_inference_order_insensitive(vs):
    rows_fwd = [{"c": v} for v in vs]
    rows_rev = list(reversed(rows_fwd))
    t1 = infer_column_types(rows_fwd)
    t2 = infer_column_types(rows_rev)
    assert t1 == t2


@given(st.lists(values, min_size=2, max_size=20), st.integers(min_value=1, max_value=19))
def test_inference_split_invariant(vs, cut):
    """Inferring over one batch ≡ promoting the inference of two splits —
    the property that makes the one-pass reconcile (catalog.py) equal to
    the reference's per-batch fixed-point loop."""
    cut = min(cut, len(vs) - 1)
    whole = infer_column_types([{"c": v} for v in vs])
    left = infer_column_types([{"c": v} for v in vs[:cut]])
    right = infer_column_types([{"c": v} for v in vs[cut:]])
    assert promote(left["c"], right["c"]) == whole["c"]


@given(values)
def test_infer_value_total(v):
    t = infer_value_type(v)
    assert t.kind in {"unknown", "boolean", "long", "double", "timestamp",
                      "varchar", "text", "array"}
