"""Property-based parity of the JSONPath/key machinery against the
reference's PURE functions (IndexKey.MaterializeJPath / GenKeyStrings,
imported directly — no validator state involved, so in-process is
safe): random nested documents × random paths must materialize to
identical value lists, and key-string generation must agree on the
atomic-fast-path/wrapping/missing-member decisions."""

import json
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_extended_json_schema_validator_spark.docshred import (
    ATOMIC,
    materialize_jpath,
)


@pytest.fixture(scope="module")
def ref_index_key():
    sys.path.insert(0, "/root/reference")
    import tests.test_reference_differential as td

    td._install_shims()
    from extended_json_schema_validator.extensions.index_check import IndexKey

    return IndexKey


atoms = st.one_of(
    st.integers(-5, 5),
    st.sampled_from(["x", "y", "", "2"]),
    st.booleans(),
    st.none(),
    st.just(1.5),
)

docs = st.recursive(
    atoms,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.sampled_from(["a", "b", "c"]), inner, max_size=3),
    ),
    max_leaves=12,
)

steps = st.sampled_from(["a", "b", "c", "a[]", "b[]", "a[0]", "b[1]", "c[]"])
paths = st.lists(steps, min_size=1, max_size=3).map(".".join)


@settings(max_examples=300, deadline=None)
@given(doc=docs, path=paths)
def test_materialize_jpath_parity(ref_index_key, doc, path):
    ref = ref_index_key.MaterializeJPath(doc, path)
    mine = materialize_jpath(doc, path)
    # the reference stringifies non-atomics in place (sorted-key dumps,
    # default separators); ours returns raw values and canonicalizes at
    # shred time with the same dumps call
    mine_flat = [
        v if isinstance(v, ATOMIC) else json.dumps(v, sort_keys=True)
        for v in mine
    ]
    assert mine_flat == list(ref)


@settings(max_examples=200, deadline=None)
@given(doc=docs, m1=paths, m2=paths)
def test_gen_key_strings_cardinality_parity(ref_index_key, doc, m1, m2):
    """GenKeyStrings semantics we must mirror: NO keys when any member
    materializes empty, the cartesian COUNT otherwise, and the
    atomic-fast-path condition (exactly one member with exactly one
    atomic value).  (Serialization byte-parity is not required — both
    engines only need self-consistency — but the decision structure
    must match or dup/FK blame would diverge.)"""
    key_tuple = ref_index_key.GetKeyValues(doc, [m1, m2])
    ref_keys = ref_index_key.GenKeyStrings(key_tuple)

    v1, v2 = materialize_jpath(doc, m1), materialize_jpath(doc, m2)
    expected = 0 if (not v1 or not v2) else len(v1) * len(v2)
    assert len(ref_keys) == expected
