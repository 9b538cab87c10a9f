"""Posting codec roundtrips (FIXTURES.md §4)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ostrich_spark.codec import (
    BLOCK_SIZE,
    block_metadata,
    pack_blocked,
    pack_doc_ids,
    pack_tfs,
    unpack_blocked,
    unpack_doc_ids,
    unpack_tfs,
)


def test_empty():
    assert unpack_doc_ids(pack_doc_ids(np.array([], dtype=np.int64))).size == 0
    b, offs = pack_blocked(np.array([], dtype=np.int64), delta=True)
    assert b == b"" and offs == []


def test_single_doc():
    d = np.array([42], dtype=np.int64)
    assert unpack_doc_ids(pack_doc_ids(d)).tolist() == [42]


def test_dense_run():
    d = np.arange(1000, dtype=np.int64)
    assert np.array_equal(unpack_doc_ids(pack_doc_ids(d)), d)
    # dense run delta-encodes to ~1 byte/doc
    assert len(pack_doc_ids(d)) < 1010


def test_sparse_and_adversarial_gaps():
    rng = np.random.default_rng(42)
    d = np.unique(rng.integers(0, 2**32 - 1, size=5000))
    assert np.array_equal(unpack_doc_ids(pack_doc_ids(d)), d)
    d2 = np.array([0, 1, 2**32 - 2, 2**32 - 1], dtype=np.int64)
    assert np.array_equal(unpack_doc_ids(pack_doc_ids(d2)), d2)


def test_tf_values():
    t = np.array([1, 255, 256, 100000, 1], dtype=np.int64)
    assert np.array_equal(unpack_tfs(pack_tfs(t)), t)


@pytest.mark.parametrize("n", [BLOCK_SIZE - 1, BLOCK_SIZE, BLOCK_SIZE + 1, 3 * BLOCK_SIZE + 7])
def test_block_boundaries(n):
    rng = np.random.default_rng(n)
    d = np.unique(rng.integers(0, 10**7, size=n * 2))[:n]
    buf, offs = pack_blocked(d, delta=True)
    assert len(offs) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    vals, pos = unpack_blocked(buf, offs, n, delta=True)
    assert np.array_equal(vals, d)
    assert np.array_equal(pos, np.arange(n))


def test_blocked_selective_decode():
    d = np.arange(0, 10000, 3, dtype=np.int64)
    buf, offs = pack_blocked(d, delta=True)
    sel = np.array([1, 3])
    vals, pos = unpack_blocked(buf, offs, len(d), delta=True, block_indices=sel)
    expect = np.concatenate([d[BLOCK_SIZE : 2 * BLOCK_SIZE], d[3 * BLOCK_SIZE : 4 * BLOCK_SIZE]])
    assert np.array_equal(vals, expect)


def test_block_metadata():
    d = np.arange(300, dtype=np.int64)
    t = np.ones(300, dtype=np.int64)
    t[150] = 9
    ln = np.full(300, 50, dtype=np.int64)
    ln[299] = 7
    bmax_doc, bmax_tf, bmin_len = block_metadata(d, t, ln)
    assert bmax_doc == [127, 255, 299]
    assert bmax_tf == [1, 9, 1]
    assert bmin_len == [50, 50, 7]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=500, unique=True)
)
def test_roundtrip_property(xs):
    d = np.array(sorted(xs), dtype=np.int64)
    assert np.array_equal(unpack_doc_ids(pack_doc_ids(d)), d)
    buf, offs = pack_blocked(d, delta=True)
    if len(d):
        vals, _ = unpack_blocked(buf, offs, len(d), delta=True)
        assert np.array_equal(vals, d)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400
    )
)
def test_first_value_matches_full_decode(xs):
    """codec.first_value must equal element 0 of the full decode for any
    pack_blocked/pack_doc_ids buffer — the merge purge fast path relies
    on it for its decode-free min-docID range test."""
    import numpy as np

    from ostrich_spark.codec import (
        first_value,
        pack_blocked,
        pack_doc_ids,
        unpack_doc_ids,
    )

    vals = np.array(sorted(set(xs)), dtype=np.int64)
    buf = pack_doc_ids(vals)
    assert first_value(buf) == int(unpack_doc_ids(buf)[0]) == int(vals[0])
    bbuf, _ = pack_blocked(vals, delta=True)
    assert first_value(bbuf) == int(vals[0])
    nbuf, _ = pack_blocked(vals, delta=False)
    assert first_value(nbuf) == int(vals[0])
