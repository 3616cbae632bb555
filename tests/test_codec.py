"""Codec unit tests: varbyte/delta round-trip + block encode (SURVEY.md §5.1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gofias_spark.index.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    varbyte_decode,
    varbyte_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_varbyte_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**21, 2**28, 2**35, 2**62],
        dtype=np.uint64,
    )
    enc = varbyte_encode(vals)
    assert np.array_equal(varbyte_decode(enc), vals)
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    # single-byte values really take one byte
    assert len(varbyte_encode(np.array([5], dtype=np.uint64))) == 1


@given(
    st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    base = int(arr[0]) - 1
    assert np.array_equal(delta_decode(delta_encode(arr, base), base), arr)


def test_delta_rejects_nonmonotonic():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 5], dtype=np.int64), 0)
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 4], dtype=np.int64), 0)


@given(
    st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=700),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=50, deadline=None)
def test_block_roundtrip(ids, block_size):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    rng = np.random.default_rng(42)
    tfs = rng.integers(1, 1000, size=doc_ids.size).astype(np.uint64)
    dls = rng.integers(1, 100000, size=doc_ids.size).astype(np.uint64)
    blocks = encode_blocks(doc_ids, tfs, dls, block_size)
    got_ids, got_tfs, got_dls = [], [], []
    for i, blk in enumerate(blocks):
        assert blk["block_id"] == i
        assert blk["n"] <= block_size
        d, t, l = decode_block(blk)
        assert blk["last"] == d[-1]
        assert blk["tf_max"] == t.max()
        assert blk["dl_min"] == l.min()
        got_ids.append(d)
        got_tfs.append(t)
        got_dls.append(l)
    assert np.array_equal(np.concatenate(got_ids), doc_ids)
    assert np.array_equal(np.concatenate(got_tfs), tfs.astype(np.float64))
    assert np.array_equal(np.concatenate(got_dls), dls.astype(np.float64))
