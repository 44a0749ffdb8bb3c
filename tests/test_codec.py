"""Varint/gap codec property tests — round-trip exactness, the analog of
the reference's PQ code-manager round-trip tests (test_pq_manager.cpp)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flatnav_spark.codec import decode_gaps, encode_gaps, varint_decode, varint_encode


def test_empty():
    assert varint_encode(np.array([], dtype=np.int64)) == b""
    assert varint_decode(b"").size == 0
    assert encode_gaps(np.array([], dtype=np.int64)) == b""


def test_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40], dtype=np.uint64)
    buf = varint_encode(vals)
    assert varint_encode(np.array([0]))[0:1] == b"\x00"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    np.testing.assert_array_equal(varint_decode(buf), vals)


def test_negative_rejected():
    with pytest.raises(ValueError):
        varint_encode(np.array([-1], dtype=np.int64))


def test_truncated_stream_rejected():
    with pytest.raises(ValueError):
        varint_decode(b"\x80")  # continuation bit set, no terminator


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**53), max_size=300))
def test_varint_roundtrip(values):
    vals = np.array(values, dtype=np.uint64)
    out = varint_decode(varint_encode(vals))
    np.testing.assert_array_equal(out, vals)


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=10),
)
def test_gap_roundtrip(id_set, base_off):
    ids = np.array(sorted(id_set), dtype=np.int64)
    base = int(ids[0]) - base_off
    out = decode_gaps(encode_gaps(ids, base), base)
    np.testing.assert_array_equal(out, ids)


def test_gaps_require_increasing():
    with pytest.raises(ValueError):
        encode_gaps(np.array([5, 5], dtype=np.int64))
    with pytest.raises(ValueError):
        encode_gaps(np.array([5, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        encode_gaps(np.array([2], dtype=np.int64), base=5)


def test_compression_effective():
    # dense ascending ids must gap-code to ~1 byte/id
    ids = np.arange(10_000, dtype=np.int64) * 3 + 7
    buf = encode_gaps(ids, 0)
    assert len(buf) < 10_200


def test_grouped_prefix_sums_matches_per_group_cumsum():
    import numpy as np

    from flatnav_spark.query import _grouped_prefix_sums

    rng = np.random.default_rng(7)
    for _ in range(20):
        n_groups = int(rng.integers(1, 8))
        counts = rng.integers(1, 9, size=n_groups)
        values = rng.integers(0, 50, size=int(counts.sum()))
        starts = np.zeros(n_groups, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        got = _grouped_prefix_sums(values, starts, counts)
        expected = np.concatenate([
            np.cumsum(values[s: s + c]) for s, c in zip(starts, counts)
        ])
        assert (got == expected).all()
