"""Codec-law tests mirroring zebra-core/test/Test/Zebra/Serial/Binary/Array.hs.

* round-trip of arbitrary int64 vectors (Array.hs test :41-44)
* adversarial min/max alternating exact 64-blocks (:46-52)
* zigzag/unzigzag identity (:55-58)
* mid64 vs big-integer oracle (:60-67)
* byte/sized-byte/strings round-trips (:26-39)
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from zebra_spark.codec.intcodec import (
    INT_HEADER_BYTES,
    bit_length64,
    mid64,
    pack_int_array,
    packed_size,
    unpack_int_array,
    unzigzag64,
    zigzag64,
)
from zebra_spark.codec.bytecodec import (
    pack_byte_array,
    pack_sized_byte_array,
    pack_strings,
    unpack_byte_array,
    unpack_sized_byte_array,
    unpack_strings,
)

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1

int64s = st.integers(min_value=I64_MIN, max_value=I64_MAX)


def roundtrip(values: np.ndarray) -> None:
    values = np.asarray(values, dtype=np.int64)
    buf = pack_int_array(values)
    assert len(buf) == packed_size(values)
    out, pos = unpack_int_array(buf, len(values))
    assert pos == len(buf)
    np.testing.assert_array_equal(out, values)


@given(st.lists(int64s, max_size=300))
@settings(max_examples=200, deadline=None)
def test_roundtrip_arbitrary(xs):
    roundtrip(np.array(xs, dtype=np.int64))


@given(st.integers(min_value=1, max_value=4))
def test_roundtrip_minmax_adversary(nblocks):
    # alternating int64 min/max in exact 64-blocks: worst case for packing
    xs = np.tile(np.array([I64_MIN, I64_MAX], dtype=np.int64), 32 * nblocks)
    roundtrip(xs)


@pytest.mark.parametrize(
    "xs",
    [
        np.array([], dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([I64_MIN], dtype=np.int64),
        np.zeros(64, dtype=np.int64),
        np.zeros(129, dtype=np.int64),
        np.arange(1000, dtype=np.int64),  # monotone ramp, FoR-friendly
        -np.arange(200, dtype=np.int64),  # all negative
        np.full(64, 7, dtype=np.int64),  # constant chunk -> 0-bit pack
        np.array([1, -1] * 100, dtype=np.int64),
    ],
)
def test_roundtrip_edge_cases(xs):
    roundtrip(xs)


def test_roundtrip_random_big():
    rng = np.random.default_rng(42)
    for dtype_hi in (2**8, 2**16, 2**40, 2**63):
        xs = rng.integers(-dtype_hi, dtype_hi, size=5000).astype(np.int64)
        roundtrip(xs)


def test_lengths_remainder_paths():
    rng = np.random.default_rng(7)
    for n in (1, 63, 64, 65, 127, 128, 129, 191, 1000):
        roundtrip(rng.integers(-(2**31), 2**31, size=n).astype(np.int64))


@given(int64s)
def test_zigzag_identity(x):
    arr = np.array([x], dtype=np.int64)
    z = zigzag64(arr)
    assert z.dtype == np.uint64
    np.testing.assert_array_equal(unzigzag64(z), arr)
    # zigzag maps small magnitudes to small unsigned
    if -100 <= x <= 100:
        assert int(z[0]) == (2 * x if x >= 0 else -2 * x - 1)


@given(int64s, int64s)
def test_mid64_oracle(x, y):
    # big-integer oracle: floor midpoint; mid64 is commutative & overflow proof
    expect = (x + y) >> 1  # python big ints, floor division semantics
    got = mid64(x, y)
    assert got == expect
    assert mid64(y, x) == got


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_bit_length(v):
    arr = np.array([v], dtype=np.uint64)
    assert int(bit_length64(arr)[0]) == v.bit_length()


def test_packed_size_formula():
    # 64 identical ints: nbits=0 -> header + 1 nbits byte only
    xs = np.full(64, 123456, dtype=np.int64)
    assert len(pack_int_array(xs)) == INT_HEADER_BYTES + 1
    # remainder-only: n raw 8-byte words
    xs = np.arange(5, dtype=np.int64)
    assert len(pack_int_array(xs)) == INT_HEADER_BYTES + 5 * 8


@given(st.binary(max_size=2000))
@settings(max_examples=100, deadline=None)
def test_byte_array_roundtrip(data):
    buf = pack_byte_array(data)
    out, pos = unpack_byte_array(buf, len(data))
    assert out == data and pos == len(buf)
    buf2 = pack_sized_byte_array(data)
    out2, pos2 = unpack_sized_byte_array(buf2)
    assert out2 == data and pos2 == len(buf2)


@given(st.lists(st.binary(max_size=50), max_size=100))
@settings(max_examples=100, deadline=None)
def test_strings_roundtrip(strings):
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    concat = b"".join(strings)
    buf = pack_strings(lengths, concat)
    out_len, out_bytes, pos = unpack_strings(buf, len(strings))
    np.testing.assert_array_equal(out_len, lengths)
    assert out_bytes == concat and pos == len(buf)


def test_byte_array_paths():
    for data in (b"", b"x", b"ab" * 500_000, np.random.default_rng(3).bytes(100_000)):
        out, _ = unpack_byte_array(pack_byte_array(data), len(data))
        assert out == data


def test_full_range_int64_chunk_roundtrip():
    """Values spanning INT64_MIN..INT64_MAX in one full 64-chunk: zigzag
    deltas land within ~1 ulp of 2^64 where the float64 bit-length estimate
    reads 65 — the repair must clamp to 64 (shift by 64 is UB for uint64)
    and the roundtrip must stay bit-identical."""
    xs = np.array(
        [np.iinfo(np.int64).min, np.iinfo(np.int64).max] * 32, dtype=np.int64
    )
    assert len(xs) == 64  # exactly one packed chunk, no remainder
    out, _ = unpack_int_array(pack_int_array(xs), len(xs))
    np.testing.assert_array_equal(out, xs)
    # near-full-range magnitudes around the 2^63 boundary, full chunk
    hi = np.iinfo(np.int64).max
    xs2 = np.array([0, hi, -hi - 1, hi - 1, -hi, 1, -1, hi] * 8, dtype=np.int64)
    out2, _ = unpack_int_array(pack_int_array(xs2), len(xs2))
    np.testing.assert_array_equal(out2, xs2)
    # direct bit_length64 check at the repair boundary
    vals = np.array([2**64 - 1, 2**64 - 1024, 2**63, 2**63 - 1], dtype=np.uint64)
    assert bit_length64(vals).tolist() == [64, 64, 64, 63]


def test_bp64_divisor_fast_path_matches_general_wire():
    """r5: divisor widths (64 % w == 0) pack via binary doubling — the
    wire must stay IDENTICAL to the word-major general path (not merely
    roundtrippable), since BP64 bit order is normative-public and
    golden-pinned.  Re-derive the general path inline and compare every
    width, plus roundtrip through the production unpack."""
    import numpy as np
    from zebra_spark.codec.intcodec import _bp64_pack_group, _bp64_unpack_group

    U = np.uint64
    def general_pack(vals, w):
        m = vals.shape[0]
        vt = np.ascontiguousarray(vals.T)
        out = np.zeros((w, m), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(64):
                start = i * w
                wi, sh = start >> 6, start & 63
                out[wi] |= np.left_shift(vt[i], U(sh))
                if sh + w > 64:
                    out[wi + 1] |= np.right_shift(vt[i], U(64 - sh))
        return np.ascontiguousarray(out.T)

    rng = np.random.default_rng(7)
    for w in range(1, 65):
        hi = (1 << w) if w < 64 else 2**63
        vals = rng.integers(0, hi, size=(23, 64), dtype=np.uint64)
        packed = _bp64_pack_group(vals, w)
        assert np.array_equal(packed, general_pack(vals, w)), f"w={w}"
        assert np.array_equal(_bp64_unpack_group(packed, w), vals), f"w={w}"
