"""F4 golden-bytes tests: detect any drift in the reference wire layout.

Layout under test (zebra-core/src/Zebra/Serial/Binary/Array.hs:153-161,
zebra-core/csrc/zebra_unpack.c:99-162): u32 size | i64 offset | nbits |
bp64 parts | raw zig-zagged remainder; strings = lengths int_array +
sized_byte_array(snappy).

The hashes/hex below were generated once (seed 7) and checked in; any
change to zigzag, mid64, bit widths, chunk order, or header layout breaks
them.  (The snappy section of the strings golden additionally pins the
pyarrow snappy output — if a pyarrow upgrade changes compression output,
re-derive that constant; decode compatibility is covered separately.)
"""

from __future__ import annotations

import hashlib

import numpy as np

from zebra_spark.codec.bytecodec import pack_strings, unpack_strings
from zebra_spark.codec.intcodec import pack_int_array, unpack_int_array

GOLDEN_INTS150_SHA = "9f4eba266a65264dabb3a37658a887fa2a18da9f0f2c9e91a41a9f93efb43931"
GOLDEN_INTS150_LEN = 446
GOLDEN_SMALL_HEX = (
    "3000000032b23ee6ffffffffa69b823300000000969b8233000000009c9b8233"
    "00000000aa9b823300000000c6353a4200000000c5353a4200000000"
)
GOLDEN_STRINGS_HEX = (
    "4000000007000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "000000000000000000000000380000002b0000003818646f632d303030090700"
    "3109070032090700330907003409073835646f632d303036646f632d303037"
)


def test_golden_int_array_150():
    rng = np.random.default_rng(7)
    ints = rng.integers(-1000, 50257, size=150).astype(np.int64)
    buf = pack_int_array(ints)
    assert len(buf) == GOLDEN_INTS150_LEN
    assert hashlib.sha256(buf).hexdigest() == GOLDEN_INTS150_SHA
    out, _ = unpack_int_array(buf, 150)
    np.testing.assert_array_equal(out, ints)


def test_golden_small_remainder_only():
    small = np.array([5, -3, 0, 7, 123456789, -987654321], dtype=np.int64)
    buf = pack_int_array(small)
    assert buf.hex() == GOLDEN_SMALL_HEX
    # layout invariants readable straight off the hex: size = 6*8 raw
    # zig-zagged int64s (remainder path), offset = mid64(min, max)
    assert int.from_bytes(buf[:4], "little") == 48
    assert int.from_bytes(buf[4:12], "little", signed=True) == (
        (-987654321 + 123456789) >> 1
    )


def test_golden_strings():
    strings = [f"doc-{i:03d}".encode() for i in range(8)]
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    buf = pack_strings(lengths, b"".join(strings))
    assert buf.hex() == GOLDEN_STRINGS_HEX
    out_len, out_bytes, _ = unpack_strings(buf, 8)
    assert out_bytes == b"".join(strings)


def test_golden_decodes_from_constants():
    """Decode straight from the checked-in hex (no encoder involved)."""
    out, _ = unpack_int_array(bytes.fromhex(GOLDEN_SMALL_HEX), 6)
    assert out.tolist() == [5, -3, 0, 7, 123456789, -987654321]
    lengths, data, _ = unpack_strings(bytes.fromhex(GOLDEN_STRINGS_HEX), 8)
    assert data == b"".join(f"doc-{i:03d}".encode() for i in range(8))


def test_bp64_bit_order_is_sequential_lsb_first():
    """Pins the BP64 packed-chunk BIT ORDER to the documented public
    layout: value i of a 64-value chunk occupies bits [i*k, (i+1)*k) of a
    little-endian 64-bit-word bitstream — the canonical sequential
    horizontal layout of Lemire & Boytsov 2012 (arXiv:1209.2137, the
    integer-compression scheme zebra's README adopts; the reference's own
    kernel lives in the non-vendored ambiata-anemone lib, so this public
    layout is normative for our format).  Expected words are hand-derived
    from the definition, independent of the implementation under test."""
    from zebra_spark.codec.intcodec import _bp64_pack_group, _bp64_unpack_group

    rng = np.random.default_rng(11)
    for k in (1, 7, 13, 64):
        lim = (1 << k) if k < 64 else (1 << 64)
        vals = rng.integers(0, lim, size=(1, 64), dtype=np.uint64)
        got = _bp64_pack_group(vals, k)
        assert got.shape == (1, k)
        # hand-derive: one big-int bitstream, value i at offset i*k,
        # then split into little-endian 64-bit words
        stream = 0
        for i in range(64):
            stream |= int(vals[0, i]) << (i * k)
        want = [(stream >> (64 * w)) & 0xFFFFFFFFFFFFFFFF for w in range(k)]
        assert [int(x) for x in got[0]] == want, f"k={k}"
        back = _bp64_unpack_group(got, k)
        np.testing.assert_array_equal(back, vals)
