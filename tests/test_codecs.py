"""Codec-menu + auto-selector laws.

Selector contract (north rule): decode is bit-identical AND selected size
<= zebra reference codec size for the same column (framing excluded).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from zebra_spark.codec import fsst
from zebra_spark.codec.codecs import (
    IntCodec,
    StrCodec,
    decode_ints,
    decode_strings,
    encode_ints,
    encode_strings,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def roundtrip_ints(values, expect_codec=None):
    values = np.asarray(values, dtype=np.int64)
    codec, payload, meta = encode_ints(values)
    out, pos = decode_ints(codec, payload, len(values))
    np.testing.assert_array_equal(out, values)
    assert pos == len(payload)
    assert meta["bytes"] <= meta["zebra_bytes"], "selector exceeded zebra bound"
    assert len(payload) == meta["bytes"]
    if expect_codec is not None:
        assert codec == expect_codec, IntCodec.NAMES[codec]
    return codec, meta


@given(st.lists(I64, max_size=200))
@settings(max_examples=150, deadline=None)
def test_selector_roundtrip_arbitrary(xs):
    roundtrip_ints(xs)


def test_selector_picks_sensible_codecs():
    rng = np.random.default_rng(0)
    # constant column
    roundtrip_ints(np.full(1000, 42), expect_codec=IntCodec.CONSTANT)
    # run-heavy column (r5: ZSTD_BT may out-compress RLE's two int arrays
    # by >15% on byte-width runs, clearing its decode handicap — both are
    # sensible; the handicap arithmetic is what the assert protects)
    runs = np.repeat(rng.integers(0, 5, size=30), rng.integers(50, 200, size=30))
    c, _ = roundtrip_ints(runs)
    assert c in (IntCodec.RLE, IntCodec.CONSTANT, IntCodec.ZSTD_BT)
    # low-cardinality scattered -> dict or zebra (dict wins when range >> card)
    vals = rng.choice(np.array([10**12, -(10**14), 3, 77], dtype=np.int64), 2000)
    c, _ = roundtrip_ints(vals)
    assert c == IntCodec.DICT
    # monotone with big base and small steps -> delta
    ramp = np.cumsum(rng.integers(0, 3, size=5000)) + 10**15
    c, _ = roundtrip_ints(ramp)
    assert c == IntCodec.DELTA
    # uniform random full-range -> zebra fallback
    rand = rng.integers(-(2**62), 2**62, size=1000)
    roundtrip_ints(rand, expect_codec=IntCodec.ZEBRA)


def test_each_int_codec_decodes():
    """Force each codec and verify decode, independent of selector choice."""
    rng = np.random.default_rng(1)
    vals = np.repeat(rng.integers(0, 9, size=40), rng.integers(1, 60, size=40))
    for allow in ({IntCodec.ZEBRA}, {IntCodec.RLE}, {IntCodec.DICT}, {IntCodec.DELTA}):
        codec, payload, _ = encode_ints(vals, allow=allow | {IntCodec.ZEBRA})
        out, _ = decode_ints(codec, payload, len(vals))
        np.testing.assert_array_equal(out, vals)


def _mk_strings(strings):
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    return lengths, b"".join(strings)


def roundtrip_strings(strings, allow=None, expect_codec=None):
    lengths, concat = _mk_strings(strings)
    codec, payload, meta = encode_strings(lengths, concat, allow=allow)
    out_len, out_bytes, pos = decode_strings(codec, payload, len(strings))
    np.testing.assert_array_equal(out_len, lengths)
    assert out_bytes == concat
    assert pos == len(payload)
    if allow is None:
        assert meta["bytes"] <= meta["zebra_bytes"]
    if expect_codec is not None:
        assert codec == expect_codec, StrCodec.NAMES[codec]
    return codec, meta


@given(st.lists(st.binary(max_size=30), max_size=80))
@settings(max_examples=80, deadline=None)
def test_strings_selector_arbitrary(strings):
    roundtrip_strings(strings)


def test_string_dict_wins_on_low_cardinality():
    strings = [b"web", b"code", b"books", b"wiki", b"forums"] * 400
    c, meta = roundtrip_strings(strings)
    assert c == StrCodec.DICT
    assert meta["bytes"] < meta["zebra_bytes"]


def test_string_fsst_forced_roundtrip():
    rng = np.random.default_rng(2)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"compression"]
    strings = [
        b" ".join(words[i] for i in rng.integers(0, len(words), size=8))
        for _ in range(300)
    ]
    roundtrip_strings(strings, allow={StrCodec.FSST, StrCodec.ZEBRA})


def test_fsst_section_roundtrip():
    rng = np.random.default_rng(3)
    base = b"hello world, this is a compressible string! " * 200
    noisy = bytes(rng.integers(0, 256, size=1000).astype(np.uint8)) + base
    for data in (base, noisy):
        sec = fsst.compress(data)
        assert sec is not None
        out, pos = fsst.decompress(sec)
        assert out == data and pos == len(sec)
        assert len(sec) < len(base) + 1500


def test_fsst_escape_run_parsing():
    # adversarial: data full of 0xFF bytes (escape byte) and repeats
    data = bytes([255, 255, 254, 255, 1, 2, 3] * 120)
    sec = fsst.compress(data)
    if sec is not None:
        out, _ = fsst.decompress(sec)
        assert out == data


def test_fsst_symbol_length_capped_at_u8():
    """Regression (r5): highly repetitive text let byte-pair merges double
    a symbol past 255 bytes, overflowing the wire's u8 symbol length and
    crashing compress.  The trainer now merges the most frequent pair
    whose expansion still fits."""
    reps = [(("the model pipeline compression token %d " % (i % 7)) * 12)
            .encode() for i in range(500)]
    data = b"".join(reps)
    sec = fsst.compress(data)
    if sec is not None:
        out, pos = fsst.decompress(sec)
        assert out == data and pos == len(sec)
    # and through the string selector under the size policy (the path
    # that crashed: the FSST probe on a 64 KB sample of this text)
    from zebra_spark.codec import codecs

    lengths = np.array([len(s) for s in reps], dtype=np.int64)
    with codecs.codec_policy("size"):
        c, pl, _ = encode_strings(lengths, data, probe_key="t.fsst.cap")
    ol, ob, _ = decode_strings(c, pl, len(reps))
    assert ob == data
    codecs._FSST_PROBE_CACHE.pop("t.fsst.cap", None)
    codecs._GP_PROBE_CACHE.pop("t.fsst.cap", None)


def test_fsst_incompressible_returns_none_or_roundtrips():
    data = np.random.default_rng(5).bytes(4096)
    sec = fsst.compress(data)
    if sec is not None:
        out, _ = fsst.decompress(sec)
        assert out == data


@pytest.mark.parametrize("n", [0, 1, 63, 64, 65, 1000])
def test_empty_and_small(n):
    rng = np.random.default_rng(n)
    roundtrip_ints(rng.integers(-100, 100, size=n))
    roundtrip_strings([b"x" * (i % 5) for i in range(n)])


def test_pfor_beats_zebra_on_zipf_outliers():
    """Patched FoR: zipf token streams (rare large tokens in most 64-chunks)
    must compress below the per-chunk-width zebra codec, decode exactly."""
    import numpy as np

    from zebra_spark.codec.codecs import (
        IntCodec,
        decode_ints,
        encode_ints,
        skip_ints,
        zebra_int_size,
    )

    rng = np.random.default_rng(7)
    # high-cardinality base (dict cannot pay off) + 1% huge outliers: every
    # 64-chunk contains one, so zebra pays 50 bits for all 64 values
    base = rng.integers(0, 1 << 20, size=50_000)
    mask = rng.random(50_000) < 0.01
    v = np.where(mask, rng.integers(0, 1 << 50, size=50_000), base).astype(np.int64)
    codec, payload, meta = encode_ints(v)
    assert codec == IntCodec.PFOR and meta["codec"] == "pfor"
    assert len(payload) < 0.5 * zebra_int_size(v)
    out, p = decode_ints(codec, payload, len(v), 0)
    assert p == len(payload) and (out == v).all()
    assert skip_ints(codec, payload, len(v), 0) == len(payload)
    # zipf token stream: SOME sub-zebra codec wins (pfor or dict, exact min)
    z = np.minimum(rng.zipf(1.35, size=50_000) - 1, 50_256).astype(np.int64)
    zc, zp, zm = encode_ints(z)
    assert len(zp) < 0.85 * zebra_int_size(z)
    zout, _ = decode_ints(zc, zp, len(z), 0)
    assert (zout == z).all()


def test_alp_decimal_floats():
    """Decimal-valued doubles (prices/rates) select ALP and shrink far
    below the bit-cast packing; bit-exact incl. the scaled-int division."""
    import numpy as np

    from zebra_spark.codec.codecs import (
        IntCodec,
        decode_ints,
        encode_ints,
        skip_ints,
        zebra_int_size,
    )

    rng = np.random.default_rng(5)
    prices = np.round(rng.uniform(1, 100000, size=20000), 2)
    v = prices.view(np.int64)
    c, payload, meta = encode_ints(v, float_view=True)
    assert c == IntCodec.ALP and meta["codec"] == "alp"
    assert len(payload) < 0.5 * zebra_int_size(v)
    out, p = decode_ints(c, payload, len(v), 0)
    assert p == len(payload) and (out == v).all()
    assert skip_ints(c, payload, len(v), 0) == len(payload)
    # without the float hint the candidate is never offered
    c2, _, _ = encode_ints(v)
    assert c2 != IntCodec.ALP


def test_alp_rejects_unrepresentable():
    """NaN/inf/-0.0/non-decimal columns never select ALP; roundtrip holds."""
    import numpy as np

    from zebra_spark.codec.codecs import IntCodec, decode_ints, encode_ints

    cases = [
        np.array([0.0, -0.0] * 200),              # -0.0 breaks the bit check
        np.array([np.nan, 1.5, 2.25] * 100),      # NaN
        np.random.default_rng(2).normal(size=5000),  # full-mantissa values
        np.array([1e300, 2.5e-300] * 100),        # out of 2^53 scaled range
    ]
    for f in cases:
        v = f.view(np.int64)
        c, payload, _ = encode_ints(v, float_view=True)
        assert c != IntCodec.ALP
        out, _ = decode_ints(c, payload, len(v), 0)
        assert (out == v).all()


def test_pfor_roundtrip_property():
    """Random mixtures incl. negative bases and huge outliers round-trip
    bit-identically whatever the selector picks."""
    import numpy as np

    from zebra_spark.codec.codecs import decode_ints, encode_ints

    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(256, 5000))
        base = rng.integers(-(2**40), 2**40, size=n)
        mask = rng.random(n) < 0.02
        v = np.where(mask, rng.integers(-(2**62), 2**62, size=n), base).astype(
            np.int64
        )
        c, payload, _ = encode_ints(v)
        out, p = decode_ints(c, payload, n, 0)
        assert p == len(payload) and (out == v).all()


def test_sampled_gates_keep_winners_at_scale():
    """Above the gate threshold, slice estimates must keep delta (sorted)
    and dict (low-cardinality) candidates in play — and stay bit-exact."""
    import numpy as np

    from zebra_spark.codec.codecs import IntCodec, decode_ints, encode_ints

    n = 400_000
    sorted_vals = np.cumsum(
        np.random.default_rng(1).integers(0, 5, size=n)
    ).astype(np.int64)
    c, payload, _ = encode_ints(sorted_vals)
    assert c == IntCodec.DELTA
    out, _ = decode_ints(c, payload, n, 0)
    assert (out == sorted_vals).all()

    lowcard = np.random.default_rng(2).integers(0, 7, size=n).astype(np.int64) * 1000
    c2, payload2, _ = encode_ints(lowcard)
    assert c2 in (IntCodec.DICT, IntCodec.RLE, IntCodec.PFOR)
    out2, _ = decode_ints(c2, payload2, n, 0)
    assert (out2 == lowcard).all()


def test_fsst_probe_cache_positive_fires_every_block(monkeypatch):
    """r3 ADVICE regression: a cached-POSITIVE probe decision must make
    every subsequent block of that column attempt FSST (the r3 code
    recomputed the heuristic after the cache hit and overwrote it, so
    FSST ran on only 1 of every 64 blocks of a winning column)."""
    from zebra_spark.codec import codecs

    calls = {"n": 0}
    real = codecs._fsst.compress

    def counting(data, *a, **k):
        calls["n"] += 1
        return real(data, *a, **k)

    monkeypatch.setattr(codecs._fsst, "compress", counting)
    key = "test://fsst-cache-positive"
    codecs._FSST_PROBE_CACHE[key] = (True, 63)
    try:
        strings = [
            b"the quick brown fox jumps over the lazy dog %06d" % i
            for i in range(200)
        ]
        lengths, concat = _mk_strings(strings)
        # heuristic alone would NOT fire here (snappy compresses this well)
        codec, payload, meta = encode_strings(lengths, concat, probe_key=key)
        # probe is disallowed on a cache hit, so any compress call is the
        # full-column FSST attempt gated by the cached decision
        assert calls["n"] >= 1
        out_len, out_bytes, _ = decode_strings(codec, payload, len(strings))
        assert out_bytes == concat and (out_len == lengths).all()
        # and the use counter ticked down
        assert codecs._FSST_PROBE_CACHE[key] == (True, 62)
    finally:
        codecs._FSST_PROBE_CACHE.pop(key, None)


def test_delta_selected_through_handicap_on_large_size_win(monkeypatch):
    """Under the balanced policy DELTA pays a 5% decode handicap; a column
    where DELTA is >15% smaller than every other candidate clears that bar
    arithmetically (1.05 * 0.85 < 1) and must still be selected.  (r4
    shipped an explicit "waiver" branch for this case; r4 ADVICE proved it
    dead code — the handicap alone produces the same selection — so r5
    removed it and this test pins the selection behavior.)"""
    from zebra_spark.codec import codecs

    monkeypatch.setattr(codecs, "_CODEC_POLICY", "balanced")
    rng = np.random.default_rng(5)
    # monotonic with ~1000-sized steps: zebra/pfor need ~23 bits for the
    # absolute range, delta needs ~11 for the steps -> >15% smaller
    vals = np.cumsum(rng.integers(950, 1050, size=8192)).astype(np.int64)
    c, payload, meta = encode_ints(vals)
    assert c == IntCodec.DELTA, IntCodec.NAMES[c]
    out, _ = decode_ints(c, payload, len(vals))
    np.testing.assert_array_equal(out, vals)


def test_delta_v0_legacy_wire_still_decodes():
    """Blocks persisted before the r4 inner-codec wire carry DELTA_V0
    (i64 first | zebra int_array of deltas) — decode and skip must keep
    reading them (resumable encode outputs survive upgrades)."""
    import numpy as np

    from zebra_spark.codec.codecs import IntCodec, decode_ints, skip_ints
    from zebra_spark.codec.intcodec import pack_int_array

    vals = np.cumsum(np.arange(1, 300, dtype=np.int64))
    deltas = np.subtract(vals[1:], vals[:-1], dtype=np.int64)
    legacy = np.int64(vals[0]).astype("<i8").tobytes() + pack_int_array(deltas)
    out, pos = decode_ints(IntCodec.DELTA_V0, legacy, len(vals))
    np.testing.assert_array_equal(out, vals)
    assert pos == len(legacy)
    assert skip_ints(IntCodec.DELTA_V0, legacy, len(vals), 0) == len(legacy)


def test_alp_rd_roundtrip_profiles():
    """ALP-RD (r5): full-mantissa floats split at a bit cut — left-parts
    dictionary + fixed-width right pack (Afroozeh & Boncz VLDB'23, the
    'real doubles' half).  Pure bit transform, so the roundtrip must be
    exact for every float profile, including the sign-extended float32
    patterns embeddings use and the trailing-zero (f32-representable f64)
    shift path."""
    rng = np.random.default_rng(11)
    profiles = {
        "f32_patterns": (
            (rng.standard_normal(8192).astype(np.float32) * 0.3)
            .view(np.int32).astype(np.int64),
            {"float32_view": True},
        ),
        "f64_full_mantissa": (
            (rng.standard_normal(8192) * 1e3).view(np.int64),
            {"float_view": True},
        ),
        "f64_from_f32_tz": (
            rng.standard_normal(8192).astype(np.float32).astype(np.float64)
            .view(np.int64),
            {"float_view": True},
        ),
    }
    for name, (vals, kw) in profiles.items():
        c, payload, meta = encode_ints(vals, **kw)
        assert c == IntCodec.ALP_RD, (name, IntCodec.NAMES[c])
        out, pos = decode_ints(c, payload, len(vals))
        np.testing.assert_array_equal(out, vals, err_msg=name)
        assert pos == len(payload)
        from zebra_spark.codec.codecs import skip_ints

        assert skip_ints(c, payload, len(vals)) == len(payload)
        assert meta["bytes"] < meta["zebra_bytes"], name


def test_alp_rd_wild_values_forced():
    """NaN payloads, infinities and signed zeros ride ALP-RD unchanged
    when it is forced via allow= (the transform never inspects float
    semantics, only bits)."""
    wild = np.array(
        [np.nan, np.inf, -np.inf, -0.0, 0.0, 1.5, -1.5, 2.0**-1060] * 32,
        dtype=np.float64,
    ).view(np.int64)
    c, payload, _ = encode_ints(
        wild, allow={IntCodec.ZEBRA, IntCodec.ALP_RD}, float_view=True
    )
    out, _ = decode_ints(c, payload, len(wild))
    np.testing.assert_array_equal(out, wild)


def test_alp_rd_wire_layout():
    """Wire: u8 r | u8 tz | u32 n_dict | BP64 right groups | dict
    int_array | codes int_array — parse the scalars back and check the
    section arithmetic skip_ints relies on."""
    rng = np.random.default_rng(3)
    # f32-representable doubles: tz must be >= 29 (trailing mantissa zeros)
    vals = rng.standard_normal(4096).astype(np.float32).astype(np.float64)
    v = vals.view(np.int64)
    c, payload, _ = encode_ints(v, float_view=True)
    assert c == IntCodec.ALP_RD
    r, tz = payload[0], payload[1]
    n_dict = int(np.frombuffer(payload[2:6], dtype="<u4")[0])
    assert tz >= 29
    assert 0 < r < 64 - tz
    assert n_dict >= 1
    n_groups = -(-len(v) // 64)
    p = 6 + n_groups * 8 * r
    # dict int_array then codes int_array, each self-sized
    for _ in range(2):
        size = int(np.frombuffer(payload[p : p + 4], dtype="<u4")[0])
        p += 12 + size
    assert p == len(payload)


def test_zlib_string_codec_roundtrip_and_gate():
    """r5 ext: DEFLATE string candidate (stdlib stand-in for zstd), probe-
    gated like FSST with its own per-column cache + decode budget.  Forced
    and auto paths both roundtrip; the wire is skippable."""
    from zebra_spark.codec import codecs
    from zebra_spark.codec.codecs import skip_strings

    rng = np.random.default_rng(4)
    words = [b"the", b"model", b"training", b"pipeline", b"compression"]
    strings = [
        b" ".join(words[i] for i in rng.integers(0, len(words), size=40))
        for _ in range(2000)
    ]
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    concat = b"".join(strings)
    # forced
    c, pl, m = encode_strings(
        lengths, concat, allow={StrCodec.ZEBRA, StrCodec.ZLIB}
    )
    assert c == StrCodec.ZLIB
    ol, ob, p = decode_strings(c, pl, len(strings))
    assert ob == concat and (ol == lengths).all() and p == len(pl)
    assert skip_strings(c, pl, len(strings)) == len(pl)
    assert m["bytes"] < 0.6 * m["zebra_bytes"]  # entropy coding wins on text
    # auto probe under balanced + cache hit on the next block (the active
    # general-purpose candidate is zstd here, DEFLATE where pyarrow lacks it)
    key = "test.zlib.col"
    try:
        c2, pl2, _ = encode_strings(lengths, concat, probe_key=key)
        assert key in codecs._GP_PROBE_CACHE
        c3, _, _ = encode_strings(lengths, concat, probe_key=key)
        assert c3 == c2
        ol, ob, _ = decode_strings(c2, pl2, len(strings))
        assert ob == concat
    finally:
        codecs._GP_PROBE_CACHE.pop(key, None)


def test_zstd_string_codec_roundtrip_and_selection():
    """r5 ext: zstd replaces DEFLATE as the general-purpose candidate when
    the pyarrow codec is available (strictly dominates DEFLATE-6 on text:
    smaller, faster compress, 4x faster decompress).  Forced and auto
    paths roundtrip; the wire is skippable; DEFLATE stays decodable."""
    from zebra_spark.codec import codecs
    from zebra_spark.codec.codecs import skip_strings

    if not codecs._zstd_available():
        import pytest

        pytest.skip("pyarrow zstd codec unavailable")
    rng = np.random.default_rng(7)
    words = [b"the", b"model", b"training", b"pipeline", b"compression"]
    strings = [
        b" ".join(words[i] for i in rng.integers(0, len(words), size=40))
        for _ in range(2000)
    ]
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    concat = b"".join(strings)
    # forced
    c, pl, m = encode_strings(
        lengths, concat, allow={StrCodec.ZEBRA, StrCodec.ZSTD}
    )
    assert c == StrCodec.ZSTD and m["codec"] == "zstd"
    ol, ob, p = decode_strings(c, pl, len(strings))
    assert ob == concat and (ol == lengths).all() and p == len(pl)
    assert skip_strings(c, pl, len(strings)) == len(pl)
    assert m["bytes"] < 0.6 * m["zebra_bytes"]
    # auto probe under balanced selects zstd on this text
    key = "test.zstd.col"
    try:
        c2, pl2, _ = encode_strings(lengths, concat, probe_key=key)
        assert c2 == StrCodec.ZSTD
        ol, ob, _ = decode_strings(c2, pl2, len(strings))
        assert ob == concat
    finally:
        codecs._GP_PROBE_CACHE.pop(key, None)
        codecs._GP_LOSS_STREAK.pop(key, None)
    # size policy compresses at least as well as balanced
    with codecs.codec_policy("size"):
        c4, pl4, _ = encode_strings(
            lengths, concat, allow={StrCodec.ZEBRA, StrCodec.ZSTD}
        )
    assert c4 == StrCodec.ZSTD and len(pl4) <= len(pl)
    ol, ob, _ = decode_strings(c4, pl4, len(strings))
    assert ob == concat and (ol == lengths).all()


def test_probe_loss_streak_flips_cached_positive():
    """r5 review fix: a cached-positive FSST/ZLIB probe attempts the full
    candidate on every block; after _PROBE_LOSS_LIMIT consecutive
    selection losses the cache flips negative so later blocks stop paying
    for a candidate that keeps being discarded (64-block revalidation
    re-probes)."""
    from zebra_spark.codec import codecs

    rng = np.random.default_rng(11)
    # 8 distinct random-32B strings repeated 10000x: the DICT candidate
    # collapses them to 256 unique bytes + ~4-bit indices, while any
    # sequence compressor (zstd or DEFLATE) still pays a match token per
    # repeat — the gp candidate computes every block (cached-positive)
    # and loses every block
    uniq = [rng.bytes(32) for _ in range(8)]
    strings = [uniq[i] for i in rng.integers(0, 8, size=10000)]
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    concat = b"".join(strings)
    gp_ids = {StrCodec.ZLIB, StrCodec.ZSTD}
    key = "test.zlib.losses"
    try:
        codecs._GP_PROBE_CACHE[key] = (True, 63)
        for i in range(codecs._PROBE_LOSS_LIMIT):
            assert codecs._GP_PROBE_CACHE[key][0] is True
            c, _, _ = encode_strings(lengths, concat, probe_key=key)
            assert c not in gp_ids  # computed, lost
        assert codecs._GP_PROBE_CACHE[key][0] is False
        # and the next block no longer computes the candidate at all
        # (cache negative, probe suppressed for 63 blocks)
        c, _, _ = encode_strings(lengths, concat, probe_key=key)
        assert c not in gp_ids
    finally:
        codecs._GP_PROBE_CACHE.pop(key, None)
        codecs._GP_LOSS_STREAK.pop(key, None)


def test_f1_token_column_compression_pin():
    """Drift guard for the round-5 headline: the F1 token column must
    keep selecting ZSTD_BT and land well under zebra (measured 9.38 vs
    16.13 b/tok = 0.58; the pin leaves slack for data-generation and
    library drift but catches a selector regression immediately)."""
    from zebra_spark.codec import codecs
    from zebra_spark.sources.synth import f1_batch

    if not codecs._zstd_available():
        pytest.skip("pyarrow zstd codec unavailable")
    b = f1_batch(3000, seed=42)
    flat = np.ascontiguousarray(
        b.column("tokens").flatten().to_numpy(), dtype=np.int64
    )
    c, pl, m = encode_ints(flat)
    assert c == IntCodec.ZSTD_BT
    assert m["bytes"] < 0.65 * m["zebra_bytes"]
    out, p = decode_ints(c, pl, len(flat))
    assert (out == flat).all() and p == len(pl)


def test_fsst_z_roundtrip_and_size_policy_selection():
    """r5 ext (str codec 5): the FSST section re-entropy-coded by zstd.
    FSST's dense byte codes still carry ~20-25% Huffman slack; the stack
    rides the SAME decode-budget probe family as FSST, so balanced
    selection changes only where FSST itself clears the budget — THERE
    FSST_Z may also be selected (the added inflate on the ~0.18x section
    is cheap and covered by FSST's budget); where the gate fails (this
    sandbox), balanced is untouched and the size policy gains the full
    win (document text: fsst 0.503 -> fsst-zstd 0.389 of zebra)."""
    from zebra_spark.codec import codecs
    from zebra_spark.codec.codecs import skip_strings

    if not codecs._zstd_available():
        pytest.skip("pyarrow zstd codec unavailable")
    rng = np.random.default_rng(8)
    words = [b"the", b"model", b"training", b"pipeline", b"compression",
             b"tokens", b"columnar"]
    strings = [
        b" ".join(words[i] for i in rng.integers(0, len(words), size=60))
        for _ in range(1500)
    ]
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    concat = b"".join(strings)
    c, pl, m = encode_strings(
        lengths, concat, allow={StrCodec.ZEBRA, StrCodec.FSST_Z}
    )
    assert c == StrCodec.FSST_Z and m["codec"] == "fsst-zstd"
    ol, ob, p = decode_strings(c, pl, len(strings))
    assert ob == concat and (ol == lengths).all() and p == len(pl)
    assert skip_strings(c, pl, len(strings)) == len(pl)
    # the stack must not lose to plain FSST on compressible text
    c2, pl2, _ = encode_strings(
        lengths, concat, allow={StrCodec.ZEBRA, StrCodec.FSST}
    )
    assert c2 == StrCodec.FSST and len(pl) < len(pl2)
    # a win by FSST_Z must not advance the shared FSST loss streak
    key = "test.fsstz.family"
    try:
        codecs._FSST_PROBE_CACHE[key] = (True, 63)
        codecs._FSST_LOSS_STREAK[key] = codecs._PROBE_LOSS_LIMIT - 1
        c3, _, _ = encode_strings(lengths, concat, probe_key=key)
        if c3 == StrCodec.FSST_Z:
            assert codecs._FSST_LOSS_STREAK[key] == 0
            assert codecs._FSST_PROBE_CACHE[key][0] is True
    finally:
        codecs._FSST_PROBE_CACHE.pop(key, None)
        codecs._FSST_LOSS_STREAK.pop(key, None)


def test_zstd_bt_roundtrip_and_selection():
    """r5 ext (int codec 9): FoR + byte-transposed planes + zstd-1.  The
    FSE entropy stage wins where bit-packing pays the chunk width for
    zipf-distributed values (the F1 token column: 16.00 -> 9.38 b/tok).
    Under balanced it carries a 1.15 decode handicap; policy `speed`
    never offers it (keeps the verify re-encode audit deterministic)."""
    from zebra_spark.codec import codecs
    from zebra_spark.codec.codecs import skip_ints

    if not codecs._zstd_available():
        pytest.skip("pyarrow zstd codec unavailable")
    rng = np.random.default_rng(5)
    zipf = np.minimum(rng.zipf(1.2, size=200_000) - 1, 50_256).astype(np.int64)
    c, pl, m = encode_ints(zipf)
    assert c == IntCodec.ZSTD_BT and m["codec"] == "zstd-bt"
    out, p = decode_ints(c, pl, len(zipf))
    assert (out == zipf).all() and p == len(pl)
    assert skip_ints(c, pl, len(zipf)) == len(pl)
    # must be >15% under the next-best candidate to have been selected
    assert m["bytes"] < m["zebra_bytes"] / 1.15
    # wire header: u8 width | i64 vmin | u32 comp_len | zstd frame
    assert pl[0] == 2  # vocab < 2^16 -> two byte planes
    assert int(np.frombuffer(pl[1:9], dtype="<i8")[0]) == int(zipf.min())
    comp_len = int(np.frombuffer(pl[9:13], dtype="<u4")[0])
    assert 13 + comp_len == len(pl)
    # forced-candidate roundtrips across widths incl. wrap-around ranges
    from zebra_spark.codec.codecs import _zstd_bt_build, plan_int_array

    for v in (
        rng.integers(0, 200, 5000),  # width 1
        rng.integers(-(2**31), 2**31, 5000),  # width 4
        rng.integers(-(2**62), 2**62, 5000),  # width 8
        np.array([-(2**63), 2**63 - 1] * 600, dtype=np.int64),  # full span
        np.arange(2048, dtype=np.int64) * 3 - 99,
    ):
        v = np.asarray(v, dtype=np.int64)
        sz, thunk = _zstd_bt_build(v, plan_int_array(v), 10**12, hinted=True)
        pl2 = thunk()
        assert sz == len(pl2)
        o, p2 = decode_ints(IntCodec.ZSTD_BT, pl2, len(v))
        assert (o == v).all() and p2 == len(pl2)
        assert skip_ints(IntCodec.ZSTD_BT, pl2, len(v)) == len(pl2)
    # speed policy: never offered (deterministic probe-free re-encodes)
    with codecs.codec_policy("speed"):
        c3, _, _ = encode_ints(zipf)
    assert c3 != IntCodec.ZSTD_BT
    # hint cache: sibling block plans straight to the winner
    key = "test.zstdbt.hint"
    try:
        c4, _, _ = encode_ints(zipf[:100_000], probe_key=key)
        assert codecs._INT_HINT_CACHE[key]["winner"] == IntCodec.ZSTD_BT
        c5, _, _ = encode_ints(zipf[100_000:], probe_key=key)
        assert c4 == c5 == IntCodec.ZSTD_BT
    finally:
        codecs._INT_HINT_CACHE.pop(key, None)


def test_zstd_bt_rejects_corrupted_wire():
    """Corrupted id-9 payloads must raise, never crash or return junk:
    the zstd frame checks its own integrity and the declared decompressed
    size must equal n*width."""
    from zebra_spark.codec import codecs
    from zebra_spark.codec.codecs import _zstd_bt_build, plan_int_array

    if not codecs._zstd_available():
        pytest.skip("pyarrow zstd codec unavailable")
    rng = np.random.default_rng(13)
    v = rng.integers(0, 50000, 20000)
    _, thunk = _zstd_bt_build(v, plan_int_array(v), 10**12, hinted=True)
    pl = bytearray(thunk())
    # flip bytes inside the zstd frame
    for off in (20, len(pl) // 2, len(pl) - 3):
        bad = bytearray(pl)
        bad[off] ^= 0xFF
        try:
            out, _ = decode_ints(IntCodec.ZSTD_BT, bytes(bad), len(v))
            # an undetected flip must at least keep the contract shape
            assert len(out) == len(v)
        except Exception as e:
            assert isinstance(e, (ValueError, OSError, pa_lib_error()))
    # truncated payload
    with pytest.raises(Exception):
        decode_ints(IntCodec.ZSTD_BT, bytes(pl[: len(pl) // 2]), len(v))
    # wrong n (decompressed-size mismatch)
    with pytest.raises(Exception):
        decode_ints(IntCodec.ZSTD_BT, bytes(pl), len(v) + 1)


def pa_lib_error():
    import pyarrow as pa

    return pa.lib.ArrowException


def test_pfor_sampled_feasibility_margin_keeps_boundary_cut():
    """r5 review fix: the sampled PFoR ranking allowed only ~1 sample
    element of binomial noise above the n/8 exception bar, so a genuinely
    feasible boundary cut (true exception fraction 12.4%) was marked
    infeasible on ~half of blocks.  With the 3-sigma margin the cut stays
    in the ranking and cost_exact settles it with the true count: seed 1
    sampled-overestimates (p_hat 0.1273 > old bar 0.1251) yet PFoR must
    still select the b=4 cut at ~3.6x below zebra."""
    rng = np.random.default_rng(1)
    n = 819200
    mask = rng.random(n) < 0.124
    vals = rng.integers(0, 16, size=n)
    vals[mask] = rng.integers(1 << 39, 1 << 40, size=int(mask.sum()))
    vals = vals.astype(np.int64)
    c, payload, m = encode_ints(vals)
    assert c == IntCodec.PFOR
    assert payload[0] < 10  # the boundary cut, not a 40-bit fallback
    assert m["bytes"] < 0.5 * m["zebra_bytes"]
    out, p = decode_ints(c, payload, n)
    assert (out == vals).all() and p == len(payload)


def test_fsst_balanced_gate_is_absolute_nspb(monkeypatch):
    """r6: the FSST-family balanced decode gate is an ABSOLUTE ns/byte
    bar (_FSST_NSPB_BUDGET), not a snappy wall-clock ratio — on a host
    whose measured FSST decode clears the bar, balanced selection CAN
    pick the FSST family; on this (throttled) sandbox it measures far
    above the bar and balanced stays FSST-free.  Both directions pinned
    by faking the single measurement point."""
    from zebra_spark.codec import codecs

    rng = np.random.default_rng(11)
    words = [b"the", b"model", b"training", b"pipeline", b"compression",
             b"tokens", b"columnar", b"dataset"]
    strings = [
        b" ".join(words[i] for i in rng.integers(0, len(words), size=40))
        for _ in range(1200)
    ]
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    concat = b"".join(strings)
    assert len(concat) >= (64 << 10) and lengths.mean() >= 64

    def run(fake_nspb, key):
        monkeypatch.setattr(codecs, "_fsst_decode_nspb", lambda s, p: fake_nspb)
        codecs._FSST_PROBE_CACHE.pop(key, None)
        codecs._FSST_LOSS_STREAK.pop(key, None)
        with codecs.codec_policy("balanced"):
            c, _, m = encode_strings(lengths, concat, probe_key=key)
        return c, m

    # fast host: measured cost clears the bar -> FSST family selectable
    c_fast, m_fast = run(codecs._FSST_NSPB_BUDGET * 0.5, "t.fast")
    assert c_fast in (StrCodec.FSST, StrCodec.FSST_Z), m_fast
    # slow host (this sandbox measures 32-48 ns/B): gate refuses
    c_slow, _ = run(codecs._FSST_NSPB_BUDGET * 10, "t.slow")
    assert c_slow not in (StrCodec.FSST, StrCodec.FSST_Z)


def test_fsst_nspb_sandbox_measurement_regression():
    """Pin the real measurement path: _fsst_decode_nspb returns a finite
    positive ns/byte, and _probe_decode_ok agrees with the bar.  On this
    sandbox the numpy symbol expansion measures >> _FSST_NSPB_BUDGET so
    the probe must refuse; skip the refusal pin if a (future, faster)
    host measures within 2x of the bar."""
    from zebra_spark.codec import codecs, fsst as F
    from zebra_spark.codec.warmup import warm_codec

    warm_codec()
    rng = np.random.default_rng(12)
    words = [b"signal", b"entropy", b"symbol", b"expansion", b"table"]
    sample = b" ".join(words[i] for i in rng.integers(0, len(words), size=12000))[: 64 << 10]
    probe = F.compress(sample)
    assert probe is not None
    nspb = codecs._fsst_decode_nspb(sample, probe)
    assert 0 < nspb < float("inf")
    if nspb > 2 * codecs._FSST_NSPB_BUDGET:
        assert not codecs._probe_decode_ok(sample, probe)


def test_narrow_native_wire_equality():
    """r7 invariant: encoding a narrow-dtype array produces byte-identical
    wire to encoding the same values as int64, for every selected codec —
    the narrow-native planning path is a pure speed change.  Covers zipf
    (zstd-bt territory), runs (rle/constant), small-card (dict), ramps
    (delta/pfor), and decode must round-trip from either encoding."""
    from zebra_spark.codec import codecs as C
    from zebra_spark.codec.codecs import decode_ints, encode_ints
    from zebra_spark.codec.warmup import warm_codec

    warm_codec()
    rng = np.random.default_rng(7)
    cases = {
        "zipf": (rng.zipf(1.3, size=200_000) % 50_000).astype(np.int32),
        "runs": np.repeat(
            rng.integers(-5, 5, size=500), rng.integers(1, 900, size=500)
        ).astype(np.int16)[:100_000],
        "smallcard": rng.integers(0, 7, size=100_000).astype(np.int8),
        "ramp": (np.arange(150_000) * 3 + rng.integers(0, 2, 150_000)).astype(
            np.int32
        ),
        "negatives": rng.integers(-(2**31), 2**31, size=66_000).astype(np.int32),
    }
    for name, narrow in cases.items():
        wide = narrow.astype(np.int64)
        # fresh probe keys so the hint cache cannot couple the two runs
        c_n, p_n, _ = encode_ints(narrow, probe_key=f"eqn.{name}")
        c_w, p_w, _ = encode_ints(wide, probe_key=f"eqw.{name}")
        assert c_n == c_w, (name, c_n, c_w)
        assert p_n == p_w, f"{name}: narrow wire differs from int64 wire"
        out64, _ = decode_ints(c_n, p_n, len(narrow))
        assert out64.dtype == np.int64 and (out64 == wide).all(), name
        # prefer=int32 fusion must return identical values (int32 inputs)
        if narrow.dtype == np.int32:
            out32, _ = decode_ints(c_n, p_n, len(narrow), prefer=np.int32)
            assert (out32.astype(np.int64) == wide).all(), name
