"""Codec menu + entropy/cardinality-driven auto-selector.

The reference (zebra) has exactly ONE int codec — FoR+zigzag+BP64
(zebra-core/csrc/zebra_unpack.c:99-162) — and ONE string codec — snappy over
lengths+concat (zebra-core/src/Zebra/Serial/Binary/Array.hs:44-113).  The
north rule requires green-field extensions: dictionary, RLE, delta and FSST
codecs with a stats-driven selector.  The contract that keeps the
"compressed size <= zebra output" bound: the zebra codec is ALWAYS a
candidate and the selector takes the exact minimum, so a selected payload is
never larger than the reference payload for the same framing.

Every int codec payload decodes to bit-identical int64s; every string codec
payload decodes to bit-identical (lengths, concatenated-bytes).

Wire framing (ours, block-internal): ``u8 codec_id | payload``.
"""

from __future__ import annotations

import contextlib as _contextlib
import os

import numpy as np

from .intcodec import (
    _NATIVE_LE,
    _bp64_pack_group,
    _bp64_unpack_group,
    bit_length64,
    pack_from_plan,
    pack_int_array,
    packed_size,
    plan_int_array,
    unpack_int_array,
)
from .bytecodec import pack_strings, unpack_strings
from . import fsst as _fsst

__all__ = [
    "IntCodec",
    "StrCodec",
    "encode_ints",
    "decode_ints",
    "encode_strings",
    "decode_strings",
    "zebra_int_size",
    "zebra_strings_size",
]

_I64 = np.int64


class IntCodec:
    ZEBRA = 0  # reference FoR+zigzag+BP64 — the yardstick and fallback
    CONSTANT = 1
    RLE = 2
    DICT = 3
    DELTA_V0 = 4  # legacy wire (i64 first | zebra int_array) — decode-only
    PFOR = 5  # patched FoR: fixed base width + exception list (Lemire 2012)
    ALP = 6  # decimal floats as scaled ints (ALP, Afroozeh & Boncz 2023)
    # r4 wire adds an inner-codec byte; a NEW id keeps blocks persisted by
    # older builds decodable (resumable run_encode_job outputs)
    DELTA = 7  # i64 first | u8 inner_codec | inner payload (n-1 deltas)
    ALP_RD = 8  # full-mantissa floats: left-bits dict + right-bits pack
    ZSTD_BT = 9  # FoR + byte-transposed planes + zstd-1 FSE entropy stage

    NAMES = {
        0: "zebra",
        1: "constant",
        2: "rle",
        3: "dict",
        4: "delta-v0",
        5: "pfor",
        6: "alp",
        7: "delta",
        8: "alp-rd",
        9: "zstd-bt",
    }


class StrCodec:
    ZEBRA = 0  # lengths int_array + snappy concat (Array.hs:44-68)
    DICT = 1  # unique strings + index int column
    FSST = 2  # BPE-style symbol-table compression + lengths
    ZLIB = 3  # DEFLATE concat (stdlib; r5 ext) — probe-gated like FSST
    ZSTD = 4  # zstd concat (pyarrow codec; r5 ext) — same wire frame as ZLIB
    FSST_Z = 5  # FSST section wrapped in zstd (symbols, then entropy)

    NAMES = {
        0: "zebra-snappy",
        1: "dict",
        2: "fsst",
        3: "zlib",
        4: "zstd",
        5: "fsst-zstd",
    }


def zebra_int_size(values: np.ndarray) -> int:
    """Reference-codec size for the ``<=`` bound (excl. our 1-byte codec tag)."""
    return packed_size(values)


# ---------------------------------------------------------------------------
# int codecs


def _rle_split(values: np.ndarray):
    if len(values) == 0:
        return values, values
    change = np.empty(len(values), dtype=bool)
    change[0] = True
    np.not_equal(values[1:], values[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    run_values = values[starts]
    run_lengths = np.diff(np.append(starts, len(values))).astype(_I64)
    return run_values, run_lengths


def encode_ints(
    values: np.ndarray,
    allow: set[int] | None = None,
    float_view: bool = False,
    float32_view: bool = False,
    probe_key: str | None = None,
):
    """Select + encode. Returns ``(codec_id, payload_bytes, meta_dict)``.

    ``meta_dict`` carries selector stats for the per-partition codec metrics
    required by the north rule.

    ``float_view=True`` marks ``values`` as the bit-cast of a float64
    column, enabling the ALP decimal candidate (pointless and skipped for
    genuine integers).  ``float32_view=True`` marks them as sign-extended
    float32 bit patterns — ALP decimal can't apply (the container is not
    an f64 image) but ALP-RD can (it is a pure bit transform).

    ``probe_key``: stable column identity enabling the selector HINT cache
    (r5): the first block of a column runs the full candidate menu and
    remembers the winner (plus its tuning — PFoR cut, ALP-RD cut); the
    next ``_INT_HINT_USES`` blocks of the same column plan only zebra +
    that winner, skipping the losing candidates' full-array passes
    (~45% of selector time on token streams).  The <=zebra bound is
    UNTOUCHED — zebra is always planned exactly and selection among the
    offered candidates stays exact-size — only which candidates are
    offered narrows between revalidations.  Drift is bounded two ways:
    the menu re-runs in full every 64 blocks, and a hinted winner that
    loses its own block (data shifted under it) invalidates the entry
    immediately.

    Costing reuses a single :class:`PackPlan` per candidate (one pass each)
    and the winner's plan assembles the payload without recomputation.
    Expensive candidates are gated by cheap sampled stats.
    """
    # r7: narrow signed ints stay at their native width through planning
    # (see plan_int_array) — every candidate below either handles the
    # narrow dtype or widens explicitly with dtype=_I64, so the selected
    # wire bytes are identical to the int64-everywhere pipeline
    values = np.ascontiguousarray(values)
    if values.dtype != _I64 and values.dtype not in (
        np.dtype(np.int8), np.dtype(np.int16), np.dtype(np.int32)
    ):
        values = values.astype(_I64)
    n = len(values)

    hint = None
    if probe_key is not None:
        h = _INT_HINT_CACHE.get(probe_key)
        if h is not None and h["uses"] > 0:
            h["uses"] -= 1
            hint = h
    menu = None if hint is None else {hint["winner"], IntCodec.CONSTANT}

    def allowed(c):
        if allow is not None and c not in allow:
            return False
        return menu is None or c in menu

    zplan = plan_int_array(values)
    zsize = zplan.size
    # (size, thunk-producing-payload)
    candidates: dict[int, tuple[int, object]] = {
        IntCodec.ZEBRA: (zsize, lambda: pack_from_plan(zplan))
    }

    n_runs = None
    if n > 0:
        if (
            allowed(IntCodec.CONSTANT)
            and zplan.vmin == zplan.vmax
        ):
            candidates[IntCodec.CONSTANT] = (
                8,
                lambda: np.int64(values[0]).astype("<i8").tobytes(),
            )

        if allowed(IntCodec.RLE) and n >= 64:
            # sampled run-ratio gate before the full O(n) split
            sample = values[: 4096]
            samp_runs = int((sample[1:] != sample[:-1]).sum()) + 1
            if samp_runs <= len(sample) // 2:
                rv, rl = _rle_split(values)
                n_runs = len(rv)
                if n_runs <= n // 2:
                    pv, pl = plan_int_array(rv), plan_int_array(rl)
                    candidates[IntCodec.RLE] = (
                        4 + pv.size + pl.size,
                        lambda pv=pv, pl=pl, rv=rv: (
                            np.uint32(len(rv)).astype("<u4").tobytes()
                            + pack_from_plan(pv)
                            + pack_from_plan(pl)
                        ),
                    )

        # PFoR first: cheap to cost exactly and often the tightest bound,
        # so the DICT/DELTA sampled skip-gates below compare against the
        # best candidate so far instead of only zebra — skipping more
        # full-array planning passes (selector cost, not correctness: the
        # <=zebra bound is carried by the always-present zebra candidate)
        pfor_b = None
        if allowed(IntCodec.PFOR) and n >= 256:
            pfor = _pfor_build(
                values, zplan, hint_b=(hint or {}).get("pfor_b")
            )
            if pfor is not None:
                size, thunk, pfor_b = pfor
                candidates[IntCodec.PFOR] = (size, thunk)

        if allowed(IntCodec.DICT) and n >= 64:
            dict_pair = _dict_split(values, zplan)
            if dict_pair is not None:
                uniq, inverse = dict_pair
                pu = plan_int_array(uniq)
                # sampled skip-gate: planning the full inverse costs a full
                # zigzag+max pass; extrapolate its size from slices first
                best_so_far = min(sz for sz, _ in candidates.values())
                if _sampled_plan_bytes(inverse) * n + pu.size + 4 < best_so_far:
                    pi = plan_int_array(inverse)
                    candidates[IntCodec.DICT] = (
                        4 + pu.size + pi.size,
                        lambda pu=pu, pi=pi, uniq=uniq: (
                            np.uint32(len(uniq)).astype("<u4").tobytes()
                            + pack_from_plan(pu)
                            + pack_from_plan(pi)
                        ),
                    )

        if float_view and allowed(IntCodec.ALP) and n >= 64:
            alp = _alp_build(values)
            if alp is not None:
                size, thunk = alp
                candidates[IntCodec.ALP] = (size, thunk)

        alprd_r = None
        if (float_view or float32_view) and allowed(IntCodec.ALP_RD) and n >= 64:
            rd = _alp_rd_build(
                values,
                min(s for s, _ in candidates.values()),
                hint_r=(hint or {}).get("alprd_r"),
            )
            if rd is not None:
                size, thunk, alprd_r = rd
                candidates[IntCodec.ALP_RD] = (size, thunk)

        if allowed(IntCodec.DELTA) and n >= 2:
            # first value kept out of the delta frame so a large base does
            # not widen the frame-of-reference of the (small) diffs
            with np.errstate(over="ignore"):
                deltas = np.subtract(values[1:], values[:-1], dtype=_I64)
            # sampled skip-gate (see DICT): random-ish data has WIDER diffs
            # than values, so skip the full delta plan unless slices say
            # it plausibly beats the current best candidate.  Under the
            # balanced policy DELTA must additionally clear its 5% decode
            # handicap to be SELECTED, so the gate bar tightens by the
            # same factor — a borderline candidate inside the handicap
            # zone would be rejected after full costing anyway, and the
            # full 10M-value delta plan costs ~20% of encode time on the
            # hot token column.  (Sampling error can skip a <5%-margin win;
            # balanced trades that sliver of size for encode speed — the
            # <=zebra bound never depends on DELTA.)
            best_now = min(s for s, _ in candidates.values())
            bar = best_now
            if _CODEC_POLICY != "size" and IntCodec.DELTA in _DECODE_HANDICAP:
                bar = best_now / _DECODE_HANDICAP[IntCodec.DELTA]
            if _sampled_plan_bytes(deltas) * (n - 1) + 9 < bar:
                dplan = plan_int_array(deltas)
                # r4: the deltas themselves go through the cheaper of the
                # zebra int_array or PFoR — PFoR's single-width unpack
                # decodes ~2x faster than the per-chunk-width zebra walk
                # AND is usually smaller on outlier-bearing diffs, which
                # cut DELTA's measured decode cost from 3.2x PFOR to ~1.4x
                # (wire: i64 first | u8 inner_codec | inner payload)
                inner = IntCodec.ZEBRA
                dsize = dplan.size
                dthunk = lambda dplan=dplan: pack_from_plan(dplan)
                dp = _pfor_build(deltas, dplan)
                if dp is not None and dp[0] < dsize:
                    inner, (dsize, dthunk) = IntCodec.PFOR, dp[:2]
                candidates[IntCodec.DELTA] = (
                    9 + dsize,
                    lambda inner=inner, dthunk=dthunk: (
                        np.int64(values[0]).astype("<i8").tobytes()
                        + bytes([inner])
                        + dthunk()
                    ),
                )

        # ZSTD_BT last: the compressed size IS its costing, so its sampled
        # gate should compare against the tightest best-so-far.  Policy-
        # gated off under "speed" (keeps the verify_blocks re-encode audit
        # deterministic and probe-free) unless explicitly allowed.
        if (
            allowed(IntCodec.ZSTD_BT)
            and n >= 1024
            and (_CODEC_POLICY != "speed" or (allow is not None and IntCodec.ZSTD_BT in allow))
        ):
            zb = _zstd_bt_build(
                values,
                zplan,
                min(s for s, _ in candidates.values()),
                hinted=hint is not None and hint["winner"] == IntCodec.ZSTD_BT,
            )
            if zb is not None:
                candidates[IntCodec.ZSTD_BT] = zb

    # decode-cost-aware SELECTION (payload sizes stay actual): under the
    # default balanced policy DELTA pays a 5% size handicap — its decode
    # needs an extra full cumsum pass (measured ~1.4x zebra, ~2x pfor on
    # token streams), so it must be >5% smaller to win.  The <=zebra bound
    # is untouched: zebra's handicap is 1.0, so any winner satisfies
    # size * handicap < zsize => size < zsize.
    # NOTE: a size win large enough to matter clears the handicap by
    # arithmetic alone (size <= 0.85*best already satisfies 1.05*size <
    # best), so there is deliberately NO separate "waiver" branch — r4
    # shipped one and it was provably dead code (any input it fired on was
    # already selected through the handicap).  The 1.05 factor IS the
    # policy: DELTA must be >5% smaller to buy its extra cumsum pass.
    handicap = _DECODE_HANDICAP if _CODEC_POLICY != "size" else {}
    codec = min(
        candidates,
        key=lambda c: (candidates[c][0] * handicap.get(c, 1.0), c),
    )
    if probe_key is not None:
        if hint is None:
            # full menu ran: remember the winner + its tuning for the next
            # _INT_HINT_USES blocks of this column
            entry = {"winner": codec, "uses": _INT_HINT_USES}
            if codec == IntCodec.PFOR:
                entry["pfor_b"] = pfor_b
            elif codec == IntCodec.ALP_RD:
                entry["alprd_r"] = alprd_r
            _INT_HINT_CACHE[probe_key] = entry
        elif codec != hint["winner"]:
            # the hinted winner lost its own block — data shifted, re-probe
            # the full menu next time
            _INT_HINT_CACHE.pop(probe_key, None)
    size, thunk = candidates[codec]
    meta = {
        "codec": IntCodec.NAMES[codec],
        "n": n,
        "bytes": size,
        "zebra_bytes": zsize,
        "n_runs": n_runs,
    }
    meta.update(_column_stats(values, zplan))
    return codec, thunk(), meta


# selector HINT cache per column path (r5): {key: {"winner": codec,
# "uses": n, "pfor_b"/"alprd_r": tuning}}.  Same staleness argument as the
# FSST probe cache below: python workers are reused across jobs, so a key
# can outlive one dataset; the 64-block full-menu revalidation bounds any
# staleness, the zebra bound never depends on it (zebra is always planned),
# and a hinted winner that loses its own block invalidates immediately.
_INT_HINT_CACHE: dict[str, dict] = {}

# ZSTD_BT decode costs ~1.5x the PFoR path (zstd frame inflate ~280 M
# tok/s + plane recombination), so under balanced it must be >15% smaller
# to be selected; zipfian token streams clear it by 40%+
_ZSTD_BT_HANDICAP = 1.15
_ZSTD_BT_SAMPLE = 1 << 16  # values per sampled-gate probe


def _zstd_bt_narrow(values: np.ndarray, vmin: int, vmax: int):
    """(width, narrowed-unsigned-array) for the FoR byte planes.

    The subtract wraps in int64 and is reinterpreted as uint64 — exact for
    any (vmin, vmax) range up to the full 2^64 span (same modular argument
    as mid64: the true delta is < 2^64, and decode re-adds vmin with the
    same wrapping arithmetic)."""
    rng = vmax - vmin  # exact python ints, no overflow
    width = 1 if rng < (1 << 8) else 2 if rng < (1 << 16) else 4 if rng < (1 << 32) else 8
    if values.dtype != _I64:
        # narrow native input (r7): the range is bounded below 2^32 by the
        # dtype, so the modular FoR subtract can run AT THE TARGET WIDTH
        # in one fused pass — subtraction mod 2^w of (values mod 2^w,
        # vmin mod 2^w) equals the int64 delta's low w bytes (the modular
        # argument above), and the true delta < 2^(8*width) by
        # construction, so the narrow image is exact.
        sdt = {1: np.int8, 2: np.int16, 4: np.int32}[width]
        udt = {1: np.uint8, 2: np.uint16, 4: np.uint32}[width]
        with np.errstate(over="ignore"):
            narrow = np.subtract(
                values,
                np.int64(vmin).astype(sdt),
                dtype=sdt,
                casting="unsafe",
            ).view(udt)
        return width, narrow
    with np.errstate(over="ignore"):
        d = np.subtract(values, vmin, dtype=_I64).view(np.uint64)
    if width == 8:
        narrow = d
    else:
        narrow = d.astype({1: np.uint8, 2: np.uint16, 4: np.uint32}[width])
    return width, narrow


def _zstd_bt_planes(narrow: np.ndarray, width: int) -> np.ndarray:
    """Byte-transpose: plane p holds byte p of every value's little-endian
    image (normative wire, endian-independent).  Returns a contiguous
    uint8-viewable array — the compressor reads its buffer directly, so
    there is no ``tobytes`` copy on the hot encode path."""
    if width == 1:
        return narrow
    le = narrow if _NATIVE_LE else narrow.astype(narrow.dtype.newbyteorder("<"))
    return le.view(np.uint8).reshape(-1, width).T.copy().reshape(-1)


def _zstd_bt_build(
    values: np.ndarray, zplan, best_so_far: int, hinted: bool = False
):
    """FoR + byte-transpose + zstd level-1 candidate (wire id 9).

    The win comes from zstd's FSE entropy stage: zipf-distributed token
    ids carry ~9 bits of entropy but cost PFoR/BP64 the full chunk width
    (measured on the F1 token column: 16.00 -> 9.38 bits/token, compress
    127 M tok/s, inflate 283 M tok/s).  Level 1 is both the fastest AND
    the smallest here — higher levels spend time finding matches that the
    transposed planes don't have.  Byte-aligned transforms only; the
    compressed size IS the costing, so a sampled probe skips the full
    compress when the projection can't clear the selection bar."""
    if not _zstd_available():
        return None
    import pyarrow as pa

    n = len(values)
    width, narrow = _zstd_bt_narrow(values, int(zplan.vmin), int(zplan.vmax))
    codec = pa.Codec("zstd", compression_level=1)
    bar = best_so_far
    if _CODEC_POLICY != "size":
        bar = best_so_far / _ZSTD_BT_HANDICAP
    if not hinted and n > 2 * _ZSTD_BT_SAMPLE:
        # STRATIFIED sample (r6, ADVICE): the old prefix sample misjudged
        # sorted/clustered columns whose head is unrepresentative — take
        # 16 evenly-spaced 4k slices across the column instead, the same
        # shape _sampled_plan_bytes uses.  Selector efficiency only; the
        # <=zebra bound is unaffected (zebra is always planned exactly).
        step = max(1, (n - _GATE_SLICE) // (_GATE_SLICES - 1))
        starts = (np.arange(_GATE_SLICES) * step) & ~63
        sub = np.concatenate([narrow[s : s + _GATE_SLICE] for s in starts])
        m = len(sub)
        sample = _zstd_bt_planes(sub, width)
        projected = len(codec.compress(sample, asbytes=True)) / (m * width)
        if projected * n * width + 13 >= bar:
            return None
    comp = codec.compress(_zstd_bt_planes(narrow, width), asbytes=True)
    size = 13 + len(comp)
    if size >= bar and not hinted:
        return None

    vmin = int(zplan.vmin)

    def thunk(width=width, vmin=vmin, comp=comp):
        return (
            bytes([width])
            + np.int64(vmin).astype("<i8").tobytes()
            + np.uint32(len(comp)).astype("<u4").tobytes()
            + comp
        )

    return size, thunk
_INT_HINT_USES = 64


_GATE_SLICES = 16
_GATE_SLICE = 1 << 12  # 4k values per slice, 64-aligned
_GATE_FULL = _GATE_SLICES * _GATE_SLICE * 2  # below this, just plan exactly


def _sampled_plan_bytes(values: np.ndarray) -> float:
    """Estimated packed bytes/value from 16 evenly-spaced 64-aligned
    slices.  Optimistic on purpose (estimates can only SKIP a candidate
    when clearly unpromising): mixed-source columns have long cheap
    stretches that few slices would miss (measured: head/mid/tail slices
    over-estimated a sorted-heavy token column by 7%), so the slices are
    stratified across the column and a 0.93 slack absorbs the residual
    sampling error.  Skipping never breaks the <=zebra bound — the zebra
    candidate is always present.
    """
    n = len(values)
    if n <= _GATE_FULL:
        return 0.0  # small: always plan exactly
    step = (n - _GATE_SLICE) // (_GATE_SLICES - 1)
    starts = (np.arange(_GATE_SLICES) * step) & ~63
    sl = np.concatenate([values[s : s + _GATE_SLICE] for s in starts])
    return 0.93 * plan_int_array(sl).size / len(sl)


def _alp_build(values_i64: np.ndarray):
    """ALP decimal candidate for float64 columns: ``(size, thunk)`` or None.

    Decimal-valued doubles (prices, rates, quantities) have near-random
    mantissa bits, so bit-cast int packing gets almost nothing; writing
    them as ``round(v * 10^e)`` scaled ints (ALP — Afroozeh & Boncz,
    VLDB 2023) turns them into small integers the int-codec menu crushes.
    Payload: ``u8 e | int_array(scaled)``.

    Exactness is verified at encode per column: the candidate is offered
    ONLY if ``(round(v*10^e) / 10^e)`` reproduces every input bit
    (which also rejects NaN/inf/-0.0 and anything needing > 2^53).  The
    decode side performs that same IEEE-exact division, so the roundtrip
    law is structural, not probabilistic.
    """
    f = values_i64.view(np.float64)
    n = len(f)
    # cheap sample probe for a plausible exponent before full passes
    sample = f[: min(n, 256)]
    if not np.isfinite(sample).all():
        return None
    e_found = None
    for e in range(0, 16):
        scale = np.float64(10.0**e)
        r = np.round(sample * scale)
        if not (np.abs(r) < 2**53).all():
            return None
        # verify the EXACT decode expression (int64 -> float64 -> divide):
        # checking r/scale alone would wrongly accept -0.0, whose round
        # keeps the sign bit but whose int64 form decodes to +0.0
        back = r.astype(_I64).astype(np.float64) / scale
        if (back.view(_I64) == values_i64[: len(sample)]).all():
            e_found = e
            break
    if e_found is None:
        return None
    for e in range(e_found, 16):  # sample's e may be too small for the rest
        scale = np.float64(10.0**e)
        with np.errstate(invalid="ignore", over="ignore"):
            r = np.round(f * scale)
            ok = np.isfinite(f).all() and (np.abs(r) < 2**53).all()
            if not ok:
                return None
            ints = r.astype(_I64)
            back = ints.astype(np.float64) / scale
            if (back.view(_I64) == values_i64).all():
                plan = plan_int_array(ints)
                return 1 + plan.size, (
                    lambda e=e, plan=plan: bytes([e]) + pack_from_plan(plan)
                )
    return None


def _alp_rd_build(
    values_i64: np.ndarray, best_so_far: int, hint_r: int | None = None
):
    """ALP-RD candidate for full-mantissa floats — the "real doubles"
    second half of ALP (Afroozeh & Boncz, VLDB 2023): cut each value's
    bits at position ``r`` — the LEFT part (sign + exponent + top mantissa
    bits) repeats across a column and dictionary-codes to a handful of
    uniques, while the RIGHT part (low mantissa, near-random) packs
    verbatim at one fixed width.  Returns ``(exact_size, thunk)`` or None.

    Two deliberate departures from the paper's SIMD-bound shape, both
    size-or-speed wins under numpy execution: the dictionary holds ALL
    unique left parts (a gather is cheap at any dict size, so no 3-bit cap
    and no exception list), and the codes ride the int_array codec (their
    per-chunk widths usually land at ceil(log2(card)) anyway).  A shared
    trailing-zero shift ``tz`` also rides the wire: float64 columns whose
    values happen to be float32-representable carry 29 always-zero low
    mantissa bits, and shifting them out first makes the right part dense.
    The transform is pure bit arithmetic, so the roundtrip is exact by
    construction for ANY input pattern (floats, NaN payloads, infs).

    Wire: ``u8 r | u8 tz | u32 n_dict | right BP64 groups (n_groups*8*r B)
    | dict int_array | codes int_array``.

    Cut choice: one sort of a 4k sample gives the whole cardinality curve
    — card(r) = 1 + |{i : bit_length(sorted-neighbour xor) > r}| — from
    which estimated costs rank every cut; the best two are then costed
    EXACTLY (full unique + plans), keeping the candidate's reported size
    actual like every other selector entry.
    """
    n = len(values_i64)
    u = values_i64.view(np.uint64)
    orv = np.bitwise_or.reduce(u)
    if orv == 0:
        return None  # all-zero column: CONSTANT wins at 8 bytes
    tz = int(orv & (~orv + np.uint64(1))).bit_length() - 1
    us = u >> np.uint64(tz)
    top = 64 - tz  # significant width after the shared shift
    n_groups = -(-n // 64)

    def cost_exact(r: int):
        shift = np.uint64(r)
        uniq, inverse = np.unique(us >> shift, return_inverse=True)
        pd_ = plan_int_array(uniq.view(_I64))
        pc_ = plan_int_array(inverse.astype(_I64))
        return 6 + n_groups * 8 * r + pd_.size + pc_.size, r, pd_, pc_

    if hint_r is not None and 0 <= hint_r < top:
        # hinted cut from the per-column cache: one exact costing, no
        # sample ranking
        best = cost_exact(int(hint_r))
        size, r, pd_, pc_ = best
        if size >= best_so_far:
            return None
        return _alp_rd_finish(us, n, n_groups, tz, size, r, pd_, pc_)

    sample = np.sort(us[:: max(1, n // 4096)][:4096])
    diff = sample[1:] ^ sample[:-1]
    bl = bit_length64(diff)
    hist = np.bincount(bl, minlength=66)
    gt = np.cumsum(hist[::-1])[::-1]  # gt[b] = count(bl >= b)
    scale = max(1.0, n / len(sample)) ** 0.5  # sample card underestimates
    rs = np.arange(top, dtype=np.int64)
    card = 1 + np.minimum(gt[rs + 1] * scale, n).astype(np.int64)
    code_bits = np.ceil(np.log2(np.maximum(card, 2))).astype(np.int64)
    est = (
        n_groups * 8 * rs  # right block
        + card * np.maximum(top - rs, 8) // 8  # dict entries
        + n * code_bits // 8  # codes
        + 30
    )
    # the card curve is only trustworthy where the sample dict is SMALL —
    # a near-saturated sample (card ~ sample size) extrapolates to
    # anywhere between card and n, and underestimating it once picked a
    # 10 B/value cut over a 7.1 B/value one.  Cuts whose sample dict
    # exceeds sample/8 are out; a left part that big can't win anyway
    # (codes alone would cost >= 9 bits/value on top of the right block).
    feasible = gt[rs + 1] <= max(8, len(sample) // 8)
    if not feasible.any():
        return None
    est[~feasible] = np.iinfo(np.int64).max
    if est.min() >= best_so_far:
        return None  # cannot plausibly win — skip the exact passes
    best = None
    for r in (int(x) for x in np.argsort(est, kind="stable")[:2]):
        res = cost_exact(r)
        if best is None or res[0] < best[0]:
            best = res
    size, r, pd_, pc_ = best
    if size >= best_so_far:
        return None
    return _alp_rd_finish(us, n, n_groups, tz, size, r, pd_, pc_)


def _alp_rd_finish(us, n, n_groups, tz, size, r, pd_, pc_):
    """(size, thunk, r) for a fully-costed ALP-RD cut."""

    def thunk(r=r, pd_=pd_, pc_=pc_):
        if r:
            right = us & np.uint64((1 << r) - 1)
            pad = n_groups * 64 - n
            if pad:
                right = np.concatenate([right, np.zeros(pad, dtype=np.uint64)])
            parts = (
                _bp64_pack_group(right.reshape(n_groups, 64), r)
                .astype("<u8", copy=False)
                .tobytes()
            )
        else:
            parts = b""
        return b"".join(
            [
                bytes([r, tz]),
                np.uint32(pd_.n).astype("<u4").tobytes(),
                parts,
                pack_from_plan(pd_),
                pack_from_plan(pc_),
            ]
        )

    return size, thunk, r


def _pfor_build(values: np.ndarray, zplan, hint_b: int | None = None):
    """Patched frame-of-reference candidate: ``(exact_size, thunk, b)`` or
    None.

    zebra's codec adapts bit width PER 64-VALUE CHUNK, so a zipf-ish token
    stream where nearly every chunk contains one rare large token pays the
    outlier's width for all 64 values.  PFoR (Lemire & Boytsov 2012, the
    paper zebra's README cites for its own codec) packs the whole column at
    one small base width and stores the few oversized values as patches:
    ``u8 b | i64 vmin | u32 n_exc | base bits | [positions] | [values]``.

    Base-width choice (r5): a SAMPLED width histogram ranks the cuts (the
    full per-value bit_length64 + bincount cost ~11 ns/value — more than
    the whole rest of planning), then the best few are costed EXACTLY —
    one comparison pass each for the true exception set — so the reported
    size stays actual and the selector's <=-zebra bound is untouched.
    ``hint_b`` (from the per-column hint cache) skips the ranking and
    exact-costs that single cut.
    """
    n = len(values)
    with np.errstate(over="ignore"):
        # explicit dtype: values may be a narrow native int (r7); the
        # subtract must run (and wrap) in int64 exactly as before
        u = np.subtract(values, zplan.vmin, dtype=_I64).view(np.uint64)
    n_groups = -(-n // 64)

    def cost_exact(b: int):
        """(size, b, n_exc, positions, ppos, pval) or None (infeasible)."""
        # exact exception set: width > b  <=>  u > 2^b - 1, one compare
        if b >= 64:
            mask, n_exc = None, 0
        else:
            mask = u > np.uint64((1 << b) - 1)
            n_exc = int(np.count_nonzero(mask))
        if n_exc > n // 8:
            return None
        positions = np.flatnonzero(mask) if n_exc else np.empty(0, _I64)
        exc_vals = values[positions] if n_exc else None
        ppos = plan_int_array(positions.astype(_I64)) if n_exc else None
        pval = plan_int_array(exc_vals) if n_exc else None
        size = 1 + 8 + 4 + n_groups * 8 * b
        if n_exc:
            size += ppos.size + pval.size
        return (size, b, n_exc, positions, ppos, pval)

    best = None
    if hint_b is not None:
        best = cost_exact(int(hint_b))
    else:
        step = max(1, n // 8192)
        su = u[::step][:8192]
        scale = n / len(su)
        widths_s = bit_length64(su)
        hist = np.bincount(widths_s, minlength=65).astype(np.float64) * scale
        n_exc_at = n - np.cumsum(hist)  # ~count(width > b), estimated
        bs = np.arange(65, dtype=np.int64)
        # RANKING estimate: base bits exact; exceptions ~2 B/packed
        # position + their own total width in bits (suffix sum of
        # hist[w]*w) — packed values can't beat their own widths
        t = hist * np.arange(65, dtype=np.float64)
        incl = np.cumsum(t[::-1])[::-1]  # incl[b] = sum_{w >= b} hist[w]*w
        exc_bits_at = np.concatenate([incl[1:], [0.0]])  # sum_{w > b}
        est = n_groups * 8.0 * bs + n_exc_at * 2 + exc_bits_at / 8
        # sampled feasibility needs slack for binomial noise: with k
        # exception elements in the sample, std(k) <= sqrt(k), so keep
        # cuts within 3 sigma of the n/8 bar in the ranking — cost_exact
        # settles them with the true exception count
        k = n_exc_at / scale
        feasible = n_exc_at <= n / 8 + 3.0 * scale * np.sqrt(np.maximum(k, 1.0))
        if not feasible.any():
            return None
        est[~feasible] = np.inf
        costed = examined = 0
        for b in (int(x) for x in np.argsort(est, kind="stable")):
            # each examination pays a full compare pass — cap BOTH the
            # number of fully-costed cuts and total examinations (a flat
            # est curve around the optimum otherwise walks many near-tied
            # cuts)
            if (
                costed == 3
                or examined == 6
                or est[b] == np.inf
                or (best and est[b] >= best[0])
            ):
                break
            examined += 1
            res = cost_exact(b)
            if res is None:
                continue  # sample under-counted: truly infeasible cut
            costed += 1
            if best is None or res[0] < best[0]:
                best = res
    if best is None:
        return None
    size, b, n_exc, positions, ppos, pval = best
    if size >= zplan.size:
        return None

    def thunk():
        # the thunk runs at most once (only for the selected winner) and
        # u is local to this plan — zero the exception slots in place
        # instead of copying the full 8n-byte delta array
        base = u
        if n_exc:
            base[positions] = 0
        pad = n_groups * 64 - n
        if pad:
            base = np.concatenate([base, np.zeros(pad, dtype=np.uint64)])
        parts = (
            _bp64_pack_group(base.reshape(n_groups, 64), b)
            .astype("<u8", copy=False)
            .tobytes()
            if b
            else b""
        )
        out = [
            bytes([b]),
            np.int64(zplan.vmin).astype("<i8").tobytes(),
            np.uint32(n_exc).astype("<u4").tobytes(),
            parts,
        ]
        if n_exc:
            out.append(pack_from_plan(ppos))
            out.append(pack_from_plan(pval))
        return b"".join(out)

    return size, thunk, b


def _column_stats(values: np.ndarray, zplan) -> dict:
    """Sampled entropy/cardinality stats for the codec-choice lineage
    metrics (north rule: 'entropy/cardinality-driven' selection must emit
    the driving statistics per partition)."""
    n = len(values)
    if n == 0:
        return {"entropy_bits": 0.0, "cardinality_est": 0}
    sample = values[:: max(1, n // 4096)][:4096]
    uniq, counts = np.unique(sample, return_counts=True)
    p = counts / counts.sum()
    entropy = float(-(p * np.log2(p)).sum())
    # Chao1-style scale-up when the sample looks saturated vs not
    card_est = int(len(uniq) * (n / len(sample)) ** 0.5) if len(uniq) == len(sample) else int(len(uniq))
    return {
        "entropy_bits": round(entropy, 3),
        "cardinality_est": card_est,
        "min": zplan.vmin,
        "max": zplan.vmax,
        "mean_chunk_bits": round(float(zplan.nbits.mean()), 2)
        if len(zplan.nbits)
        else None,
    }


def _dict_split(values: np.ndarray, zplan):
    """(uniques, int64 indices) when dictionary coding is worth costing.

    Uses O(n) bincount when the value range is small; falls back to a
    sample-gated np.unique sort otherwise.  Returns None when a dictionary
    cannot beat the direct encoding (cardinality too high).
    """
    n = len(values)
    value_range = zplan.vmax - zplan.vmin
    # width-estimate gate: dict indices bit-pack at >= ceil(log2(card)) in
    # spread-out chunks, so when the direct encoding's mean chunk width is
    # already at or below the index width (+1 slack for clustered chunks),
    # a dictionary cannot pay for itself — skip the O(n) split entirely.
    if len(zplan.nbits):
        sample = values[:: max(1, n // 4096)][:4096]
        card_est = len(np.unique(sample))
        if card_est > 8 and (card_est - 1).bit_length() + 1 >= float(
            zplan.nbits.mean()
        ):
            return None
    if 0 <= value_range <= (1 << 21):
        shifted = np.subtract(values, zplan.vmin, dtype=np.int64)
        counts = np.bincount(shifted, minlength=value_range + 1)
        nz = np.nonzero(counts)[0]
        if len(nz) > n // 2:
            return None
        # r5: re-apply the width gate with the EXACT cardinality before the
        # expensive inverse gather — the sampled card underestimates heavy
        # tails (zipf token sample said 12 index bits, true card needed 17),
        # and the gather it green-lit cost more than the rest of planning
        if len(zplan.nbits) and len(nz) > 8 and (
            (len(nz) - 1).bit_length() + 1 >= float(zplan.nbits.mean())
        ):
            return None
        lookup = np.empty(value_range + 1, dtype=_I64)
        lookup[nz] = np.arange(len(nz))
        return (nz + zplan.vmin).astype(_I64), lookup[shifted]
    sample = values[:: max(1, n // 4096)][:4096]
    if len(np.unique(sample)) > len(sample) // 2:
        return None
    uniq, inverse = np.unique(values, return_inverse=True)
    if len(uniq) > n // 2:
        return None
    return uniq, inverse.astype(_I64)


def skip_ints(codec: int, buf, n: int, pos: int = 0) -> int:
    """Advance past an int-codec payload without decoding it.

    Enables projection pushdown inside a block: unread columns cost only
    header parsing, no bit-unpacking / decompression.
    """
    mv = memoryview(buf)

    def int_array_end(p):
        size = int(np.frombuffer(mv[p : p + 4], dtype="<u4")[0])
        return p + 12 + size

    if codec == IntCodec.ZEBRA:
        return int_array_end(pos)
    if codec == IntCodec.CONSTANT:
        return pos + 8
    if codec == IntCodec.RLE:
        p = int_array_end(pos + 4)
        return int_array_end(p)
    if codec == IntCodec.DICT:
        p = int_array_end(pos + 4)
        return int_array_end(p)
    if codec == IntCodec.DELTA_V0:
        return int_array_end(pos + 8)
    if codec == IntCodec.DELTA:
        # i64 first | u8 inner_codec | inner payload (n-1 deltas)
        return skip_ints(mv[pos + 8], mv, n - 1, pos + 9)
    if codec == IntCodec.PFOR:
        b = mv[pos]
        n_exc = int(np.frombuffer(mv[pos + 9 : pos + 13], dtype="<u4")[0])
        p = pos + 13 + (-(-n // 64)) * 8 * b
        if n_exc:
            p = int_array_end(int_array_end(p))
        return p
    if codec == IntCodec.ALP:
        return int_array_end(pos + 1)
    if codec == IntCodec.ALP_RD:
        r = mv[pos]
        p = pos + 6 + (-(-n // 64)) * 8 * r
        return int_array_end(int_array_end(p))
    if codec == IntCodec.ZSTD_BT:
        comp_len = int(np.frombuffer(mv[pos + 9 : pos + 13], dtype="<u4")[0])
        return pos + 13 + comp_len
    raise ValueError(f"unknown int codec {codec}")


def skip_strings(codec: int, buf, n: int, pos: int = 0) -> int:
    """Advance past a string-codec payload without decoding it."""
    mv = memoryview(buf)

    def int_array_end(p):
        size = int(np.frombuffer(mv[p : p + 4], dtype="<u4")[0])
        return p + 12 + size

    def byte_array_end(p):
        n_comp = int(np.frombuffer(mv[p : p + 4], dtype="<u4")[0])
        return p + 4 + n_comp

    def sized_byte_array_end(p):
        return byte_array_end(p + 4)

    if codec == StrCodec.ZEBRA:
        return sized_byte_array_end(int_array_end(pos))
    if codec == StrCodec.DICT:
        p = int_array_end(pos + 4)
        p = sized_byte_array_end(p)
        icodec = mv[p]
        return skip_ints(icodec, mv, n, p + 1)
    if codec == StrCodec.FSST:
        lp_len = int(np.frombuffer(mv[pos + 1 : pos + 5], dtype="<u4")[0])
        p = pos + 5 + lp_len
        enc_len = int(np.frombuffer(mv[p + 4 : p + 8], dtype="<u4")[0])
        n_codes = mv[p + 8]
        q = p + 9
        for _ in range(n_codes):
            q += 1 + mv[q]
        return q + enc_len
    if codec in (StrCodec.ZLIB, StrCodec.ZSTD):
        lp_len = int(np.frombuffer(mv[pos + 1 : pos + 5], dtype="<u4")[0])
        p = pos + 5 + lp_len
        comp_len = int(np.frombuffer(mv[p : p + 4], dtype="<u4")[0])
        return p + 4 + comp_len
    if codec == StrCodec.FSST_Z:
        lp_len = int(np.frombuffer(mv[pos + 1 : pos + 5], dtype="<u4")[0])
        p = pos + 5 + lp_len
        comp_len = int(np.frombuffer(mv[p + 4 : p + 8], dtype="<u4")[0])
        return p + 8 + comp_len
    raise ValueError(f"unknown string codec {codec}")


def decode_ints(codec: int, buf, n: int, pos: int = 0, prefer=None):
    """Inverse of :func:`encode_ints`. Returns ``(values, next_pos)``.

    ``prefer`` (r7): optional target numpy dtype hint from the caller's
    schema.  Codecs MAY honor it to emit the narrow dtype directly and
    skip the downstream int64->narrow astype pass (currently the ZSTD_BT
    widen+add fuses to int32); codecs that ignore it return int64 as
    before and the caller's astype handles the narrowing.  Values are
    identical either way — the hint is only legal when the decoded
    column's true values fit the preferred dtype (they round-trip a
    column of that arrow type)."""
    mv = memoryview(buf)
    if codec == IntCodec.ZEBRA:
        return unpack_int_array(mv, n, pos)
    if codec == IntCodec.CONSTANT:
        v = int(np.frombuffer(mv[pos : pos + 8], dtype="<i8")[0])
        return np.full(n, v, dtype=_I64), pos + 8
    if codec == IntCodec.RLE:
        n_runs = int(np.frombuffer(mv[pos : pos + 4], dtype="<u4")[0])
        rv, p = unpack_int_array(mv, n_runs, pos + 4)
        rl, p = unpack_int_array(mv, n_runs, p)
        out = np.repeat(rv, rl)
        if len(out) != n:
            raise ValueError("RLE run lengths do not sum to row count")
        return out, p
    if codec == IntCodec.DICT:
        n_dict = int(np.frombuffer(mv[pos : pos + 4], dtype="<u4")[0])
        uniq, p = unpack_int_array(mv, n_dict, pos + 4)
        idx, p = unpack_int_array(mv, n, p)
        return uniq[idx], p
    if codec == IntCodec.DELTA_V0:
        # legacy wire: deltas as one zebra int_array directly
        first = int(np.frombuffer(mv[pos : pos + 8], dtype="<i8")[0])
        deltas, p = unpack_int_array(mv, n - 1, pos + 8)
        out = np.empty(n, dtype=_I64)
        out[0] = first
        with np.errstate(over="ignore"):
            np.cumsum(deltas, dtype=_I64, out=out[1:])
            out[1:] += _I64(first)
        return out, p
    if codec == IntCodec.DELTA:
        first = int(np.frombuffer(mv[pos : pos + 8], dtype="<i8")[0])
        inner = mv[pos + 8]
        deltas, p = decode_ints(inner, mv, n - 1, pos + 9)
        out = np.empty(n, dtype=_I64)
        out[0] = first
        with np.errstate(over="ignore"):
            np.cumsum(deltas, dtype=_I64, out=out[1:])
            out[1:] += _I64(first)
        return out, p
    if codec == IntCodec.PFOR:
        b = mv[pos]
        vmin = int(np.frombuffer(mv[pos + 1 : pos + 9], dtype="<i8")[0])
        n_exc = int(np.frombuffer(mv[pos + 9 : pos + 13], dtype="<u4")[0])
        n_groups = -(-n // 64)
        p = pos + 13
        if b:
            nbytes = n_groups * 8 * b
            words = np.frombuffer(mv[p : p + nbytes], dtype="<u8").reshape(
                n_groups, b
            )
            base = _bp64_unpack_group(
                words.astype(np.uint64, copy=False), b
            ).reshape(-1)[:n]
            p += nbytes
        else:
            base = np.zeros(n, dtype=np.uint64)
        out = base.view(_I64)
        if not out.flags.writeable:  # w==64 unpack can alias the buffer
            out = out.copy()
        with np.errstate(over="ignore"):
            out += _I64(vmin)
        if n_exc:
            positions, p = unpack_int_array(mv, n_exc, p)
            exc_vals, p = unpack_int_array(mv, n_exc, p)
            out[positions] = exc_vals
        return out, p
    if codec == IntCodec.ALP:
        e = mv[pos]
        ints, p = unpack_int_array(mv, n, pos + 1)
        # same IEEE-exact division the encoder verified bit-for-bit
        floats = ints.astype(np.float64) / np.float64(10.0**e)
        return floats.view(_I64).copy(), p
    if codec == IntCodec.ALP_RD:
        r, tz = int(mv[pos]), int(mv[pos + 1])
        n_dict = int(np.frombuffer(mv[pos + 2 : pos + 6], dtype="<u4")[0])
        p = pos + 6
        n_groups = -(-n // 64)
        if r:
            nbytes = n_groups * 8 * r
            words = np.frombuffer(mv[p : p + nbytes], dtype="<u8").reshape(
                n_groups, r
            )
            right = _bp64_unpack_group(
                words.astype(np.uint64, copy=False), r
            ).reshape(-1)[:n]
            p += nbytes
        else:
            right = np.zeros(n, dtype=np.uint64)
        dict_, p = unpack_int_array(mv, n_dict, p)
        codes, p = unpack_int_array(mv, n, p)
        left = dict_.view(np.uint64)[codes]
        shift = r + tz
        out = right << np.uint64(tz) if tz else right
        if shift < 64:  # shift==64 <=> zero-width left (dict is all-zero)
            out = out | (left << np.uint64(shift))
        return out.view(_I64).astype(_I64, copy=False), p
    if codec == IntCodec.ZSTD_BT:
        import pyarrow as pa

        width = int(mv[pos])
        vmin = int(np.frombuffer(mv[pos + 1 : pos + 9], dtype="<i8")[0])
        comp_len = int(np.frombuffer(mv[pos + 9 : pos + 13], dtype="<u4")[0])
        raw = pa.Codec("zstd").decompress(
            mv[pos + 13 : pos + 13 + comp_len],
            decompressed_size=n * width,
            asbytes=True,
        )
        planes = np.frombuffer(raw, dtype=np.uint8).reshape(width, n)
        if width == 1:
            u = planes[0]
        else:
            dt = {2: "<u2", 4: "<u4", 8: "<u8"}[width]
            u = np.empty(n, dtype=dt)
            bv = u.view(np.uint8).reshape(n, width)
            for p_ in range(width):
                bv[:, p_] = planes[p_]
        # narrow fusion (r7): when the caller's schema says the column is
        # 32-bit, add vmin at int32 width (wrapping == the int64 add's low
        # 32 bits; true values fit by the round-trip contract) — halves
        # the widen+add write traffic AND makes the downstream astype a
        # no-op on the hot token path
        tgt = np.int32 if prefer is np.int32 and width < 8 else _I64
        if width == 8:
            # uint64 -> int64 is a bit reinterpretation (wrapping); u is
            # decode-owned so the in-place vmin add is safe
            out = u.view(_I64) if _NATIVE_LE else u.astype("=u8").view(_I64)
            if vmin:
                with np.errstate(over="ignore"):
                    np.add(out, vmin, out=out)
        elif vmin:
            # fused widen+add: one pass instead of astype + iadd
            with np.errstate(over="ignore"):
                # wrapping scalar narrow (uint32 columns may carry a vmin
                # above int32max; the mod-2^32 add is still exact)
                out = np.add(
                    u, np.int64(vmin).astype(tgt), dtype=tgt, casting="unsafe"
                )
        else:
            out = u.astype(tgt)
        return out, pos + 13 + comp_len
    raise ValueError(f"unknown int codec {codec}")


# ---------------------------------------------------------------------------
# string codecs  (a "strings" value = lengths int64[n] + concatenated bytes)


def zebra_strings_size(lengths: np.ndarray, concat: bytes) -> int:
    return len(pack_strings(lengths, concat))


# speed-vs-size policy for expensive string codecs (FSST auto-probe):
#   balanced (default) — require both the size win AND a bounded decode cost
#   size               — size-only gate (r1/r2 behavior)
#   speed              — never auto-fire FSST (explicit allow= still works)
_CODEC_POLICY = os.environ.get("ZS_CODEC_POLICY", "balanced")
# FSST-family balanced gate is ABSOLUTE ns/byte (r6): the old snappy-ratio
# gate measured both sides on this sandbox's throttled clock, so the
# decision tracked the host's instantaneous grant instead of the codec —
# on a host where the numpy symbol expansion actually decodes fast, FSST/
# FSST_Z could never prove it because snappy sped up by the same grant.
# The budget is the SAME relative bar against a pinned nominal snappy
# decompress cost (~0.6 ns/byte on an unthrottled core; snappy's own
# published order of magnitude): 4.0 x 0.6 = 2.4 ns/byte.  Measured on
# this sandbox: snappy 1.7-2.5 ns/B (throttled), FSST 32-48 ns/B — fails
# the bar by >13x, so this host's balanced selection is unchanged; a host
# whose measured FSST decode clears 2.4 ns/B selects it (pinned by
# tests/test_codecs.py).
_FSST_NSPB_BUDGET = float(os.environ.get("ZS_FSST_NSPB_BUDGET", "2.4"))


@_contextlib.contextmanager
def codec_policy(policy: str):
    """Temporarily override the codec policy for the calling thread's
    encodes.  operators/verify.py re-encodes under ``speed`` so the audit
    pass is probe-free (no wall-clock-dependent FSST/ZLIB decode probes)
    and therefore a deterministic function of the block values."""
    global _CODEC_POLICY
    prev = _CODEC_POLICY
    _CODEC_POLICY = policy
    try:
        yield
    finally:
        _CODEC_POLICY = prev

# int-codec selection handicaps under the balanced policy: DELTA decode
# needs an extra full cumsum pass over the output (measured ~1.4x zebra /
# ~2x pfor on token streams), so it must win by >5% on size to be chosen;
# ZSTD_BT decode pays the zstd inflate + plane recombination (~1.5x the
# PFoR path), so it must win by >15%
_DECODE_HANDICAP = {
    IntCodec.DELTA: 1.05,
    IntCodec.ZSTD_BT: _ZSTD_BT_HANDICAP,
}

# probe-gate decisions per column path: {key: (fsst_worth, uses_left)}.
# Spark python workers are REUSED across jobs, so a key can outlive one
# dataset; the 64-block revalidation bounds any staleness, and the cache
# only gates the PROBE — per-block size comparison still decides.
_FSST_PROBE_CACHE: dict[str, tuple[bool, int]] = {}


# general-purpose-compressor auto-probe: same machinery as FSST — entropy
# coding typically beats snappy 2-3x on text at a decode cost between
# snappy's and FSST's, so it fills the gap the balanced policy leaves when
# FSST fails its decode budget.  The candidate is zstd via the pyarrow
# codec when available (measured on document text vs DEFLATE-6: level 12
# is 3% smaller, 1.4x faster compress AND 4.4x faster decompress — a
# strict dominance), falling back to stdlib DEFLATE otherwise.  Both wire
# ids stay decodable forever; only the CANDIDATE choice depends on the
# environment.
_GP_DECODE_BUDGET = 4.0
_ZLIB_LEVEL = 6
_ZSTD_LEVEL = 12  # balanced: beats DEFLATE-6 on size, compress and decode
_ZSTD_LEVEL_SIZE = 19  # size policy: ~19% smaller than DEFLATE-6 on text
_GP_MAX_FULL = 32 << 20  # bound the per-block full-compress latency
_GP_PROBE_CACHE: dict[str, tuple[bool, int]] = {}

# cached-positive probes attempt the expensive candidate on EVERY block of
# the column; if it keeps losing the per-block size selection anyway, flip
# the cache negative (the 64-block revalidation will re-probe) instead of
# paying full FSST/zstd for a candidate that is then discarded
_PROBE_LOSS_LIMIT = 4
_FSST_LOSS_STREAK: dict[str, int] = {}
_GP_LOSS_STREAK: dict[str, int] = {}

_HAVE_ZSTD: bool | None = None


def _zstd_available() -> bool:
    global _HAVE_ZSTD
    if _HAVE_ZSTD is None:
        try:
            import pyarrow as pa

            pa.Codec("zstd", compression_level=_ZSTD_LEVEL)
            _HAVE_ZSTD = True
        except Exception:
            _HAVE_ZSTD = False
    return _HAVE_ZSTD


def _gp_compress(data, gp_id: int, level: int) -> bytes:
    if gp_id == StrCodec.ZSTD:
        import pyarrow as pa

        return pa.Codec("zstd", compression_level=level).compress(
            data, asbytes=True
        )
    import zlib

    return zlib.compress(data, level)


def _gp_decompress(comp, gp_id: int, expected_len: int) -> bytes:
    if gp_id == StrCodec.ZSTD:
        import pyarrow as pa

        return pa.Codec("zstd").decompress(
            comp, decompressed_size=expected_len, asbytes=True
        )
    import zlib

    return zlib.decompress(bytes(comp))


def _gp_probe_decode_ok(sample: bytes, gp_probe: bytes, gp_id: int) -> bool:
    """Relative decode timing, candidate vs the snappy path ZEBRA uses."""
    import time

    import pyarrow as pa

    try:
        snappy = pa.Codec("snappy")
        snap = snappy.compress(sample)
        t0 = time.perf_counter()
        snappy.decompress(snap, len(sample))
        t_snappy = time.perf_counter() - t0
        t0 = time.perf_counter()
        _gp_decompress(gp_probe, gp_id, len(sample))
        t_gp = time.perf_counter() - t0
        return t_gp <= _GP_DECODE_BUDGET * max(t_snappy, 1e-6)
    except Exception:
        return False


def _fsst_decode_nspb(sample: bytes, fsst_probe: bytes) -> float:
    """Measured FSST decode cost of the 64 KB sample in ns per OUTPUT
    byte (best of 2 back-to-back runs to damp scheduler blips)."""
    import time

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _fsst.decompress(memoryview(fsst_probe), 0)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best * 1e9 / max(len(sample), 1)


def _probe_decode_ok(sample: bytes, fsst_probe: bytes) -> bool:
    """Gate the FSST family's balanced-policy decode budget on ABSOLUTE
    ns/byte against a pinned nominal-snappy bar (_FSST_NSPB_BUDGET) —
    see the constant's comment for why the old snappy-RATIO gate tracked
    the sandbox's grant instead of the codec."""
    try:
        return _fsst_decode_nspb(sample, fsst_probe) <= _FSST_NSPB_BUDGET
    except Exception:
        return False  # cannot prove the decode budget -> do not auto-fire


def encode_strings(
    lengths: np.ndarray,
    concat: bytes,
    allow: set[int] | None = None,
    arrow_array=None,
    probe_key: str | None = None,
):
    """Select + encode a string column. Returns ``(codec_id, payload, meta)``.

    ``arrow_array``: optional null-free arrow binary array of the same
    strings; when present the DICT candidate uses Arrow's vectorized
    ``dictionary_encode`` instead of a Python split loop.

    ``probe_key``: stable column identity (e.g. the block column path).
    The FSST auto-probe costs ~0.25 s per 64 KB sample, so its GATE
    decision is cached per column and re-validated every 64 blocks — at
    100 TB the probe would otherwise re-run for every block of the same
    column.  Only the gate is cached; the <= zebra bound still compares
    actual candidate sizes per block.
    """
    lengths = np.ascontiguousarray(lengths, dtype=_I64)
    n = len(lengths)

    def allowed(c):
        return allow is None or c in allow

    zebra_payload = pack_strings(lengths, concat)
    best = (StrCodec.ZEBRA, zebra_payload)
    candidates = {StrCodec.ZEBRA: len(zebra_payload)}

    if allowed(StrCodec.DICT) and n >= 16:
        dict_parts = _string_dict_split(lengths, concat, n, arrow_array)
        if dict_parts is not None:
            u_len, u_concat, idx = dict_parts
            icodec, ipayload, _ = encode_ints(idx)
            payload = (
                np.uint32(len(u_len)).astype("<u4").tobytes()
                + pack_strings(u_len, u_concat)
                + bytes([icodec])
                + ipayload
            )
            candidates[StrCodec.DICT] = len(payload)
            if len(payload) < len(best[1]):
                best = (StrCodec.DICT, payload)

    # FSST training costs ~hundreds of vectorized passes (~3 MB/s vs
    # snappy's ~300 MB/s), so by default only attempt it when snappy
    # compressed poorly.  ZS_FSST=aggressive widens to any large-text
    # column (measured on real docs: fsst 0.17 vs snappy 0.36 ratio — a
    # 2.1x size win when encode CPU is cheaper than storage).
    fsst_forced = allow is not None and StrCodec.FSST in allow
    aggressive = os.environ.get("ZS_FSST", "") == "aggressive"
    avg_len = len(concat) / n if n else 0
    cached = _FSST_PROBE_CACHE.get(probe_key) if probe_key else None
    if cached is not None and cached[1] > 0:
        _FSST_PROBE_CACHE[probe_key] = (cached[0], cached[1] - 1)
        cache_says_yes = bool(cached[0])
        probe_allowed = False
    else:
        cache_says_yes = False
        probe_allowed = True
    fsst_worth = (
        len(concat) >= 256
        and len(concat) <= (4 << 20)
        and (
            len(zebra_payload) > 0.6 * (len(concat) + 8 * n)
            or (aggressive and avg_len >= 64)
        )
    )
    # a cached-positive probe means FSST won on a sibling block of this
    # column: attempt it on every subsequent block, not 1-in-64 (r3 bug:
    # the heuristic recompute overwrote the cache-hit flag)
    if cache_says_yes and len(concat) <= (4 << 20):
        fsst_worth = True
    if (
        probe_allowed
        and allowed(StrCodec.FSST)
        and not (fsst_forced or fsst_worth or aggressive)
        and len(concat) >= (64 << 10)
        and avg_len >= 64
        and _CODEC_POLICY != "speed"
    ):
        # sampled probe: FSST costs ~100x snappy to run, so prove the win
        # on the first 64 KB before paying for the full column.  Full FSST
        # runs only when the sample beats the best candidate by >= 20%
        # on SIZE — and, under the default "balanced" policy, only when
        # the sample's measured DECODE cost clears the absolute
        # _FSST_NSPB_BUDGET ns/byte bar (r2 lesson: a size-only gate let
        # FSST auto-fire on document text and the decode leg regressed
        # 3.2x; r6 lesson: a snappy-RATIO gate tracked the host grant, not
        # the codec).  ZS_CODEC_POLICY=size restores the size-only gate;
        # ZS_CODEC_POLICY=speed disables the auto-probe entirely.
        sample = concat[: 64 << 10]
        probe = _fsst.compress(sample)
        decision = False
        if probe is not None:
            best_ratio = len(best[1]) / (len(concat) + 8 * n)
            if len(probe) / len(sample) < 0.8 * best_ratio:
                if _CODEC_POLICY == "size" or _probe_decode_ok(sample, probe):
                    decision = True
                    fsst_worth = len(concat) <= (4 << 20)
        if probe_key:
            _FSST_PROBE_CACHE[probe_key] = (decision, 63)

    fsstz_forced = allow is not None and StrCodec.FSST_Z in allow
    if (
        len(concat) >= 256
        and (
            (allowed(StrCodec.FSST) and (fsst_forced or fsst_worth))
            or fsstz_forced
        )
    ):
        fs = _fsst.compress(concat)
        if fs is not None:
            lcodec, lpayload, _ = encode_ints(lengths)
            head = (
                bytes([lcodec])
                + np.uint32(len(lpayload)).astype("<u4").tobytes()
                + lpayload
            )
            if allowed(StrCodec.FSST):
                payload = head + fs
                candidates[StrCodec.FSST] = len(payload)
                if len(payload) < len(best[1]):
                    best = (StrCodec.FSST, payload)
            # FSST_Z: the FSST section re-entropy-coded by zstd (FSST's
            # codes are dense byte symbols that a Huffman/FSE stage still
            # shrinks ~20-25%; the symbol pass already paid the slow
            # training, the zstd pass on the ~0.18x output is near-free).
            # Measured on document text: fsst 0.177 -> fsst+zstd 0.136-0.140
            # of raw.  Decode adds one fast inflate before the (already
            # budget-gated) symbol expansion, so the candidate rides the
            # SAME probe/streak family as FSST.
            if allowed(StrCodec.FSST_Z) and _zstd_available():
                lvl = 12 if _CODEC_POLICY == "size" else 1
                comp = _gp_compress(fs, StrCodec.ZSTD, lvl)
                payload = (
                    head
                    + np.uint32(len(fs)).astype("<u4").tobytes()
                    + np.uint32(len(comp)).astype("<u4").tobytes()
                    + comp
                )
                candidates[StrCodec.FSST_Z] = len(payload)
                if len(payload) < len(best[1]):
                    best = (StrCodec.FSST_Z, payload)

    # general-purpose-compressor candidate: zstd when pyarrow has it, else
    # DEFLATE; probe-gated exactly like FSST (its own cache + decode
    # budget).  The probe itself is cheap (~1 ms/64 KB) so it fires on any
    # sizeable text column; the FULL compress only runs on a probe win.
    if _zstd_available() and allowed(StrCodec.ZSTD):
        gp_id = StrCodec.ZSTD
        gp_level = _ZSTD_LEVEL_SIZE if _CODEC_POLICY == "size" else _ZSTD_LEVEL
    else:
        gp_id, gp_level = StrCodec.ZLIB, _ZLIB_LEVEL
    gp_forced = allow is not None and gp_id in allow
    zcached = _GP_PROBE_CACHE.get(probe_key) if probe_key else None
    if zcached is not None and zcached[1] > 0:
        _GP_PROBE_CACHE[probe_key] = (zcached[0], zcached[1] - 1)
        gp_worth = bool(zcached[0])
        zprobe_allowed = False
    else:
        gp_worth = False
        zprobe_allowed = True
    if (
        zprobe_allowed
        and allowed(gp_id)
        and not gp_forced
        and len(concat) >= (16 << 10)
        and _CODEC_POLICY != "speed"
    ):
        sample = concat[: 64 << 10]
        zprobe = _gp_compress(sample, gp_id, gp_level)
        decision = False
        best_ratio = len(best[1]) / (len(concat) + 8 * n)
        if len(zprobe) / len(sample) < 0.9 * best_ratio:
            if _CODEC_POLICY == "size" or _gp_probe_decode_ok(
                sample, zprobe, gp_id
            ):
                decision = True
        gp_worth = decision and len(concat) <= _GP_MAX_FULL
        if probe_key:
            _GP_PROBE_CACHE[probe_key] = (decision, 63)
    if gp_worth and len(concat) > _GP_MAX_FULL:
        gp_worth = False  # cached-positive on an oversized block
    if allowed(gp_id) and len(concat) >= 256 and (gp_forced or gp_worth):
        comp = _gp_compress(concat, gp_id, gp_level)
        lcodec, lpayload, _ = encode_ints(lengths)
        payload = (
            bytes([lcodec])
            + np.uint32(len(lpayload)).astype("<u4").tobytes()
            + lpayload
            + np.uint32(len(comp)).astype("<u4").tobytes()
            + comp
        )
        candidates[gp_id] = len(payload)
        if len(payload) < len(best[1]):
            best = (gp_id, payload)

    codec, payload = best
    if probe_key:
        # FSST and FSST_Z are one probe family: a win by either resets
        # the streak (FSST_Z winning must not flip the shared cache off)
        for cids, cache, streak in (
            ((StrCodec.FSST, StrCodec.FSST_Z), _FSST_PROBE_CACHE, _FSST_LOSS_STREAK),
            ((gp_id,), _GP_PROBE_CACHE, _GP_LOSS_STREAK),
        ):
            if not any(c in candidates for c in cids):
                continue
            if codec in cids:
                streak[probe_key] = 0
            else:
                s = streak.get(probe_key, 0) + 1
                streak[probe_key] = s
                if s >= _PROBE_LOSS_LIMIT and cache.get(probe_key, (False, 0))[0]:
                    cache[probe_key] = (False, 63)
                    streak[probe_key] = 0
    meta = {
        "codec": StrCodec.NAMES[codec],
        "n": n,
        "bytes": len(payload),
        "zebra_bytes": len(zebra_payload),
    }
    if len(concat):
        sample = np.frombuffer(concat[: 1 << 16], dtype=np.uint8)
        counts = np.bincount(sample, minlength=256)
        p = counts[counts > 0] / len(sample)
        meta["entropy_bits"] = round(float(-(p * np.log2(p)).sum()), 3)
        meta["cardinality_est"] = None  # string cardinality tracked by DICT gate
    return codec, payload, meta


def _string_dict_split(lengths, concat, n, arrow_array):
    """(uniq_lengths, uniq_concat, indices) for the string DICT candidate,
    or None when cardinality is too high to pay off.

    Vectorized via arrow dictionary_encode when the array is available;
    otherwise a sampled Python fallback (tests / raw-bytes callers)."""
    if arrow_array is not None:
        import pyarrow as pa
        import pyarrow.compute as pc

        denc = pc.dictionary_encode(arrow_array)
        uniq = denc.dictionary
        if len(uniq) > n // 2:
            return None
        u = uniq.cast(pa.large_binary())
        bufs = u.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[: len(u) + 1]
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2]
            else np.empty(0, np.uint8)
        )
        u_len = np.diff(offs).astype(_I64)
        u_concat = data[offs[0] : offs[-1]].tobytes()
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(_I64)
        return u_len, u_concat, idx
    offs = np.concatenate(([0], np.cumsum(lengths)))
    step = max(1, n // 512)
    sample = {concat[offs[i] : offs[i + 1]] for i in range(0, n, step)}
    if len(sample) > max(1, len(range(0, n, step)) // 2):
        return None
    uniq_map: dict[bytes, int] = {}
    idx = np.empty(n, dtype=_I64)
    for i in range(n):
        s = concat[offs[i] : offs[i + 1]]
        idx[i] = uniq_map.setdefault(s, len(uniq_map))
    if len(uniq_map) > n // 2:
        return None
    uniq_list = list(uniq_map)
    u_len = np.array([len(s) for s in uniq_list], dtype=_I64)
    return u_len, b"".join(uniq_list), idx


def decode_strings(codec: int, buf, n: int, pos: int = 0):
    """Inverse of :func:`encode_strings` → ``(lengths, concat_bytes, next_pos)``."""
    mv = memoryview(buf)
    if codec == StrCodec.ZEBRA:
        return unpack_strings(mv, n, pos)
    if codec == StrCodec.DICT:
        n_dict = int(np.frombuffer(mv[pos : pos + 4], dtype="<u4")[0])
        u_len, u_concat, p = unpack_strings(mv, n_dict, pos + 4)
        icodec = mv[p]
        idx, p = decode_ints(icodec, mv, n, p + 1)
        offs = np.concatenate(([0], np.cumsum(u_len)))
        # gather: lengths per row + concatenated bytes via vectorized copy
        lengths = u_len[idx]
        ubytes = np.frombuffer(u_concat, dtype=np.uint8)
        if len(lengths) and lengths.sum() > 0:
            src = np.repeat(offs[idx], lengths) + _concat_ranges(lengths)
            concat = ubytes[src].tobytes()
        else:
            concat = b""
        return lengths, concat, p
    if codec == StrCodec.FSST:
        lcodec = mv[pos]
        lp_len = int(np.frombuffer(mv[pos + 1 : pos + 5], dtype="<u4")[0])
        lengths, p = decode_ints(lcodec, mv, n, pos + 5)
        if p != pos + 5 + lp_len:
            raise ValueError("FSST length-section size mismatch")
        concat, p = _fsst.decompress(mv, p)
        if int(lengths.sum()) != len(concat):
            raise ValueError("FSST lengths do not sum to byte count")
        return lengths, concat, p
    if codec == StrCodec.FSST_Z:
        lcodec = mv[pos]
        lp_len = int(np.frombuffer(mv[pos + 1 : pos + 5], dtype="<u4")[0])
        lengths, p = decode_ints(lcodec, mv, n, pos + 5)
        if p != pos + 5 + lp_len:
            raise ValueError("FSST_Z length-section size mismatch")
        raw_len = int(np.frombuffer(mv[p : p + 4], dtype="<u4")[0])
        comp_len = int(np.frombuffer(mv[p + 4 : p + 8], dtype="<u4")[0])
        fs = _gp_decompress(
            mv[p + 8 : p + 8 + comp_len], StrCodec.ZSTD, raw_len
        )
        concat, used = _fsst.decompress(memoryview(fs), 0)
        if used != raw_len:
            raise ValueError("FSST_Z inner section size mismatch")
        if int(lengths.sum()) != len(concat):
            raise ValueError("FSST_Z lengths do not sum to byte count")
        return lengths, concat, p + 8 + comp_len
    if codec in (StrCodec.ZLIB, StrCodec.ZSTD):
        name = StrCodec.NAMES[codec].upper()
        lcodec = mv[pos]
        lp_len = int(np.frombuffer(mv[pos + 1 : pos + 5], dtype="<u4")[0])
        lengths, p = decode_ints(lcodec, mv, n, pos + 5)
        if p != pos + 5 + lp_len:
            raise ValueError(f"{name} length-section size mismatch")
        comp_len = int(np.frombuffer(mv[p : p + 4], dtype="<u4")[0])
        expected = int(lengths.sum())
        concat = _gp_decompress(mv[p + 4 : p + 4 + comp_len], codec, expected)
        if expected != len(concat):
            raise ValueError(f"{name} lengths do not sum to byte count")
        return lengths, concat, p + 4 + comp_len
    raise ValueError(f"unknown string codec {codec}")


def _concat_ranges(lengths: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1]: per-row arange, vectorized."""
    total = int(lengths.sum())
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
