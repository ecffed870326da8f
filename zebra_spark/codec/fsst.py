"""FSST-style string-table compression, vectorized in numpy.

FSST (Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
VLDB 2020) compresses strings with a table of up to 255 multi-byte symbols
plus an escape byte (255) for literals.  This is a from-scratch variant that
builds its symbol table by byte-pair merges (so every symbol is a
composition of trained merges, symbols up to ~2**n_rounds bytes), trained on
a sample and applied vectorized over the whole corpus — no per-byte Python
loops on the data path.

The reference repo has no FSST (zebra compresses strings with snappy only —
zebra-core/src/Zebra/Serial/Binary/Array.hs:81-89); this codec is one of
the green-field extensions required by the north rule.

Wire layout of a section produced by :func:`compress`::

    u32 dec_len | u32 enc_len | u8 n_codes |
    n_codes * (u8 sym_len | sym bytes) | enc bytes

Code semantics: byte ``c < n_codes`` expands to table symbol ``c``;
byte 255 escapes the following literal byte.  (Codes in
``[n_codes, 255)`` never appear.)
"""

from __future__ import annotations

import numpy as np

__all__ = ["compress", "decompress", "train_and_encode"]

_MAX_CODES = 255  # code 255 is the escape
_SAMPLE = 1 << 16
_MIN_PAIR_COUNT = 4
_MAX_ROUNDS = 254


def _train(sample: np.ndarray):
    """Byte-pair merge training. Returns (merges, expansions).

    merges: list of (x_id, y_id, new_id); expansions: id -> bytes.
    Self-pairs (x == y) are excluded so replacement needs no overlap
    resolution (two adjacent matches would require x == y).
    """
    a = sample.astype(np.int32)
    expansions: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    merges: list[tuple[int, int, int]] = []
    next_id = 256
    for _ in range(_MAX_ROUNDS):
        if len(a) < 2 or len(merges) >= _MAX_CODES - 1:
            break
        keys = a[:-1].astype(np.int64) * 1024 + a[1:]
        keys = keys[a[:-1] != a[1:]]
        if len(keys) == 0:
            break
        uniq, counts = np.unique(keys, return_counts=True)
        # most frequent pair whose combined expansion still fits the wire's
        # u8 symbol length (highly repetitive text can otherwise double a
        # symbol past 255 bytes); bounded scan — if the top candidates are
        # all oversized, further merges would be too
        x = y = None
        for bi in np.argsort(-counts, kind="stable")[:32]:
            if counts[bi] < _MIN_PAIR_COUNT:
                break
            key = int(uniq[bi])
            cx, cy = key // 1024, key % 1024
            if len(expansions[cx]) + len(expansions[cy]) <= 255:
                x, y = cx, cy
                break
        if x is None:
            break
        match = (a[:-1] == x) & (a[1:] == y)
        idx = np.flatnonzero(match)
        a[idx] = next_id
        keep = np.ones(len(a), dtype=bool)
        keep[idx + 1] = False
        a = a[keep]
        expansions[next_id] = expansions[x] + expansions[y]
        merges.append((x, y, next_id))
        next_id += 1
    return merges, expansions


def _apply_merges(data: np.ndarray, merges) -> np.ndarray:
    a = data.astype(np.int32)
    for x, y, new_id in merges:
        if len(a) < 2:
            break
        match = (a[:-1] == x) & (a[1:] == y)
        idx = np.flatnonzero(match)
        if len(idx) == 0:
            continue
        a[idx] = new_id
        keep = np.ones(len(a), dtype=bool)
        keep[idx + 1] = False
        a = a[keep]
    return a


def train_and_encode(data: bytes):
    """Returns (table: list[bytes], encoded: np.uint8 array) or None."""
    raw = np.frombuffer(data, dtype=np.uint8)
    sample = raw[:_SAMPLE]
    merges, expansions = _train(sample)
    if len(merges) < 2:
        return None
    tokens = _apply_merges(raw, merges)

    # fill the code table: all merge symbols + most frequent literals
    ids, counts = np.unique(tokens, return_counts=True)
    merge_ids = [m[2] for m in merges]
    table_ids = list(merge_ids)
    lit_mask = ids < 256
    lit_ids = ids[lit_mask]
    lit_counts = counts[lit_mask]
    order = np.argsort(-lit_counts, kind="stable")
    for oi in order:
        if len(table_ids) >= _MAX_CODES:
            break
        table_ids.append(int(lit_ids[oi]))

    code_of = np.full(max(expansions) + 1, -1, dtype=np.int32)
    for code, sid in enumerate(table_ids):
        code_of[sid] = code

    codes = code_of[tokens]
    has_code = codes >= 0
    out_len = np.where(has_code, 1, 2)
    offs = np.concatenate(([0], np.cumsum(out_len)))[:-1]
    out = np.empty(int(out_len.sum()), dtype=np.uint8)
    out[offs[has_code]] = codes[has_code]
    esc = ~has_code
    out[offs[esc]] = 255
    out[offs[esc] + 1] = tokens[esc]  # escaped tokens are always literals (<256)
    table = [expansions[sid] for sid in table_ids]
    return table, out


def compress(data: bytes) -> bytes | None:
    """Full FSST section for ``data``, or None when training finds no table."""
    res = train_and_encode(data)
    if res is None:
        return None
    table, enc = res
    parts = [
        np.uint32(len(data)).astype("<u4").tobytes(),
        np.uint32(len(enc)).astype("<u4").tobytes(),
        bytes([len(table)]),
    ]
    for sym in table:
        parts.append(bytes([len(sym)]))
        parts.append(sym)
    parts.append(enc.tobytes())
    return b"".join(parts)


def decompress(buf, pos: int = 0):
    """Decode a section written by :func:`compress` → (bytes, next_pos)."""
    mv = memoryview(buf)
    dec_len = int(np.frombuffer(mv[pos : pos + 4], dtype="<u4")[0])
    enc_len = int(np.frombuffer(mv[pos + 4 : pos + 8], dtype="<u4")[0])
    n_codes = mv[pos + 8]
    p = pos + 9
    sym_bytes = []
    for _ in range(n_codes):
        ln = mv[p]
        sym_bytes.append(bytes(mv[p + 1 : p + 1 + ln]))
        p += 1 + ln
    enc = np.frombuffer(mv[p : p + enc_len], dtype=np.uint8)
    p += enc_len

    out = _decode_stream(enc, sym_bytes, dec_len)
    return out, p


def _decode_stream(enc: np.ndarray, table: list[bytes], dec_len: int) -> bytes:
    """Vectorized escape-aware decode.

    Escape parsing without a sequential scan: a byte immediately after any
    non-255 byte is always in code position, so within each maximal run of
    consecutive 255s the even offsets are escapes; an odd-length run also
    consumes the byte that follows it.
    """
    n = len(enc)
    if n == 0:
        if dec_len != 0:
            raise ValueError("fsst: empty stream but nonzero dec_len")
        return b""
    is255 = enc == 255
    idx255 = np.flatnonzero(is255)
    escape = np.zeros(n, dtype=bool)
    consumed = np.zeros(n, dtype=bool)
    if len(idx255):
        run_start = np.concatenate(([True], np.diff(idx255) > 1))
        run_id = np.cumsum(run_start) - 1
        start_pos = idx255[run_start]
        off = idx255 - start_pos[run_id]
        esc_idx = idx255[off % 2 == 0]
        escape[esc_idx] = True
        consumed[np.minimum(esc_idx + 1, n - 1)] = True
        if escape[-1] if n else False:
            raise ValueError("fsst: dangling escape at end of stream")
    is_code = ~consumed
    code_pos = np.flatnonzero(is_code & ~escape)  # table-coded tokens
    esc_pos = np.flatnonzero(escape)  # escape tokens (literal at pos+1)

    # per-token output lengths, in stream order
    tok_pos = np.flatnonzero(is_code)  # token start positions (codes + escapes)
    sym_len = np.array([len(s) for s in table], dtype=np.int64)
    lens = np.ones(len(tok_pos), dtype=np.int64)
    is_esc_tok = escape[tok_pos]
    code_vals = enc[tok_pos[~is_esc_tok]]
    if len(code_vals) and int(code_vals.max()) >= len(table):
        raise ValueError("fsst: code byte outside symbol table")
    lens[~is_esc_tok] = sym_len[code_vals]
    out_offs = np.concatenate(([0], np.cumsum(lens)))
    if out_offs[-1] != dec_len:
        raise ValueError(
            f"fsst: decoded length {out_offs[-1]} != expected {dec_len}"
        )
    out = np.empty(dec_len, dtype=np.uint8)

    # escaped literals: single bytes from the stream itself
    esc_tok_idx = np.flatnonzero(is_esc_tok)
    out[out_offs[esc_tok_idx]] = enc[tok_pos[esc_tok_idx] + 1]

    # table symbols: gather from flattened table
    flat = np.frombuffer(b"".join(table), dtype=np.uint8)
    tbl_offs = np.concatenate(([0], np.cumsum(sym_len)))[:-1]
    code_tok_idx = np.flatnonzero(~is_esc_tok)
    if len(code_tok_idx):
        ls = sym_len[code_vals]
        dst = np.repeat(out_offs[code_tok_idx], ls) + _ranges(ls)
        src = np.repeat(tbl_offs[code_vals], ls) + _ranges(ls)
        out[dst] = flat[src]
    return out.tobytes()


def _ranges(lengths: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1]"""
    total = int(lengths.sum())
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
