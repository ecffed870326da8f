"""Striped block encode/decode over Arrow RecordBatches.

Mirrors zebra's schema-directed pre-order column walk
(zebra-core/src/Zebra/Serial/Binary/Table.hs:32-149 ``bTable``/``getTable``):

* int-like leaves (ints, bool, timestamps, dates)  -> int column
* doubles/floats -> bit-cast to ints, then int column
  (``bDoubleArray``, Table.hs:161-169)
* strings/binary -> lengths + concatenated bytes (``bStrings``, Array.hs:44-68)
* list<T> -> lengths int column + u64 inner count + recursed child
  (``Nested``, Striped.hs:117-125 — segmented arrays with nested-length
  columns; Arrow list arrays are offsets+child, the same layout)
* struct -> children in order (no bytes of its own, Table.hs:66-67)

Unlike zebra, every leaf goes through the codec auto-selector
(:mod:`zebra_spark.codec.codecs`), and columns may carry a validity
(null) vector — zebra has no nulls (it models optionality as enums).

Block wire layout::

    magic 'ZSB1' | u32 n_rows | u16 n_cols | column sections...

Column section::

    u8 flags (bit0 = has nulls)
    [validity: u8 int-codec | payload]   (if bit0)
    body by arrow type (see walkers below)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import (
    decode_ints,
    decode_strings,
    encode_ints,
    encode_strings,
    skip_ints,
    skip_strings,
)

__all__ = [
    "encode_batch",
    "decode_batch",
    "BLOCK_MAGIC",
    "StripedMapNotSorted",
    "StripedMapDuplicateKeys",
    "annotate_zebra_encodings",
    "ZEBRA_EPOCH_OFFSET_DAYS",
]

BLOCK_MAGIC = b"ZSB1"

# zebra stores Date/Time int columns as counts since 1600-03-01
# (Encoding.hs:53-63; Time.hs:104-116 defines validity [1600-03-01,
# 3000-01-01)).  Arrow/Spark temporals count from 1970-01-01; the offset is
# carried as block-schema metadata so a zebra-side reader can re-base.
ZEBRA_EPOCH_OFFSET_DAYS = 135080  # days from 1600-03-01 to 1970-01-01


def _zebra_encoding_of(t: pa.DataType) -> str | None:
    """zebra logical int encoding tag for an arrow type (Encoding.hs:57-63)."""
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return {
            "s": "time_seconds",
            "ms": "time_milliseconds",
            "us": "time_microseconds",
            "ns": "time_nanoseconds",  # extension: zebra stops at us
        }[t.unit]
    if pa.types.is_integer(t):
        return "int"
    return None


def annotate_zebra_encodings(schema: pa.Schema) -> pa.Schema:
    """Attach zebra logical-encoding metadata to int/temporal fields so the
    self-describing block schema is zebra-interpretable (the stored int64
    values stay arrow-epoch raw bits; re-basing to the 1600-03-01 epoch is
    ``value + offset`` using the recorded offset)."""
    fields = []
    for f in schema:
        enc = _zebra_encoding_of(f.type)
        if enc is None:
            fields.append(f)
            continue
        md = dict(f.metadata or {})
        md[b"zebra.encoding"] = enc.encode()
        if enc != "int":
            md[b"zebra.epoch"] = b"1600-03-01"
            md[b"zebra.epoch_offset_days"] = str(ZEBRA_EPOCH_OFFSET_DAYS).encode()
        fields.append(f.with_metadata(md))
    return pa.schema(fields, metadata=schema.metadata)

_I64 = np.int64

# arrow type -> int storage kind
_INT_CAST = "cast"  # value-preserving cast to int64 (and back)
_VIEW64 = "view64"  # bit reinterpretation of a 64-bit type
_VIEW32 = "view32"  # bit reinterpretation of a 32-bit type (float32)


def _int_kind(t: pa.DataType):
    if pa.types.is_float64(t):
        return _VIEW64
    if pa.types.is_float32(t):
        return _VIEW32
    if pa.types.is_uint64(t):
        return _VIEW64
    if (
        pa.types.is_integer(t)
        or pa.types.is_boolean(t)
        or pa.types.is_temporal(t)
    ):
        return _INT_CAST
    return None


def _storage_int64(arr: pa.Array) -> np.ndarray:
    """Null-filled int storage of an int-like arrow array (bit-preserving).

    r7: signed int8/16/32 (and date32 via the storage view) return their
    NATIVE numpy dtype instead of widening to int64 — encode_ints plans
    natively-narrow columns at the narrow width (half the memory traffic on
    the hot token stream) and only materializes int64 where a codec needs
    it; the wire bytes are value-determined and unchanged."""
    t = arr.type
    kind = _int_kind(t)
    if arr.null_count:
        arr = pc.fill_null(arr, pa.scalar(0, t) if not pa.types.is_boolean(t) else False)
    if kind == _VIEW64:
        if pa.types.is_float64(t):
            return arr.to_numpy(zero_copy_only=False).view(_I64)
        # uint64: wrap-around view
        return arr.to_numpy(zero_copy_only=False).view(_I64)
    if kind == _VIEW32:
        f32 = arr.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
        return f32.view(np.int32).astype(_I64)
    if pa.types.is_temporal(t):
        # bit-reinterpret to the storage integer first (date32 -> int32 etc.);
        # arrow cannot cast every temporal type to int64 directly
        storage = pa.int32() if t.bit_width == 32 else pa.int64()
        arr = arr.view(storage)
    if arr.type.id in _NARROW_NATIVE:
        # zero-copy for the common narrow case; the codec plans natively
        return arr.to_numpy(zero_copy_only=False)
    return pc.cast(arr, pa.int64(), safe=False).to_numpy(zero_copy_only=False)


_NARROW_NATIVE = {pa.int8().id, pa.int16().id, pa.int32().id}


_NP_INT = {
    pa.int8().id: np.int8,
    pa.int16().id: np.int16,
    pa.int32().id: np.int32,
    pa.int64().id: _I64,
    pa.uint8().id: np.uint8,
    pa.uint16().id: np.uint16,
    pa.uint32().id: np.uint32,
}


def _from_storage_int64(vals: np.ndarray, t: pa.DataType, mask) -> pa.Array:
    """Rebuild an arrow array of type ``t`` from its int64 storage."""
    if pa.types.is_float64(t):
        return pa.array(vals.view(np.float64), type=t, mask=mask)
    if pa.types.is_float32(t):
        return pa.array(
            vals.astype(np.int32).view(np.float32), type=t, mask=mask
        )
    if pa.types.is_uint64(t):
        return pa.array(vals.view(np.uint64), type=t, mask=mask)
    if pa.types.is_boolean(t):
        return pa.array(vals != 0, type=t, mask=mask)
    if pa.types.is_temporal(t):
        # numpy downcast + direct construction: one pass instead of
        # build-int64-arrow-then-cast (two passes; ~15% of decode time)
        storage = pa.int32() if t.bit_width == 32 else pa.int64()
        np_t = np.int32 if t.bit_width == 32 else _I64
        return pa.array(
            vals.astype(np_t, copy=False), type=storage, mask=mask
        ).view(t)
    np_t = _NP_INT.get(t.id)
    if np_t is not None:
        return pa.array(vals.astype(np_t, copy=False), type=t, mask=mask)
    arr = pa.array(vals, type=pa.int64(), mask=mask)
    return arr.cast(t, safe=False)


def _binary_parts(arr: pa.Array):
    """(lengths int64, concat bytes) of a string/binary array, nulls -> len 0."""
    t = arr.type
    target = pa.large_binary()
    if arr.null_count:
        arr = pc.fill_null(arr, b"" if not pa.types.is_string(t) else "")
    barr = arr.cast(target)
    buffers = barr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        barr.offset : barr.offset + len(barr) + 1
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] else np.empty(0, np.uint8)
    lengths = np.diff(offsets)
    concat = data[offsets[0] : offsets[-1]].tobytes()
    return lengths.astype(_I64), concat


def _validity_np(arr: pa.Array) -> np.ndarray:
    return arr.is_valid().to_numpy(zero_copy_only=False)


def _bitmap_from_bool(valid: np.ndarray):
    return pa.array(valid).buffers()[1]


class _Sizes:
    """Accumulates ours-vs-zebra sizes for selector metrics."""

    def __init__(self):
        self.enc = 0
        self.zebra = 0
        self.cols = {}

    def leaf(self, path, meta, extra_zebra=0):
        self.cols[path] = meta
        self.enc += meta["bytes"]
        self.zebra += meta["zebra_bytes"] + extra_zebra


def _encode_column(
    arr: pa.Array, path: str, out: list, sizes: _Sizes, use_hints: bool = True
):
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    key = path if use_hints else None
    t = arr.type
    flags = 0
    has_nulls = arr.null_count > 0
    if has_nulls:
        flags |= 1
    out.append(bytes([flags]))
    if has_nulls:
        # bool -> int8 is a zero-copy reinterpretation; the codec plans
        # narrow dtypes natively (values 0/1, wire unchanged)
        valid = _validity_np(arr).view(np.int8)
        c, p, m = encode_ints(valid, probe_key=key and key + "#valid")
        out.append(bytes([c]))
        out.append(p)
        sizes.leaf(path + "#valid", m)

    if _int_kind(t) is not None:
        vals = _storage_int64(arr)
        # float64 columns get the ALP decimal + ALP-RD candidates; float32
        # bit patterns get ALP-RD only (pure bit transform — codecs.py)
        c, p, m = encode_ints(
            vals,
            float_view=pa.types.is_float64(t),
            float32_view=pa.types.is_float32(t),
            probe_key=key,
        )
        out.append(bytes([c]))
        out.append(p)
        sizes.leaf(path, m)
        return
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(
        t
    ) or pa.types.is_large_binary(t):
        lengths, concat = _binary_parts(arr)
        null_free = pc.fill_null(arr, b"" if not pa.types.is_string(t) else "") if arr.null_count else arr
        c, p, m = encode_strings(lengths, concat, arrow_array=null_free, probe_key=key)
        out.append(bytes([c]))
        out.append(p)
        sizes.leaf(path, m)
        return
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        lengths_arr = pc.list_value_length(arr)
        if lengths_arr.null_count:
            lengths_arr = pc.fill_null(lengths_arr, 0)
        # int32 for list / int64 for large_list — the codec takes either
        lengths = lengths_arr.to_numpy(zero_copy_only=False)
        child = arr.flatten()  # concatenated values of valid rows only
        c, p, m = encode_ints(lengths, probe_key=key and key + "#len")
        out.append(bytes([c]))
        out.append(p)
        sizes.leaf(path + "#len", m)
        out.append(np.uint64(len(child)).astype("<u8").tobytes())
        _encode_column(child, path + ".item", out, sizes, use_hints=use_hints)
        return
    if pa.types.is_struct(t):
        for i, field in enumerate(t):
            _encode_column(arr.field(i), path + "." + field.name, out, sizes, use_hints=use_hints)
        return
    if pa.types.is_map(t):
        # map<k,v> ~ zebra's Map table nested per row (Schema.hs:83): a
        # lengths column + flat key/value children.  Arrow stores maps as
        # list<struct<key,value>> — encode exactly that representation
        # (validity flag already emitted above for this node).
        as_list = arr.cast(_map_as_list_type(t))
        lengths_arr = pc.list_value_length(as_list)
        if lengths_arr.null_count:
            lengths_arr = pc.fill_null(lengths_arr, 0)
        lengths = lengths_arr.to_numpy(zero_copy_only=False)
        child = as_list.flatten()
        c, p, m = encode_ints(lengths, probe_key=key and key + "#len")
        out.append(bytes([c]))
        out.append(p)
        sizes.leaf(path + "#len", m)
        out.append(np.uint64(len(child)).astype("<u8").tobytes())
        _encode_column(child, path + ".entries", out, sizes, use_hints=use_hints)
        return
    raise NotImplementedError(f"unsupported arrow type for block encode: {t}")


def _map_as_list_type(t: pa.DataType) -> pa.DataType:
    return pa.list_(
        pa.field(
            "entries",
            pa.struct(
                [
                    pa.field("key", t.key_type, nullable=False),
                    pa.field("value", t.item_type),
                ]
            ),
            nullable=False,
        )
    )


def encode_batch(batch: pa.RecordBatch, use_hints: bool = True):
    """Encode a RecordBatch into one striped block. Returns (payload, meta).

    ``use_hints=False`` disables the per-column probe/hint caches so the
    encode is a pure function of the batch values (the audit path in
    operators/verify.py needs a deterministic re-encode; the caches make
    production selection depend on which blocks preceded this one)."""
    out: list[bytes] = [
        BLOCK_MAGIC,
        np.uint32(batch.num_rows).astype("<u4").tobytes(),
        np.uint16(batch.num_columns).astype("<u2").tobytes(),
    ]
    sizes = _Sizes()
    for name, col in zip(batch.schema.names, batch.columns):
        _encode_column(col, name, out, sizes, use_hints=use_hints)
    payload = b"".join(out)
    meta = {
        "n_rows": batch.num_rows,
        "enc_bytes": len(payload),
        "zebra_bytes": sizes.zebra,
        "raw_bytes": batch.nbytes,
        "cols": sizes.cols,
    }
    return payload, meta


class StripedMapNotSorted(ValueError):
    """Map keys within a row are not strictly ascending (Striped.hs:572-585)."""


class StripedMapDuplicateKeys(ValueError):
    """Duplicate map keys within a row (Striped.hs:586-591)."""


def _validate_map_rows(entries: pa.Array, lengths: np.ndarray, n: int):
    """Per-row key sortedness/uniqueness, vectorized: one adjacent-pair
    comparison over the flat key child, masked to within-row pairs.

    zebra enforces this whenever a striped map is reconstituted to logical
    form (Striped.hs:572-591); it is opt-in here because Spark map columns
    carry no ordering invariant (zebra's Map is a sorted container by
    construction, ours is whatever the source produced).
    """
    keys = entries.field("key") if isinstance(entries, pa.StructArray) else entries
    inner_n = len(keys)
    if inner_n <= 1 or n == 0:
        return
    row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
    same_row = row_id[1:] == row_id[:-1]
    if not same_row.any():
        return
    try:
        gt = pc.greater(keys.slice(1), keys.slice(0, inner_n - 1))
        eq = pc.equal(keys.slice(1), keys.slice(0, inner_n - 1))
    except pa.lib.ArrowNotImplementedError:
        return  # non-comparable key type: skip (zebra has no such keys)
    gt_np = gt.to_numpy(zero_copy_only=False)
    eq_np = eq.to_numpy(zero_copy_only=False)
    if (same_row & eq_np).any():
        raise StripedMapDuplicateKeys("duplicate map keys within a row")
    if (same_row & ~gt_np & ~eq_np).any():
        raise StripedMapNotSorted("map keys not strictly ascending within a row")


def _decode_column(mv: memoryview, pos: int, t: pa.DataType, n: int):
    flags = mv[pos]
    pos += 1
    mask = None
    if flags & 1:
        vc = mv[pos]
        valid, pos = decode_ints(vc, mv, n, pos + 1)
        mask = valid == 0  # pa mask marks NULL positions

    if _int_kind(t) is not None:
        c = mv[pos]
        # 32-bit columns (int32/uint32/date32/float32-view): hint the
        # codec to emit int32 directly so the storage->arrow astype below
        # becomes a no-op (r7; values identical — see decode_ints)
        prefer = np.int32 if getattr(t, "bit_width", 64) == 32 else None
        vals, pos = decode_ints(c, mv, n, pos + 1, prefer=prefer)
        return _from_storage_int64(vals, t, mask), pos
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(
        t
    ) or pa.types.is_large_binary(t):
        c = mv[pos]
        lengths, concat, pos = decode_strings(c, mv, n, pos + 1)
        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
        validity_buf = _bitmap_from_bool(~mask) if mask is not None else None
        arr = pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [validity_buf, pa.py_buffer(offsets.tobytes()), pa.py_buffer(concat)],
            null_count=int(mask.sum()) if mask is not None else 0,
        )
        return arr.cast(t), pos
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        c = mv[pos]
        lengths, pos = decode_ints(c, mv, n, pos + 1)
        inner_n = int(np.frombuffer(mv[pos : pos + 8], dtype="<u8")[0])
        pos += 8
        child, pos = _decode_column(mv, pos, t.value_type, inner_n)
        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
        if offsets[-1] != inner_n:
            raise ValueError("list lengths do not sum to child length")
        validity_buf = _bitmap_from_bool(~mask) if mask is not None else None
        big = pa.LargeListArray.from_buffers(
            pa.large_list(child.type),
            n,
            [validity_buf, pa.py_buffer(offsets.tobytes())],
            null_count=int(mask.sum()) if mask is not None else 0,
            children=[child],
        )
        return big.cast(t), pos
    if pa.types.is_struct(t):
        children = []
        for field in t:
            charr, pos = _decode_column(mv, pos, field.type, n)
            children.append(charr)
        arr = pa.StructArray.from_arrays(
            children, fields=list(t), mask=pa.array(mask) if mask is not None else None
        )
        return arr, pos
    if pa.types.is_map(t):
        c = mv[pos]
        lengths, pos = decode_ints(c, mv, n, pos + 1)
        inner_n = int(np.frombuffer(mv[pos : pos + 8], dtype="<u8")[0])
        pos += 8
        entries_type = _map_as_list_type(t).value_type
        entries, pos = _decode_column(mv, pos, entries_type, inner_n)
        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
        validity_buf = _bitmap_from_bool(~mask) if mask is not None else None
        arr = pa.Array.from_buffers(
            t,
            n,
            [validity_buf, pa.py_buffer(offsets.tobytes())],
            null_count=int(mask.sum()) if mask is not None else 0,
            children=[entries],
        )
        return arr, pos
    raise NotImplementedError(f"unsupported arrow type for block decode: {t}")


def _skip_column(mv: memoryview, pos: int, t: pa.DataType, n: int) -> int:
    """Advance past a column section without decoding it (projection pushdown)."""
    flags = mv[pos]
    pos += 1
    if flags & 1:
        pos = skip_ints(mv[pos], mv, n, pos + 1)
    if _int_kind(t) is not None:
        return skip_ints(mv[pos], mv, n, pos + 1)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(
        t
    ) or pa.types.is_large_binary(t):
        return skip_strings(mv[pos], mv, n, pos + 1)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        pos = skip_ints(mv[pos], mv, n, pos + 1)
        inner_n = int(np.frombuffer(mv[pos : pos + 8], dtype="<u8")[0])
        return _skip_column(mv, pos + 8, t.value_type, inner_n)
    if pa.types.is_struct(t):
        for field in t:
            pos = _skip_column(mv, pos, field.type, n)
        return pos
    if pa.types.is_map(t):
        pos = skip_ints(mv[pos], mv, n, pos + 1)
        inner_n = int(np.frombuffer(mv[pos : pos + 8], dtype="<u8")[0])
        return _skip_column(mv, pos + 8, _map_as_list_type(t).value_type, inner_n)
    raise NotImplementedError(f"unsupported arrow type for block skip: {t}")


def _walk_validate_maps(arr: pa.Array):
    """Recursively validate every map node in a decoded column."""
    t = arr.type
    if pa.types.is_map(t):
        as_list = arr.cast(_map_as_list_type(t))
        lengths_arr = pc.list_value_length(as_list)
        if lengths_arr.null_count:
            lengths_arr = pc.fill_null(lengths_arr, 0)
        lengths = pc.cast(lengths_arr, pa.int64()).to_numpy(zero_copy_only=False)
        entries = as_list.flatten()
        _validate_map_rows(entries, lengths, len(arr))
        for i in range(entries.type.num_fields):
            _walk_validate_maps(entries.field(i))
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        _walk_validate_maps(arr.flatten())
    elif pa.types.is_struct(t):
        for i in range(t.num_fields):
            _walk_validate_maps(arr.field(i))


def decode_batch(
    payload, schema: pa.Schema, columns=None, validate_maps: bool = False
) -> pa.RecordBatch:
    """Inverse of :func:`encode_batch` for the given arrow schema.

    ``columns``: optional iterable of top-level column names — other
    sections are SKIPPED (header parsing only, no decompression), the
    block-level analogue of parquet column pruning.

    ``validate_maps``: enforce zebra's sorted/duplicate-free Map invariant
    on every decoded map node (Striped.hs:572-591, raising the
    ``StripedMapNotSorted`` / ``StripedMapDuplicateKeys`` equivalents).
    Opt-in: Spark map columns carry no ordering invariant, so blocks we
    encoded from arbitrary Spark data may legitimately hold unsorted maps.
    """
    mv = memoryview(payload)
    if bytes(mv[:4]) != BLOCK_MAGIC:
        raise ValueError("bad block magic")
    n_rows = int(np.frombuffer(mv[4:8], dtype="<u4")[0])
    n_cols = int(np.frombuffer(mv[8:10], dtype="<u2")[0])
    if n_cols != len(schema):
        raise ValueError(
            f"block has {n_cols} columns but schema expects {len(schema)}"
        )
    want = None if columns is None else set(columns)
    pos = 10
    arrays = []
    fields = []
    for field in schema:
        if want is None or field.name in want:
            arr, pos = _decode_column(mv, pos, field.type, n_rows)
            if validate_maps:
                _walk_validate_maps(arr)
            arrays.append(arr)
            fields.append(field)
        else:
            pos = _skip_column(mv, pos, field.type, n_rows)
    if pos != len(mv):
        raise ValueError(f"trailing bytes in block: {len(mv) - pos}")
    return pa.RecordBatch.from_arrays(
        arrays, schema=pa.schema(fields, metadata=schema.metadata)
    )
