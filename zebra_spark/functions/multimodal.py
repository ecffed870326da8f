"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
the Spark-side plumbing — schema, batching, partitioning, Arrow transfer,
UDF signatures — is real and tested.  The *media decode* itself is stubbed
(no image/audio libraries in this container): ``decode_image`` raises
``NotImplementedError`` unless the payload carries the deterministic fake
format produced by :func:`fake_image`, which encodes (height, width,
channels) + a seed so feature extraction / resizing are exactly testable.

At scale the shape matters more than the decode: payloads stream through
``mapInArrow`` in bounded batches (a 100 MB video must not be row-wise
pickled), binary columns stay Arrow buffers end to end, and outputs are
fixed-size feature vectors that downstream similarity ops consume.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

FAKE_MAGIC = b"ZSIM"

MEDIA_DDL = (
    "media_id string, kind string, payload binary, "
    "meta struct<height:int, width:int, channels:int, duration_ms:int>"
)

FEATURES_DDL = (
    "media_id string, kind string, n_bytes long, hist array<int>, "
    "features array<float>"
)

N_FEATURES = 32


def fake_image(media_id: int, h: int, w: int, c: int = 3) -> bytes:
    """Deterministic stand-in payload: magic | h | w | c | seed."""
    head = FAKE_MAGIC + np.array([h, w, c, media_id], dtype="<i4").tobytes()
    rng = np.random.default_rng(media_id)
    return head + rng.integers(0, 256, size=min(h * w * c, 4096), dtype=np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a payload to an (h, w, c) array.

    Real formats (JPEG/PNG/...) need an image library not present in this
    container — STUB: raises NotImplementedError for them.  The fake
    format decodes deterministically.
    """
    if payload[:4] != FAKE_MAGIC:
        raise NotImplementedError(
            "real image decoding requires an image library not available "
            "in this environment; use the ZSIM fake format in tests"
        )
    h, w, c, seed = (int(x) for x in np.frombuffer(payload[4:20], dtype="<i4"))
    body = np.frombuffer(payload[20:], dtype=np.uint8)
    if len(body) == h * w * c:
        return body.reshape(h, w, c)
    # truncated fake payload: pixels regenerate deterministically from seed
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def _batch_features(payloads: pa.Array):
    """Byte-histogram features for a whole Arrow binary column at once.

    One pass over the CONCATENATED payload buffer — no per-row Python loop:
    bucket = byte >> 3 (256/N_FEATURES = 8 bytes per bucket), per-row counts
    via a single bincount over ``row_index * N_FEATURES + bucket``.  Returns
    (lengths int64[n], hist int64[n, N_FEATURES], features float32[n, N]).
    """
    barr = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
    barr = barr.cast(pa.large_binary())
    bufs = barr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[
        barr.offset : barr.offset + len(barr) + 1
    ]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    flat = data[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    n = len(barr)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    buckets = (flat >> 3).astype(np.int64)
    hist = np.bincount(
        row_idx * N_FEATURES + buckets, minlength=n * N_FEATURES
    ).reshape(n, N_FEATURES)
    folded = hist.astype(np.float32)
    norms = np.sqrt((folded * folded).sum(axis=1))
    norms[norms == 0] = 1.0
    feats = folded / norms[:, None]
    return lengths, hist, feats


def _features_of(payload: bytes) -> np.ndarray:
    """Single-payload fingerprint (tests / driver-side use)."""
    _, _, feats = _batch_features(pa.array([payload], type=pa.large_binary()))
    return feats[0]


def extract_features(media: DataFrame) -> DataFrame:
    """media table -> byte-histogram feature vectors, batched via mapInArrow.

    ``hist`` carries the exact integer byte-bucket counts (oracle-checkable);
    ``features`` is the L2-normalized float view for similarity ops.
    """

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            lengths, hist, feats = _batch_features(rb.column("payload"))
            n = rb.num_rows
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("media_id"),
                    rb.column("kind"),
                    pa.array(lengths, type=pa.int64()),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(hist.reshape(-1), type=pa.int32()), N_FEATURES
                    ).cast(pa.list_(pa.int32())),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(feats.reshape(-1), type=pa.float32()), N_FEATURES
                    ).cast(pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "hist", "features"],
            )

    return media.mapInArrow(run, schema=FEATURES_DDL)


def _binary_view(arr: pa.Array):
    """(starts, lengths, flat_data, is_null) numpy views over an Arrow
    binary column — zero copies of the payload bytes."""
    barr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    barr = barr.cast(pa.large_binary())
    bufs = barr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64)[
        barr.offset : barr.offset + len(barr) + 1
    ]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    n = len(barr)
    is_null = np.zeros(n, dtype=bool)
    if bufs[0] is not None:
        bits = np.unpackbits(
            np.frombuffer(bufs[0], dtype=np.uint8), bitorder="little"
        )
        is_null = ~bits[barr.offset : barr.offset + n].astype(bool)
    return offs[:-1].copy(), np.diff(offs), data, is_null


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbour resize of decodable images (fake format).

    Vectorized over the whole Arrow batch — no per-row ``.as_py()``:
    headers parse as one fancy-index gather off the flat payload buffer,
    rows are grouped by (h, w, c) and each group resizes with a single
    precomputed gather (``data[body_starts[:, None] + idx_map]``), and the
    output binary column is assembled directly from offsets + one flat
    buffer.  Only truncated fake payloads (pixels regenerate from a per-row
    rng seed) fall back to per-row work — a test fixture path, not a scale
    path.  Rows whose payload cannot be decoded are passed through with a
    null payload and an error kind so a real pipeline can quarantine them.
    """
    magic = np.frombuffer(FAKE_MAGIC, dtype=np.uint8)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = rb.num_rows
            starts, lengths, data, is_null = _binary_view(rb.column("payload"))

            hwcs = np.zeros((n, 4), dtype=np.int64)  # h, w, c, seed
            decodable = np.zeros(n, dtype=bool)
            head_rows = np.flatnonzero(~is_null & (lengths >= 20))
            if len(head_rows):
                heads = data[starts[head_rows, None] + np.arange(20)]
                ok = (heads[:, :4] == magic).all(axis=1)
                vals = (
                    np.ascontiguousarray(heads[:, 4:20])
                    .view("<i4")
                    .astype(np.int64)
                    .reshape(-1, 4)
                )
                ok &= (vals[:, :3] > 0).all(axis=1)
                hwcs[head_rows] = vals
                decodable[head_rows] = ok

            out_len = np.where(
                decodable, 20 + out_h * out_w * hwcs[:, 2], 0
            ).astype(np.int64)
            out_offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(out_len, out=out_offs[1:])
            out_flat = np.zeros(out_offs[-1], dtype=np.uint8)

            dec_rows = np.flatnonzero(decodable)
            if len(dec_rows):
                # headers, all rows at once
                hdr = np.empty((len(dec_rows), 20), dtype=np.uint8)
                hdr[:, :4] = magic
                hdr[:, 4:] = (
                    np.stack(
                        [
                            np.full(len(dec_rows), out_h),
                            np.full(len(dec_rows), out_w),
                            hwcs[dec_rows, 2],
                            np.zeros(len(dec_rows)),
                        ],
                        axis=1,
                    )
                    .astype("<i4")
                    .view(np.uint8)
                )
                out_flat[out_offs[dec_rows, None] + np.arange(20)] = hdr

            full = decodable & (lengths - 20 == hwcs[:, 0] * hwcs[:, 1] * hwcs[:, 2])
            trunc_rows = np.flatnonzero(decodable & ~full)
            for shape in np.unique(hwcs[full][:, :3], axis=0) if full.any() else []:
                h, w, c = (int(x) for x in shape)
                grp = np.flatnonzero(full & (hwcs[:, :3] == shape).all(axis=1))
                ys = np.arange(out_h) * h // out_h
                xs = np.arange(out_w) * w // out_w
                idx_map = (
                    (ys[:, None] * w + xs[None, :]).reshape(-1)[:, None] * c
                    + np.arange(c)
                ).reshape(-1)
                resized = data[(starts[grp] + 20)[:, None] + idx_map]
                out_flat[
                    (out_offs[grp] + 20)[:, None] + np.arange(len(idx_map))
                ] = resized
            for i in trunc_rows:  # test-fixture path: rng per seed
                img = decode_image(
                    data[starts[i] : starts[i] + lengths[i]].tobytes()
                )
                ys = np.arange(out_h) * img.shape[0] // out_h
                xs = np.arange(out_w) * img.shape[1] // out_w
                out_flat[out_offs[i] + 20 : out_offs[i + 1]] = (
                    img[ys][:, xs].reshape(-1)
                )

            payload = pa.Array.from_buffers(
                pa.large_binary(),
                n,
                [
                    pa.py_buffer(
                        np.packbits(decodable, bitorder="little").tobytes()
                    ),
                    pa.py_buffer(out_offs.tobytes()),
                    pa.py_buffer(out_flat.tobytes()),
                ],
            ).cast(pa.binary())
            null_i32 = pa.nulls(n, pa.int32())
            mask = pa.array(~decodable)
            meta = pa.StructArray.from_arrays(
                [
                    pa.array(np.where(decodable, out_h, 0).astype(np.int32)),
                    pa.array(np.where(decodable, out_w, 0).astype(np.int32)),
                    pa.array(hwcs[:, 2].astype(np.int32)),
                    null_i32,
                ],
                names=["height", "width", "channels", "duration_ms"],
                mask=mask,
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("media_id"),
                    pa.array(np.where(decodable, "image", "undecodable")),
                    payload,
                    meta,
                ],
                names=["media_id", "kind", "payload", "meta"],
            )

    return media.mapInArrow(run, schema=MEDIA_DDL)
