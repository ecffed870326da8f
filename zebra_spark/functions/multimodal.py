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


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbour resize of decodable images (fake format).

    Demonstrates the decode -> transform -> re-encode plumbing shape; rows
    whose payload cannot be decoded are passed through with a null payload
    and an error kind so a real pipeline can route them to quarantine.
    """

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            out_ids, out_kinds, out_payloads, out_meta = [], [], [], []
            for i in range(rb.num_rows):
                mid = rb.column("media_id")[i].as_py()
                payload = rb.column("payload")[i].as_py()
                try:
                    img = decode_image(payload)
                    ys = (np.arange(out_h) * img.shape[0] // out_h).astype(int)
                    xs = (np.arange(out_w) * img.shape[1] // out_w).astype(int)
                    resized = img[ys][:, xs]
                    out_payloads.append(
                        FAKE_MAGIC
                        + np.array(
                            [out_h, out_w, img.shape[2], 0], dtype="<i4"
                        ).tobytes()
                        + resized.tobytes()
                    )
                    out_kinds.append("image")
                    out_meta.append(
                        {"height": out_h, "width": out_w, "channels": img.shape[2], "duration_ms": None}
                    )
                except NotImplementedError:
                    out_payloads.append(None)
                    out_kinds.append("undecodable")
                    out_meta.append(None)
                out_ids.append(mid)
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": out_ids,
                    "kind": out_kinds,
                    "payload": out_payloads,
                    "meta": out_meta,
                },
                schema=pa.schema(
                    [
                        ("media_id", pa.string()),
                        ("kind", pa.string()),
                        ("payload", pa.binary()),
                        (
                            "meta",
                            pa.struct(
                                [
                                    ("height", pa.int32()),
                                    ("width", pa.int32()),
                                    ("channels", pa.int32()),
                                    ("duration_ms", pa.int32()),
                                ]
                            ),
                        ),
                    ]
                ),
            )

    return media.mapInArrow(run, schema=MEDIA_DDL)
