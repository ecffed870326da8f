"""Multimodal plumbing: binary payload columns through Spark Arrow UDFs."""

from __future__ import annotations

import numpy as np
import pytest

from zebra_spark.functions.multimodal import (
    decode_image,
    extract_features,
    fake_image,
    resize_images,
)
from zebra_spark.operators.decode import decode_df
from zebra_spark.operators.encode import encode_df


def _media_df(spark, n=20):
    rows = [
        (f"m{i}", "image", bytearray(fake_image(i, 32 + i, 16 + i)),
         (32 + i, 16 + i, 3, None))
        for i in range(n)
    ]
    rows.append(("bad", "image", bytearray(b"JPEG-not-really"), (0, 0, 0, None)))
    return spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<height:int,width:int,channels:int,duration_ms:int>",
    )


def test_decode_image_stub_contract():
    img = decode_image(fake_image(3, 8, 4))
    assert img.shape == (8, 4, 3)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")


def test_extract_features(spark):
    media = _media_df(spark)
    out = extract_features(media).collect()
    assert len(out) == 21
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id["m0"]["features"]) == 32
    # unit norm
    assert abs(sum(x * x for x in by_id["m1"]["features"]) - 1.0) < 1e-5
    # deterministic: same payload -> same features
    out2 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert out2["m3"] == by_id["m3"]["features"]


def test_resize_images(spark):
    media = _media_df(spark, n=5)
    out = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    resized = decode_image(bytes(out["m2"]["payload"]))
    assert resized.shape == (8, 8, 3)
    # nearest-neighbour oracle
    src = decode_image(fake_image(2, 34, 18))
    ys = (np.arange(8) * 34 // 8).astype(int)
    xs = (np.arange(8) * 18 // 8).astype(int)
    np.testing.assert_array_equal(resized, src[ys][:, xs])
    # undecodable rows are routed, not crashed
    assert out["bad"]["kind"] == "undecodable" and out["bad"]["payload"] is None


def test_resize_images_vectorized_paths(spark):
    """Mixed shapes, truncated fake payloads (body > 4096 cap), null
    payloads, and undecodable bytes — every row matches the per-row
    reference decode+index resize."""
    rows = [
        # two distinct full-body shapes (grouped gathers)
        ("a0", "image", bytearray(fake_image(100, 16, 16)), None),
        ("a1", "image", bytearray(fake_image(101, 16, 16)), None),
        ("b0", "image", bytearray(fake_image(102, 24, 10)), None),
        # truncated fake: 64*64*3 > 4096 -> rng-regenerate path
        ("t0", "image", bytearray(fake_image(103, 64, 64)), None),
        # null payload and garbage bytes -> quarantined
        ("n0", "image", None, None),
        ("g0", "image", bytearray(b"\x89PNG----------------------"), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<height:int,width:int,channels:int,duration_ms:int>",
    )
    out = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    for mid, payload in [
        ("a0", fake_image(100, 16, 16)),
        ("a1", fake_image(101, 16, 16)),
        ("b0", fake_image(102, 24, 10)),
        ("t0", fake_image(103, 64, 64)),
    ]:
        src = decode_image(payload)
        ys = (np.arange(8) * src.shape[0] // 8).astype(int)
        xs = (np.arange(8) * src.shape[1] // 8).astype(int)
        got = decode_image(bytes(out[mid]["payload"]))
        np.testing.assert_array_equal(got, src[ys][:, xs], err_msg=mid)
        assert out[mid]["kind"] == "image"
        assert out[mid]["meta"]["height"] == 8 and out[mid]["meta"]["width"] == 8
    for mid in ("n0", "g0"):
        assert out[mid]["kind"] == "undecodable"
        assert out[mid]["payload"] is None and out[mid]["meta"] is None


def test_media_blocks_roundtrip(spark):
    """Binary media payloads survive the striped block codec bit-exactly."""
    media = _media_df(spark).select("media_id", "kind", "payload")
    dec = decode_df(encode_df(media, rows_per_block=8), schema=media.schema)
    assert media.exceptAll(dec).count() == 0 and dec.exceptAll(media).count() == 0


def test_ppm_golden_decode():
    """Hand-built P6 payload (public Netpbm spec): header with a comment
    line, 2x2 RGB — decode_image returns the exact pixel grid, and the
    ppm_image encoder round-trips it."""
    from zebra_spark.functions.multimodal import ppm_image

    pixels = bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  7, 8, 9]
    )
    payload = b"P6\n# a comment\n2 2\n255\n" + pixels
    img = decode_image(payload)
    assert img.shape == (2, 2, 3)
    np.testing.assert_array_equal(
        img, np.frombuffer(pixels, np.uint8).reshape(2, 2, 3)
    )
    # encoder -> decoder fixed point
    np.testing.assert_array_equal(decode_image(ppm_image(img)), img)
    # malformed: 16-bit maxval is unsupported, not silently misread
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n65535\n" + pixels * 2)
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n" + pixels[:6])  # short body


def test_resize_images_ppm(spark):
    """PPM payloads resize through the SAME grouped-gather path as the
    fake format and come back as valid P6 bytes; mixed fake+PPM batches
    keep both."""
    from zebra_spark.functions.multimodal import ppm_image

    rng = np.random.default_rng(42)
    p_a = ppm_image(rng.integers(0, 256, (16, 12, 3), dtype=np.uint8))
    p_b = ppm_image(rng.integers(0, 256, (16, 12, 3), dtype=np.uint8))
    p_c = ppm_image(rng.integers(0, 256, (9, 33, 3), dtype=np.uint8))
    rows = [
        ("p0", "image", bytearray(p_a), None),
        ("p1", "image", bytearray(p_b), None),
        ("p2", "image", bytearray(p_c), None),
        ("f0", "image", bytearray(fake_image(7, 16, 16)), None),
        ("short", "image", bytearray(b"P6\n4 4\n255\nxy"), None),  # short body
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<height:int,width:int,channels:int,duration_ms:int>",
    )
    out = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    for mid, payload in [("p0", p_a), ("p1", p_b), ("p2", p_c)]:
        src = decode_image(payload)
        ys = (np.arange(8) * src.shape[0] // 8).astype(int)
        xs = (np.arange(8) * src.shape[1] // 8).astype(int)
        got_bytes = bytes(out[mid]["payload"])
        assert got_bytes.startswith(b"P6\n")  # real-format output
        np.testing.assert_array_equal(
            decode_image(got_bytes), src[ys][:, xs], err_msg=mid
        )
        assert out[mid]["kind"] == "image"
        assert out[mid]["meta"]["channels"] == 3
    assert out["f0"]["kind"] == "image"
    assert out["short"]["kind"] == "undecodable"


def test_bmp_golden_decode_and_roundtrip():
    """Hand-built 24-bit BI_RGB BMP (public Windows DIB layout): 2x2 RGB,
    bottom-up rows, BGR order, rows padded to 4 bytes — decode_image
    returns the exact pixel grid and the bmp_image encoder round-trips."""
    import numpy as np

    from zebra_spark.functions.multimodal import bmp_image, decode_image

    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [7, 8, 9]]],
        dtype=np.uint8,
    )
    # hand-derive: stride = (2*3+3)&~3 = 8; bottom row first; BGR
    row_bottom = bytes([255, 0, 0, 9, 8, 7]) + b"\x00\x00"
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    head = (
        b"BM"
        + (54 + 16).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little")
        + (2).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (16).to_bytes(4, "little")
        + b"\x00" * 16
    )
    payload = head + row_bottom + row_top
    np.testing.assert_array_equal(decode_image(payload), img)
    # encoder -> decoder fixed point (encoder writes the same layout)
    np.testing.assert_array_equal(decode_image(bmp_image(img)), img)
    # unsupported flavors refuse instead of misreading
    import pytest

    bad_bpp = bytearray(payload)
    bad_bpp[28] = 8
    with pytest.raises(NotImplementedError):
        decode_image(bytes(bad_bpp))
    with pytest.raises(ValueError):
        decode_image(payload[:-4])  # short body
    # corrupt pixel-array offset pointing into the headers must refuse,
    # not decode header bytes as pixels
    bad_off = bytearray(payload)
    bad_off[10:14] = (0).to_bytes(4, "little")
    with pytest.raises(NotImplementedError):
        decode_image(bytes(bad_off))


def test_resize_images_bmp(spark):
    """BMP payloads ride the SAME grouped gather as PPM/fake (stride +
    bottom-up flip + BGR folded into the index map) and come back as P6."""
    import numpy as np

    from zebra_spark.functions.multimodal import (
        bmp_image,
        decode_image,
        fake_image,
        ppm_image,
        resize_images,
    )

    rng = np.random.default_rng(7)
    imgs = {
        "b0": rng.integers(0, 256, (16, 12, 3), dtype=np.uint8),
        "b1": rng.integers(0, 256, (16, 12, 3), dtype=np.uint8),  # grp of 2
        "b2": rng.integers(0, 256, (9, 33, 3), dtype=np.uint8),
        "p0": rng.integers(0, 256, (16, 12, 3), dtype=np.uint8),  # same shape
    }
    rows = [
        ("b0", "image", bytearray(bmp_image(imgs["b0"])), None),
        ("b1", "image", bytearray(bmp_image(imgs["b1"])), None),
        ("b2", "image", bytearray(bmp_image(imgs["b2"])), None),
        ("p0", "image", bytearray(ppm_image(imgs["p0"])), None),
        ("f0", "image", bytearray(fake_image(3, 16, 16)), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<height:int,width:int,channels:int,duration_ms:int>",
    )
    out = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    for mid in ("b0", "b1", "b2", "p0"):
        src = imgs[mid]
        ys = (np.arange(8) * src.shape[0] // 8).astype(int)
        xs = (np.arange(8) * src.shape[1] // 8).astype(int)
        got = bytes(out[mid]["payload"])
        assert got.startswith(b"P6\n"), mid
        np.testing.assert_array_equal(
            decode_image(got), src[ys][:, xs], err_msg=mid
        )


def test_image_stats_all_formats(spark):
    """image_stats decodes PPM, BMP and the fake format to exact integer
    dimensions + per-channel sums; undecodable payloads emit null stats."""
    from zebra_spark.functions.multimodal import (
        bmp_image,
        image_stats,
        ppm_image,
    )

    rng = np.random.default_rng(7)
    img_a = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, size=(3, 9, 3), dtype=np.uint8)
    rows = [
        ("ppm", bytearray(ppm_image(img_a))),
        ("bmp", bytearray(bmp_image(img_b))),
        ("fake", bytearray(fake_image(11, 4, 4))),
        ("junk", bytearray(b"\x89PNG not decodable")),
    ]
    media = spark.createDataFrame(
        [(mid, "image", bytes(p), None) for mid, p in rows]
        + [("nullpay", "image", None, None)],
        "media_id string, kind string, payload binary, "
        "meta struct<height:int,width:int,channels:int,duration_ms:int>",
    )
    got = {r["media_id"]: r for r in image_stats(media).collect()}
    for mid, img in (("ppm", img_a), ("bmp", img_b)):
        r = got[mid]
        assert (r["height"], r["width"], r["channels"]) == img.shape
        want = img.reshape(-1, 3).sum(axis=0).tolist()
        assert r["channel_sums"] == want
    fk = got["fake"]
    assert (fk["height"], fk["width"], fk["channels"]) == (4, 4, 3)
    from zebra_spark.functions.multimodal import decode_image

    assert fk["channel_sums"] == (
        decode_image(fake_image(11, 4, 4)).reshape(-1, 3).sum(axis=0).tolist()
    )
    junk = got["junk"]
    assert junk["height"] is None and junk["channel_sums"] is None
    assert junk["n_bytes"] == len(rows[3][1])
    # NULL payload is distinguishable from a 0-byte payload
    np_row = got["nullpay"]
    assert np_row["n_bytes"] is None and np_row["height"] is None
