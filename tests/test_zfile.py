"""zebra V3 binary file container laws: magic/header golden bytes, block
framing, epoch re-basing, enum striping, whole-file round-trips
(Header.hs:44-86, Block.hs:119-131, Table.hs:28-149)."""

from __future__ import annotations

import datetime as dt
import json

import numpy as np
import pyarrow as pa
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zebra_spark.codec.bytecodec import unpack_sized_byte_array
from zebra_spark.operators.zfile import (
    MAGIC_V3,
    read_zebra_files,
    read_zebra_stream,
    write_zebra_files,
    write_zebra_stream,
)


def _batch():
    return pa.RecordBatch.from_pydict(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "name": pa.array(["a", "bb", ""], pa.string()),
            "score": pa.array([1.5, -2.25, 0.0], pa.float64()),
            "flag": pa.array([True, False, True]),
            "tags": pa.array([[1, 2], [], [3]], pa.list_(pa.int32())),
        }
    )


def _schema():
    return T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.IntegerType())),
        ]
    )


def test_magic_and_header_layout():
    data = write_zebra_stream(iter([_batch()]), _schema())
    assert data[:16] == MAGIC_V3 == b"||ZEBRA||00003||"
    # header_v3 = SchemaV1 JSON as sized_byte_array (Header.hs:73-86)
    header, pos = unpack_sized_byte_array(memoryview(data), 16)
    js = json.loads(header.decode())
    assert "array" in js and "element" in js["array"]
    # block framing: u32 row count right after the header (Block.hs:119-125)
    n = int(np.frombuffer(data[pos : pos + 4], dtype="<u4")[0])
    assert n == 3


def test_stream_roundtrip():
    data = write_zebra_stream(iter([_batch(), _batch()]), _schema())
    schema, table = read_zebra_stream(data)
    assert [f.name for f in schema.fields] == ["k", "name", "score", "flag", "tags"]
    assert table.num_rows == 6
    assert table.column("k").to_pylist() == [1, 2, 3, 1, 2, 3]
    assert table.column("name").to_pylist() == ["a", "bb", "", "a", "bb", ""]
    assert table.column("score").to_pylist() == [1.5, -2.25, 0.0] * 2
    assert table.column("flag").to_pylist() == [True, False, True] * 2
    assert table.column("tags").to_pylist() == [[1, 2], [], [3]] * 2


def test_temporal_rebase_to_1600_epoch():
    rb = pa.RecordBatch.from_pydict(
        {
            "d": pa.array([dt.date(1970, 1, 1), dt.date(1600, 3, 1)], pa.date32()),
            "ts": pa.array(
                [dt.datetime(1970, 1, 1), dt.datetime(1970, 1, 2)], pa.timestamp("us")
            ),
        }
    )
    schema = T.StructType(
        [T.StructField("d", T.DateType()), T.StructField("ts", T.TimestampType())]
    )
    data = write_zebra_stream(iter([rb]), schema)
    # stored ints count from 1600-03-01: 1970-01-01 -> 135080, 1600-03-01 -> 0
    from zebra_spark.codec.intcodec import unpack_int_array

    _, pos = unpack_sized_byte_array(memoryview(data), 16)
    vals, _ = unpack_int_array(memoryview(data), 2, pos + 4)
    assert list(vals) == [135080, 0]
    _, table = read_zebra_stream(data)
    assert table.column("d").to_pylist() == [dt.date(1970, 1, 1), dt.date(1600, 3, 1)]
    assert table.column("ts").to_pylist() == [
        dt.datetime(1970, 1, 1),
        dt.datetime(1970, 1, 2),
    ]


def test_enum_striping_in_file():
    from zebra_spark.operators.zschema import ENUM_META, enum_layout, enum_layout_meta

    e = pa.StructArray.from_arrays(
        [
            pa.array([0, 1, 1], pa.int64()),
            pa.array(["", "x", "y"], pa.string()),
        ],
        names=["tag", "v_some"],
    )
    rb = pa.RecordBatch.from_arrays([e], names=["opt"])
    schema = T.StructType(
        [
            T.StructField(
                "opt",
                T.StructType(
                    [
                        T.StructField("tag", T.LongType(), False),
                        T.StructField("v_some", T.StringType()),
                    ]
                ),
                metadata={ENUM_META: enum_layout_meta([["none", True], ["some", False]])},
            )
        ]
    )
    data = write_zebra_stream(iter([rb]), schema)
    got_schema, table = read_zebra_stream(data)
    assert enum_layout(got_schema["opt"].metadata[ENUM_META]) == [["none", True], ["some", False]]
    assert table.column("opt").to_pylist() == [
        {"tag": 0, "v_some": ""},
        {"tag": 1, "v_some": "x"},
        {"tag": 1, "v_some": "y"},
    ]


def test_nulls_rejected():
    rb = pa.RecordBatch.from_pydict({"k": pa.array([1, None], pa.int64())})
    schema = T.StructType([T.StructField("k", T.LongType())])
    with pytest.raises(ValueError, match="no nulls"):
        write_zebra_stream(iter([rb]), schema)


def test_invalid_utf8_rejected_on_read():
    # write as BINARY, re-read claiming utf8 -> the decode must refuse
    rb = pa.RecordBatch.from_pydict({"b": pa.array([b"\xff\xfe"], pa.binary())})
    schema = T.StructType([T.StructField("b", T.BinaryType())])
    data = write_zebra_stream(iter([rb]), schema)
    # patch the header's encoding to utf8 (same body bytes)
    header, pos = unpack_sized_byte_array(memoryview(data), 16)
    js = json.loads(header.decode())
    js["array"]["element"]["struct"]["fields"][0]["schema"]["binary"][
        "encoding"
    ] = {"utf8": {}}
    from zebra_spark.codec.bytecodec import pack_sized_byte_array

    patched = MAGIC_V3 + pack_sized_byte_array(json.dumps(js).encode()) + data[pos:]
    with pytest.raises(pa.ArrowInvalid):
        read_zebra_stream(patched)


def test_spark_zebra_file_roundtrip(spark, tmp_path):
    df = spark.range(0, 500, 1, 3).selectExpr(
        "id AS k",
        "concat('n', id) AS name",
        "CAST(id AS DOUBLE) / 7 AS score",
        "id % 2 = 0 AS flag",
        "array(CAST(id AS INT), CAST(id + 1 AS INT)) AS tags",
    )
    out = str(tmp_path / "zfiles")
    manifest = write_zebra_files(df, out, rows_per_block=128).collect()
    assert sum(r["n_rows"] for r in manifest) == 500
    back = read_zebra_files(spark, [r["path"] for r in manifest])
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_map_keys_sorted_and_dups_rejected():
    """zebra maps are strictly-ascending, duplicate-free per row
    (Striped.hs:572-591); Spark maps carry no ordering, so the writer must
    sort entries by key and refuse duplicates."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ])
    rb = pa.RecordBatch.from_pydict(
        {
            "k": pa.array([1, 2], pa.int64()),
            "m": pa.array(
                [[("z", 1), ("a", 2)], [("b", 3)]],
                pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    _, table = read_zebra_stream(write_zebra_stream(iter([rb]), schema))
    assert table.column("m").to_pylist() == [
        [("a", 2), ("z", 1)],
        [("b", 3)],
    ]
    dup = pa.RecordBatch.from_pydict(
        {
            "k": pa.array([1], pa.int64()),
            "m": pa.array(
                [[("a", 1), ("a", 2)]], pa.map_(pa.string(), pa.int64())
            ),
        }
    )
    with pytest.raises(ValueError, match="StripedMapDuplicateKeys"):
        write_zebra_stream(iter([dup]), schema)


def test_streaming_read_memory_bounded(tmp_path):
    """Peak reader memory is one block + chunk, independent of file size
    (the r2 whole-file read is gone)."""
    import io

    from zebra_spark.operators.zfile import open_zebra_stream

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("s", T.StringType())])
    batches = [
        pa.RecordBatch.from_pydict(
            {"k": pa.array(list(range(i * 500, (i + 1) * 500)), pa.int64()),
             "s": pa.array([f"row-{j}" * 8 for j in range(500)], pa.string())}
        )
        for i in range(100)
    ]
    path = tmp_path / "big.zebra"
    with open(path, "wb") as f:
        n = write_zebra_stream(iter(batches), schema, fileobj=f)
    assert n == path.stat().st_size and n > 400_000
    with open(path, "rb") as f:
        _, blocks, rd = open_zebra_stream(f, chunk_bytes=4096)
        total = sum(b.num_rows for b in blocks)
    assert total == 50_000
    # one block here is ~6-8 KB encoded; buffer must stay near block+chunk,
    # far below the full file size
    assert rd.max_buffered < 64 << 10, rd.max_buffered
    # bytes-mode write identical to streamed write
    data = write_zebra_stream(iter(batches), schema)
    assert data == path.read_bytes()


def test_binary_table_roundtrip():
    """Top-level Binary table: rows are BYTES (u32 row count IS the byte
    count, Serial/Binary/Table.hs:38-44)."""
    from zebra_spark.operators.zschema import BINARY_TABLE_META

    schema = T.StructType([
        T.StructField("value", T.StringType(), False, {BINARY_TABLE_META: True})
    ])
    text = "zebra is a typed data format.\nBinary tables are raw bytes.\n"
    rb = pa.RecordBatch.from_pydict({"value": pa.array([text], pa.string())})
    data = write_zebra_stream(iter([rb]), schema)
    # header declares a binary table with utf8 encoding
    header, pos = unpack_sized_byte_array(memoryview(data), 16)
    js = json.loads(header.decode())
    assert js == {"binary": {"default": {"allow": {}}, "encoding": {"utf8": {}}}}
    # block: u32 row count == byte count
    n = int(np.frombuffer(data[pos : pos + 4], dtype="<u4")[0])
    assert n == len(text.encode())
    got_schema, table = read_zebra_stream(data)
    assert (got_schema.fields[0].metadata or {}).get(BINARY_TABLE_META)
    assert table.column("value").to_pylist() == [text]


def test_map_table_roundtrip_and_order_enforced():
    """Top-level Map table: key column + value column walk, strictly
    ascending dup-free keys (Serial/Binary/Table.hs:46-64)."""
    from zebra_spark.operators.zschema import MAP_TABLE_META

    schema = T.StructType([
        T.StructField("key", T.LongType(), False, {MAP_TABLE_META: True}),
        T.StructField("value", T.StringType()),
    ])
    rb = pa.RecordBatch.from_pydict(
        {"key": pa.array([1, 5, 9], pa.int64()),
         "value": pa.array(["a", "b", "c"], pa.string())}
    )
    data = write_zebra_stream(iter([rb]), schema)
    header, _ = unpack_sized_byte_array(memoryview(data), 16)
    assert "map" in json.loads(header.decode())
    got_schema, table = read_zebra_stream(data)
    assert (got_schema.fields[0].metadata or {}).get(MAP_TABLE_META)
    assert table.column("key").to_pylist() == [1, 5, 9]
    assert table.column("value").to_pylist() == ["a", "b", "c"]
    bad = pa.RecordBatch.from_pydict(
        {"key": pa.array([5, 1], pa.int64()), "value": pa.array(["a", "b"])}
    )
    with pytest.raises(ValueError, match="StripedMapNotSorted"):
        write_zebra_stream(iter([bad]), schema)
    dup = pa.RecordBatch.from_pydict(
        {"key": pa.array([3, 3], pa.int64()), "value": pa.array(["a", "b"])}
    )
    with pytest.raises(ValueError, match="StripedMapDuplicateKeys"):
        write_zebra_stream(iter([dup]), schema)


def test_seconds_milliseconds_time_writes():
    """int+time seconds/milliseconds columns (zebra-epoch counts carried as
    LongType + zebra.encoding metadata) write headers declaring the exact
    interval and roundtrip unchanged (Encoding.hs:57-63)."""
    from zebra_spark.operators.zschema import ENCODING_META

    schema = T.StructType([
        T.StructField("t_s", T.LongType(), False,
                      {ENCODING_META: "time_seconds"}),
        T.StructField("t_ms", T.LongType(), False,
                      {ENCODING_META: "time_milliseconds"}),
    ])
    rb = pa.RecordBatch.from_pydict(
        {"t_s": pa.array([0, 13154186096], pa.int64()),
         "t_ms": pa.array([0, 13154186096789], pa.int64())}
    )
    data = write_zebra_stream(iter([rb]), schema)
    header, _ = unpack_sized_byte_array(memoryview(data), 16)
    js = json.loads(header.decode())
    fields = js["array"]["element"]["struct"]["fields"]
    assert fields[0]["schema"]["int"]["encoding"] == {
        "time": {"interval": {"seconds": {}}}}
    assert fields[1]["schema"]["int"]["encoding"] == {
        "time": {"interval": {"milliseconds": {}}}}
    got_schema, table = read_zebra_stream(data)
    assert got_schema["t_s"].metadata[ENCODING_META] == "time_seconds"
    assert table.column("t_s").to_pylist() == [0, 13154186096]
    assert table.column("t_ms").to_pylist() == [0, 13154186096789]


def test_corrupt_block_fails_fast_bounded(tmp_path):
    """r3 ADVICE regression: a CORRUPT (not truncated) block must fail
    fast with a bounded buffer instead of slurping the whole remainder of
    the file into memory before raising."""
    from zebra_spark.operators.zfile import open_zebra_stream

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("s", T.StringType())])
    batches = [
        pa.RecordBatch.from_pydict(
            {"k": pa.array(list(range(i * 500, (i + 1) * 500)), pa.int64()),
             "s": pa.array([f"row-{j}" * 8 for j in range(500)], pa.string())}
        )
        for i in range(50)
    ]
    path = tmp_path / "corrupt.zebra"
    with open(path, "wb") as f:
        write_zebra_stream(iter(batches), schema, fileobj=f)
    data = bytearray(path.read_bytes())
    # corrupt an early block's row count to an absurd value: every retry
    # parse keeps failing no matter how much data arrives
    data[2000:2004] = (0x7FFFFFFF).to_bytes(4, "little")
    path.write_bytes(bytes(data))
    cap = 1 << 16
    with open(path, "rb") as f:
        _, blocks, rd = open_zebra_stream(f, chunk_bytes=4096)
        rd.max_block = cap
        with pytest.raises(ValueError, match="corrupt input"):
            for b in blocks:
                pass
    # buffer never grew past cap + one chunk refill
    assert rd.max_buffered <= cap + 8192, rd.max_buffered


def test_map_table_key_range_block_skipping(spark, tmp_path):
    """r6: open_zebra_stream/read_zebra_files(key_range=...) skip map-table
    blocks whose ascending key interval misses the range — only the key
    column of skipped blocks decodes; value sections (string + array +
    double here, exercising the _skip_column recursion) are hopped via
    their size headers.  Stream alignment is implicitly proven: a wrong
    skip offset would corrupt every subsequent block parse."""
    import io

    from zebra_spark.operators.zfile import open_zebra_stream
    from zebra_spark.operators.zschema import MAP_TABLE_META

    schema = T.StructType([
        T.StructField("key", T.LongType(), False, {MAP_TABLE_META: True}),
        T.StructField("value", T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("xs", T.ArrayType(T.IntegerType())),
            T.StructField("score", T.DoubleType()),
            T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
        ])),
    ])

    def block(b):
        ks = list(range(10 * b, 10 * b + 10))
        return pa.RecordBatch.from_pydict({
            "key": pa.array(ks, pa.int64()),
            "value": pa.array(
                [{"name": f"n{k}", "xs": list(range(k % 4)), "score": k / 2,
                  "m": {f"a{k}": k, f"b{k}": k + 1}}
                 for k in ks],
                pa.struct([("name", pa.string()),
                           ("xs", pa.list_(pa.int32())),
                           ("score", pa.float64()),
                           ("m", pa.map_(pa.string(), pa.int32()))]),
            ),
        })

    data = write_zebra_stream(iter([block(b) for b in range(5)]), schema)

    def ranged(kr):
        _, blocks, _ = open_zebra_stream(io.BytesIO(data), key_range=kr)
        got = list(blocks)
        return pa.Table.from_batches(got) if got else None

    mid = ranged((23, 31))  # intersects blocks 2 and 3 only
    assert mid.num_rows == 20
    assert sorted(mid.column("key").to_pylist()) == list(range(20, 40))
    assert mid.column("value").to_pylist()[0]["name"] == "n20"
    head = ranged((None, 5))
    assert head.num_rows == 10 and max(head.column("key").to_pylist()) == 9
    tail = ranged((41, None))
    assert tail.num_rows == 10
    assert ranged((200, 300)) is None  # nothing intersects

    # Spark-level: write files, ranged read == exact filter after residual
    sdf = spark.createDataFrame(
        [
            (int(k), (f"n{k}", list(range(k % 4)), k / 2, {f"a{k}": k}))
            for k in range(50)
        ],
        schema,
    ).repartitionByRange(2, "key").sortWithinPartitions("key")
    out_dir = str(tmp_path / "zmap")
    write_zebra_files(sdf, out_dir, rows_per_block=10).collect()
    import glob

    paths = sorted(glob.glob(out_dir + "/*.zebra"))
    full = read_zebra_files(spark, paths)

    def norm(df):  # set-ops reject map columns: entries-normalize first
        return df.select(
            "key",
            F.col("value.name").alias("name"),
            F.col("value.xs").alias("xs"),
            F.col("value.score").alias("score"),
            F.array_sort(F.map_entries("value.m")).alias("m"),
        )

    got = norm(
        read_zebra_files(spark, paths, key_range=(23, 31)).filter(
            F.col("key").between(23, 31)
        )
    )
    want = norm(full.filter(F.col("key").between(23, 31)))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    n_ranged = read_zebra_files(spark, paths, key_range=(23, 31)).count()
    assert got.count() <= n_ranged < full.count()  # blocks actually skipped

    # non-map tables reject key_range; non-scalar keys reject too
    from zebra_spark.operators.zschema import BINARY_TABLE_META

    bschema = T.StructType(
        [T.StructField("value", T.BinaryType(), False, {BINARY_TABLE_META: True})]
    )
    bdata = write_zebra_stream(
        iter([pa.RecordBatch.from_pydict({"value": pa.array([b"xy"], pa.binary())})]),
        bschema,
    )
    with pytest.raises(ValueError, match="map tables"):
        open_zebra_stream(io.BytesIO(bdata), key_range=(1, 2))
    # bound/key type mismatch fails fast with a clear error — driver-side
    # for read_zebra_files, stream-open-time for open_zebra_stream (NOT
    # inside the block parse, where _StreamReader would treat the
    # ValueError as a truncation signal and buffer the whole file)
    with pytest.raises(ValueError, match="does not match"):
        open_zebra_stream(io.BytesIO(data), key_range=("a", "b"))
    with pytest.raises(ValueError, match="does not match"):
        read_zebra_files(spark, paths, key_range=("a", None))


# --- property: _skip_column stays wire-aligned for every supported type ----

from hypothesis import given, settings
from hypothesis import strategies as hst


def _value_dtype(depth: int):
    scalars = hst.sampled_from(["long", "double", "bool", "string"])
    if depth == 0:
        return scalars
    sub = _value_dtype(depth - 1)
    return hst.one_of(
        scalars,
        hst.tuples(hst.just("array"), sub),
        hst.tuples(hst.just("map"), sub),
        hst.lists(sub, min_size=1, max_size=3).map(lambda fs: ("struct", fs)),
    )


def _build_value(spec, n, rng):
    """(spark dtype, pa array of n rows) for a random value spec."""
    if spec == "long":
        return T.LongType(), pa.array(
            rng.integers(-(10**6), 10**6, n), pa.int64()
        )
    if spec == "double":
        return T.DoubleType(), pa.array(rng.normal(size=n), pa.float64())
    if spec == "bool":
        return T.BooleanType(), pa.array(rng.integers(0, 2, n) != 0)
    if spec == "string":
        return T.StringType(), pa.array(
            [f"s{v}" * (v % 3) for v in rng.integers(0, 50, n)], pa.string()
        )
    kind = spec[0]
    if kind == "array":
        lens = rng.integers(0, 4, n)
        et, child = _build_value(spec[1], int(lens.sum()), rng)
        offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        arr = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), child)
        return T.ArrayType(et), arr.cast(pa.list_(child.type))
    if kind == "map":
        lens = rng.integers(0, 3, n)
        total = int(lens.sum())
        vt, vals = _build_value(spec[1], total, rng)
        # per-row ascending dup-free keys (zebra map invariant)
        keys = pa.array(
            [f"k{j}" for L in lens for j in range(int(L))], pa.string()
        )
        offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        arr = pa.MapArray.from_arrays(pa.array(offs, pa.int32()), keys, vals)
        return T.MapType(T.StringType(), vt), arr
    # struct
    fields, children, names = [], [], []
    for i, sub in enumerate(spec[1]):
        st_, ch = _build_value(sub, n, rng)
        fields.append(T.StructField(f"f{i}", st_))
        children.append(ch)
        names.append(f"f{i}")
    return T.StructType(fields), pa.StructArray.from_arrays(children, names=names)


@given(spec=_value_dtype(2), seed=hst.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_skip_column_alignment_property(spec, seed):
    """For ANY supported value schema, a ranged read that skips blocks 0
    and 2 must return exactly block 1's rows — a single wrong skip offset
    would corrupt the next block's parse or change the rows."""
    import io

    from zebra_spark.operators.zfile import open_zebra_stream
    from zebra_spark.operators.zschema import MAP_TABLE_META

    rng = np.random.default_rng(seed)
    vt, _probe = _build_value(spec, 1, rng)
    schema = T.StructType([
        T.StructField("key", T.LongType(), False, {MAP_TABLE_META: True}),
        T.StructField("value", vt),
    ])
    blocks = []
    for b in range(3):
        _, vals = _build_value(spec, 10, rng)
        blocks.append(
            pa.RecordBatch.from_arrays(
                [pa.array(list(range(10 * b, 10 * b + 10)), pa.int64()), vals],
                names=["key", "value"],
            )
        )
    data = write_zebra_stream(iter(blocks), schema)
    _, full, _ = open_zebra_stream(io.BytesIO(data))
    want = list(full)[1]
    _, ranged, _ = open_zebra_stream(io.BytesIO(data), key_range=(12, 18))
    got = list(ranged)
    assert len(got) == 1
    assert got[0].equals(want)
