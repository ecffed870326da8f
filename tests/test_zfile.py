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
    from zebra_spark.operators.zschema import ENUM_META

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
                metadata={ENUM_META: [["none", True], ["some", False]]},
            )
        ]
    )
    data = write_zebra_stream(iter([rb]), schema)
    got_schema, table = read_zebra_stream(data)
    assert got_schema["opt"].metadata[ENUM_META] == [["none", True], ["some", False]]
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
