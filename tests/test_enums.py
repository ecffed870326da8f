"""Enum / sum-type column laws.

Mirrors the reference's enum striping semantics: ``fromVariant`` default
materialization (Striped.hs:512-528), tag arrays through the int codec
(``bTagArray``, Serial/Binary/Table.hs:151-159), and the bool/option/either
composites (Schema.hs:187-233) with their destructor laws
(Schema.hs:311-339).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zebra_spark.codec.blocks import decode_batch, encode_batch
from zebra_spark.functions.enums import (
    UNIT,
    bool_to_enum,
    either_to_enum,
    enum_schema,
    enum_to_bool,
    enum_to_either,
    enum_to_option,
    make_enum,
    option_to_enum,
    take_variant,
    validate_enum_tags,
)
from zebra_spark.operators.decode import decode_df
from zebra_spark.operators.encode import encode_df


def _enum_df(spark):
    base = spark.createDataFrame(
        [(i, f"s{i}", float(i) * 1.5, i % 3) for i in range(50)],
        "k long, s string, d double, tag int",
    )
    variants = [
        ("num", F.col("k") * 10, T.LongType()),
        ("txt", F.col("s"), T.StringType()),
        ("dbl", F.col("d"), T.DoubleType()),
    ]
    return base.select(
        "k", make_enum(F.col("tag"), variants).alias("e")
    )


def test_enum_defaults_materialized(spark):
    """fromVariant: unselected variant rows hold the variant DEFAULT value
    (Striped.hs:512-528) — not NULL."""
    df = _enum_df(spark)
    rows = {r["k"]: r["e"] for r in df.collect()}
    # k=1 -> tag 1 (txt selected); num/dbl carry defaults 0 / 0.0
    assert rows[1]["tag"] == 1
    assert rows[1]["v_txt"] == "s1"
    assert rows[1]["v_num"] == 0
    assert rows[1]["v_dbl"] == 0.0
    # k=0 -> tag 0 (num selected)
    assert rows[0]["v_num"] == 0
    assert rows[3]["v_num"] == 30
    assert rows[3]["v_txt"] == ""


def test_enum_schema_matches_make_enum(spark):
    df = _enum_df(spark)
    want = enum_schema(
        [("num", T.LongType()), ("txt", T.StringType()), ("dbl", T.DoubleType())]
    )
    got = df.schema["e"].dataType
    assert [f.name for f in got.fields] == [f.name for f in want.fields]
    assert [f.dataType for f in got.fields] == [f.dataType for f in want.fields]


def test_enum_block_roundtrip_bit_identical(spark):
    """Enum columns go through the block codec unchanged: tag array via the
    int codec (bTagArray parity), variants as materialized columns."""
    df = _enum_df(spark)
    rt = decode_df(encode_df(df, rows_per_block=16), schema=df.schema)
    assert df.exceptAll(rt).count() == 0 and rt.exceptAll(df).count() == 0


def test_enum_block_roundtrip_arrow_level():
    tags = pa.array([0, 1, 2, 1, 0], type=pa.int64())
    e = pa.StructArray.from_arrays(
        [
            tags,
            pa.array([1, 0, 0, 0, 9], type=pa.int64()),
            pa.array(["", "b", "", "d", ""], type=pa.string()),
            pa.array([0.0, 0.0, 3.5, 0.0, 0.0], type=pa.float64()),
        ],
        names=["tag", "v_num", "v_txt", "v_dbl"],
    )
    rb = pa.RecordBatch.from_arrays([e], names=["e"])
    payload, _ = encode_batch(rb)
    out = decode_batch(payload, rb.schema)
    assert out.equals(rb)


def test_take_variant_and_tag(spark):
    df = _enum_df(spark)
    out = df.select(
        "k",
        take_variant(F.col("e"), 1, "txt").alias("txt"),
        take_variant(F.col("e"), 0, "num").alias("num"),
    ).collect()
    for r in out:
        if r["k"] % 3 == 1:
            assert r["txt"] == f"s{r['k']}" and r["num"] is None
        elif r["k"] % 3 == 0:
            assert r["txt"] is None and r["num"] == r["k"] * 10
        else:
            assert r["txt"] is None and r["num"] is None


def test_validate_enum_tags_raises(spark):
    df = spark.createDataFrame([(5,)], "t long").select(
        make_enum(F.col("t"), [("x", F.lit(1), T.LongType())]).alias("e")
    )
    checked = validate_enum_tags(df, "e", n_variants=1)
    with pytest.raises(Exception):
        checked.collect()


def test_bool_option_either_composites(spark):
    """Destructor laws (Schema.hs:311-339): take(from(x)) == x."""
    df = spark.createDataFrame(
        [(1, True, "a", 10), (2, False, None, 20), (3, True, "c", None)],
        "k long, b boolean, opt string, num int",
    )
    out = df.select(
        "k",
        enum_to_bool(bool_to_enum(F.col("b"))).alias("b2"),
        enum_to_option(option_to_enum(F.col("opt"), T.StringType())).alias("opt2"),
        either_to_enum(
            F.col("num").isNull(),
            F.col("num"),
            F.coalesce(F.col("opt"), F.lit("?")),
            T.IntegerType(),
            T.StringType(),
        ).alias("eth"),
    )
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["b2"] is True and rows[2]["b2"] is False
    assert rows[1]["opt2"] == "a" and rows[2]["opt2"] is None
    left, right = enum_to_either(F.col("eth"))
    eo = {
        r["k"]: (r["l"], r["r"])
        for r in out.select("k", left.alias("l"), right.alias("r")).collect()
    }
    assert eo[1] == (10, None)
    assert eo[3] == (None, "c")


def test_option_enum_roundtrips_through_blocks(spark):
    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"v{i}") for i in range(40)],
        "k long, raw string",
    ).select("k", option_to_enum(F.col("raw"), T.StringType()).alias("o"))
    rt = decode_df(encode_df(df, rows_per_block=8), schema=df.schema)
    assert df.exceptAll(rt).count() == 0 and rt.exceptAll(df).count() == 0
    back = rt.select("k", enum_to_option(F.col("o")).alias("raw"))
    orig = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"v{i}") for i in range(40)],
        "k long, raw string",
    )
    assert back.exceptAll(orig).count() == 0 and orig.exceptAll(back).count() == 0
