"""Text import/export parity: line-JSON round trip + import->encode pipeline.

Mirrors the reference CLI golden pipeline (import -> export identity,
zebra-cli/test/cli/import/t0*) at DataFrame level.
"""

from __future__ import annotations

import pytest

from zebra_spark.operators.decode import decode_df
from zebra_spark.operators.encode import encode_df
from zebra_spark.operators.textio import export_json, import_json


def test_json_roundtrip_with_stored_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", [1, 2]), (2, "b", []), (3, None, [5])],
        "k long, s string, arr array<int>",
    )
    path = str(tmp_path / "ztxt")
    export_json(df, path)
    back = import_json(spark, path)
    assert back.schema == df.schema
    assert df.exceptAll(back).count() == 0 and back.exceptAll(df).count() == 0


def test_import_requires_schema(spark, tmp_path):
    p = str(tmp_path / "nojson")
    spark.range(3).write.json(p)
    with pytest.raises(ValueError, match="explicit schema"):
        import_json(spark, p)


def test_import_then_encode_pipeline(spark, tmp_path):
    """The full `zebra import` pipeline: text -> rows -> striped blocks."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_ztxt")
    export_json(docs, path)
    rows = import_json(spark, path, schema=docs.schema)
    dec = decode_df(encode_df(rows, rows_per_block=256), schema=docs.schema)
    assert docs.exceptAll(dec).count() == 0 and dec.exceptAll(docs).count() == 0
