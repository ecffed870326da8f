"""`.zschema` JSON schema interop laws (Serial/Text/Schema.hs TextV0
envelope wrapping Json/Schema.hs SchemaV1)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import types as T

from zebra_spark.operators.merge import DEFAULT_META, REVERSED_META
from zebra_spark.operators.zschema import (
    ENCODING_META,
    ENUM_META,
    MAP_TABLE_META,
    from_zschema,
    struct_to_zschema,
    to_zschema,
    zschema_to_struct,
)

# an option-enum + utf8 table in zebra's own format (modeled on the V1
# encoding rules at Json/Schema.hs:220-504; single-key variant objects,
# absent default = deny)
OPTION_TABLE = """
{
  "version": "v0",
  "schema": {
    "array": {
      "element": {
        "struct": {
          "fields": [
            {
              "name": "score",
              "schema": {
                "enum": {
                  "variants": [
                    { "name": "none", "schema": { "unit": {} } },
                    { "name": "some", "schema": { "int": {} } }
                  ]
                }
              }
            },
            {
              "name": "entity_id",
              "schema": { "binary": { "encoding": { "utf8": {} } } }
            },
            {
              "name": "when",
              "schema": {
                "int": {
                  "default": { "allow": {} },
                  "encoding": { "time": { "interval": { "seconds": {} } } }
                }
              }
            }
          ]
        }
      }
    }
  }
}
"""


def test_parse_option_enum_table():
    schema = from_zschema(OPTION_TABLE)
    assert [f.name for f in schema.fields] == ["score", "entity_id", "when"]
    score = schema["score"]
    assert isinstance(score.dataType, T.StructType)
    assert [f.name for f in score.dataType.fields] == ["tag", "v_some"]
    from zebra_spark.operators.zschema import enum_layout
    assert enum_layout(score.metadata[ENUM_META]) == [["none", True], ["some", False]]
    assert score.metadata[DEFAULT_META] == "deny"
    assert isinstance(schema["entity_id"].dataType, T.StringType)
    assert schema["when"].metadata[ENCODING_META] == "time_seconds"
    assert schema["when"].metadata[DEFAULT_META] == "allow"


def test_zschema_roundtrip_exact():
    """zschema -> spark -> zschema reproduces the same JSON structure."""
    original = json.loads(OPTION_TABLE)["schema"]
    back = struct_to_zschema(zschema_to_struct(original))
    assert back == original


def test_map_table_roundtrip():
    src = {
        "map": {
            "key": {
                "struct": {
                    "fields": [
                        {"name": "entity_hash", "schema": {"int": {}}},
                        {
                            "name": "entity_id",
                            "schema": {"binary": {"encoding": {"utf8": {}}}},
                        },
                    ]
                }
            },
            "value": {"double": {"default": {"allow": {}}}},
        }
    }
    schema = zschema_to_struct(src)
    assert [f.name for f in schema.fields] == ["key", "value"]
    assert schema["key"].metadata[MAP_TABLE_META] is True
    assert struct_to_zschema(schema) == src


def test_reversed_column_roundtrip():
    src = {
        "array": {
            "element": {
                "struct": {
                    "fields": [
                        {"name": "time", "schema": {"int": {}}},
                        {"name": "factset_id", "schema": {"reversed": {"int": {}}}},
                    ]
                }
            }
        }
    }
    schema = zschema_to_struct(src)
    assert schema["factset_id"].metadata[REVERSED_META] is True
    assert struct_to_zschema(schema) == src


def test_spark_schema_to_zschema_and_back():
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("props", T.MapType(T.StringType(), T.LongType())),
            T.StructField(
                "inner",
                T.StructType(
                    [
                        T.StructField("a", T.LongType()),
                        T.StructField("b", T.DoubleType()),
                    ]
                ),
            ),
        ]
    )
    js = struct_to_zschema(schema)
    back = zschema_to_struct(js)
    # booleans pass through zebra's bool-enum convention and come back
    # as booleans (canonical identification, Schema.hs:187-196)
    el = js["array"]["element"]["struct"]["fields"]
    assert el[4]["schema"]["enum"]["variants"][0]["name"] == "false"
    assert isinstance(back["flag"].dataType, T.BooleanType)
    assert [f.name for f in back.fields] == [f.name for f in schema.fields]
    assert isinstance(back["tags"].dataType, T.ArrayType)
    assert isinstance(back["props"].dataType, T.MapType)
    # second hop is a fixed point
    assert struct_to_zschema(back) == js


def test_temporal_types_map_to_encodings():
    schema = T.StructType(
        [
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    js = struct_to_zschema(schema)
    el = js["array"]["element"]["struct"]["fields"]
    assert el[0]["schema"]["int"]["encoding"] == {"date": {}}
    assert el[1]["schema"]["int"]["encoding"] == {
        "time": {"interval": {"microseconds": {}}}
    }


def test_unknown_version_rejected():
    with pytest.raises(ValueError, match="version"):
        from_zschema('{"version": "v9", "schema": {"binary": {}}}')


def test_standalone_unit_rejected():
    src = {
        "array": {
            "element": {
                "struct": {"fields": [{"name": "u", "schema": {"unit": {}}}]}
            }
        }
    }
    with pytest.raises(NotImplementedError, match="unit"):
        zschema_to_struct(src)


def test_textio_zschema_sidecar(spark, tmp_path):
    from zebra_spark.operators.textio import export_json, import_json

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", 3.5)], "k long, s string, x double"
    )
    path = str(tmp_path / "ztxt")
    export_json(df, path)
    import os
    os.remove(os.path.join(path, "_schema.json"))  # force the zschema path
    back = import_json(spark, path)
    assert back.schema["k"].dataType == T.LongType()
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
