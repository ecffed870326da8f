"""Line-JSON text import/export — `zebra import` / `zebra export` parity.

Reference: zebra's ".ztxt" text format is line-delimited JSON rows with a
separate schema file (zebra-core/src/Zebra/Serial/Text/Logical.hs:92-181;
CLI pipelines zebra-cli/src/Zebra/Command/{Import,Export}.hs).  The Spark
expression is exactly `spark.read.json` with an explicit schema (never
inferred — zebra requires the .zschema) and `df.write.json`, plus the
schema persisted alongside as JSON (our ".zschema" analogue is the
pyspark StructType json).

Import composes with the encoder: text -> rows -> striped blocks, i.e.
the whole `zebra import` pipeline (Import.hs:63-76).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def export_json(df: DataFrame, path: str) -> None:
    """Write rows as line-JSON + the schema as <path>/_schema.json and as a
    zebra-format <path>/_schema.zschema (Serial/Text/Schema.hs envelope)."""
    from .zschema import to_zschema

    df.write.mode("overwrite").json(path)
    with open(os.path.join(path, "_schema.json"), "w") as f:
        f.write(df.schema.json())
    with open(os.path.join(path, "_schema.zschema"), "w") as f:
        f.write(to_zschema(df.schema))


def import_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """Read line-JSON with an explicit schema (from _schema.json if present).

    Like zebra, refuses to guess: either a schema argument or a stored
    _schema.json is required — silent inference can change types between
    runs, which would break the bit-identical contract downstream.
    """
    if schema is None:
        schema_file = os.path.join(path, "_schema.json")
        zschema_file = os.path.join(path, "_schema.zschema")
        if os.path.exists(schema_file):
            with open(schema_file) as f:
                schema = T.StructType.fromJson(json.load(f))
        elif os.path.exists(zschema_file):
            from .zschema import from_zschema

            with open(zschema_file) as f:
                schema = from_zschema(f.read())
        else:
            raise ValueError(
                f"no schema given and neither {schema_file} nor "
                f"{zschema_file} found; zebra-style text import requires an "
                "explicit schema"
            )
    elif isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    return spark.read.schema(schema).json(path)
