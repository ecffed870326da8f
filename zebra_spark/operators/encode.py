"""Distributed encode: DataFrame -> blocks DataFrame via mapInArrow.

The Spark analogue of zebra's encode lifecycle (`zebra import`,
zebra-cli/src/Zebra/Command/Import.hs:63-76): instead of a single-process
stream of striped blocks written to one file, every Spark task turns its
Arrow batches into encoded block *rows* of a blocks table.  Catalyst plans
the scan and shuffle; the codec runs entirely inside the Arrow UDF
(vectorized numpy — no per-row Python), exactly as zebra's codec lives
inside C behind FFI.

Scale design (100 TB / 1000 executors):
* one block row per Arrow batch chunk — tasks stream, nothing accumulates;
* optional salting repartition spreads source-key and length skew before
  encoding (north rule: explicit skew handling);
* block rows carry everything needed to decode (schema + payload + crc),
  so downstream decode/merge/verify are embarrassingly parallel;
* per-block codec metrics emit with the data: the lineage/metrics table is
  a projection of the blocks table, no second pass.
"""

from __future__ import annotations

import json
import uuid
import zlib
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from ..codec.blocks import encode_batch
from ..codec.warmup import warm_codec

BLOCKS_DDL = (
    "block_id string, part_start string, key_min string, key_max string, "
    "n_rows long, payload binary, "
    "schema binary, meta string, raw_bytes long, enc_bytes long, "
    "zebra_bytes long, crc32 long"
)

_OUT_SCHEMA = pa.schema(
    [
        ("block_id", pa.string()),
        ("part_start", pa.string()),
        ("key_min", pa.string()),
        ("key_max", pa.string()),
        ("n_rows", pa.int64()),
        ("payload", pa.binary()),
        ("schema", pa.binary()),
        ("meta", pa.string()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("zebra_bytes", pa.int64()),
        ("crc32", pa.int64()),
    ]
)


def _encode_fn(rows_per_block: int, key_col: str | None = None):
    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        warm_codec()
        task_id = uuid.uuid4().hex[:12]
        seq = 0
        for rb in batches:
            schema_bytes = rb.schema.serialize().to_pybytes()
            for off in range(0, rb.num_rows, rows_per_block):
                chunk = rb.slice(off, min(rows_per_block, rb.num_rows - off))
                if chunk.num_rows == 0:
                    continue
                payload, meta = encode_batch(chunk)
                first_key = (
                    str(chunk.column(0)[0].as_py()) if chunk.num_rows else ""
                )
                key_min = key_max = None
                if key_col is not None and chunk.num_rows:
                    mm = pa.compute.min_max(chunk.column(key_col))
                    key_min = str(mm["min"].as_py())
                    key_max = str(mm["max"].as_py())
                yield pa.RecordBatch.from_pydict(
                    {
                        "block_id": [f"{task_id}-{seq:08d}"],
                        "part_start": [first_key],
                        "key_min": [key_min],
                        "key_max": [key_max],
                        "n_rows": [chunk.num_rows],
                        "payload": [payload],
                        "schema": [schema_bytes],
                        "meta": [json.dumps(meta)],
                        "raw_bytes": [meta["raw_bytes"]],
                        "enc_bytes": [meta["enc_bytes"]],
                        "zebra_bytes": [meta["zebra_bytes"]],
                        "crc32": [zlib.crc32(payload)],
                    },
                    schema=_OUT_SCHEMA,
                )
                seq += 1

    return encode


def encode_df(
    df: DataFrame,
    rows_per_block: int = 1 << 16,
    salt_col: str | None = None,
    salt_buckets: int = 0,
    key_col: str | None = None,
) -> DataFrame:
    """Encode ``df`` into a blocks DataFrame.

    ``salt_col``/``salt_buckets``: repartition on (salt_col, random-ish salt)
    before encoding so a skewed key (e.g. source="web" at 55%) spreads over
    many tasks instead of one straggler.  The salt is derived from a stable
    hash of all columns, not rand(), so encode output is deterministic.
    """
    if salt_col is not None and salt_buckets > 0:
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
        df = df.repartition(F.col(salt_col), salt)
    return df.mapInArrow(_encode_fn(rows_per_block, key_col), schema=BLOCKS_DDL)


def codec_metrics(blocks: DataFrame) -> DataFrame:
    """Per-partition lineage / codec-choice metrics (north rule requirement)."""
    return blocks.select(
        F.col("block_id"),
        F.col("n_rows"),
        F.col("raw_bytes"),
        F.col("enc_bytes"),
        F.col("zebra_bytes"),
        F.from_json(
            F.col("meta"), "cols map<string, struct<codec:string, n:long, bytes:long, zebra_bytes:long>>"
        ).alias("m"),
    ).select(
        "block_id",
        "n_rows",
        "raw_bytes",
        "enc_bytes",
        "zebra_bytes",
        F.explode("m.cols").alias("column", "stats"),
    )
