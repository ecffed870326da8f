"""Summary + consistency over the blocks table — `zebra summary` /
`zebra consistency` CLI parity.

Reference:
* summary (zebra-cli/src/Zebra/Command/Summary.hs:64-100+): streaming fold
  over blocks — block count, row count, max rows/block, first/last key.
* consistency (zebra-cli/src/Zebra/Command/Consistency.hs:77-125): checks
  inter-block key ordering — each block's minimum key must be greater than
  the previous block's maximum.

Spark expression: aggregations + a window lag over block metadata — tiny
data (one row per block), so fully driver-friendly regardless of table
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def blocks_summary(blocks: DataFrame) -> DataFrame:
    return blocks.groupBy().agg(
        F.count("*").alias("n_blocks"),
        F.sum("n_rows").alias("total_rows"),
        F.max("n_rows").alias("max_rows_per_block"),
        F.min("part_start").alias("first_key"),
        F.max("part_start").alias("last_key"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.sum("zebra_bytes").alias("zebra_bytes"),
        (F.sum("enc_bytes") / F.sum("raw_bytes")).alias("compression_ratio"),
    )


def consistency_check(
    blocks: DataFrame, key_min_col: str = "key_min", key_max_col: str = "key_max"
) -> DataFrame:
    """Rows that violate inter-block ordering (empty result == consistent).

    Expects blocks carrying per-block key ranges (encode_df(key_col=...)).

    Scale shape: block metadata is one row per block (~1.6M rows at 100 TB
    with 64 MB blocks), so a single global window would funnel everything
    into ONE task.  Instead: range-partition by (key_min, block_id), check
    adjacency with a PER-PARTITION window (each range bucket is its own
    window group — no single-task sort), then a boundary exchange compares
    each bucket's first block against the previous bucket's last block over
    the tiny one-row-per-partition frame.
    """
    kmin, kmax = F.col(key_min_col), F.col(key_max_col)
    ranged = blocks.repartitionByRange(kmin, F.col("block_id")).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("__pid").orderBy(key_min_col, "block_id")
    inner = (
        ranged.withColumn("__prev_max", F.lag(key_max_col).over(w_in))
        .filter(F.col("__prev_max").isNotNull() & (kmin <= F.col("__prev_max")))
        .select(
            "block_id",
            kmin.alias("block_min"),
            F.col("__prev_max").alias("previous_block_max"),
        )
    )
    # boundary exchange: one row per non-empty range bucket
    bounds = ranged.groupBy("__pid").agg(
        F.min(F.struct(kmin.alias("m"), F.col("block_id").alias("b"))).alias("first"),
        F.max_by(kmax, F.struct(kmin, F.col("block_id"))).alias("last_max"),
    )
    w_b = Window.orderBy("__pid")  # tiny: n_partitions rows
    boundary = (
        bounds.withColumn("__prev_last", F.lag("last_max").over(w_b))
        .filter(
            F.col("__prev_last").isNotNull()
            & (F.col("first.m") <= F.col("__prev_last"))
        )
        .select(
            F.col("first.b").alias("block_id"),
            F.col("first.m").alias("block_min"),
            F.col("__prev_last").alias("previous_block_max"),
        )
    )
    return inner.unionByName(boundary)


def binary_block_byte_counts(blocks: DataFrame) -> DataFrame:
    """Per-block byte counts for a Binary-table blocks frame — zebra's V3
    row count for a Binary table IS the byte count
    (Serial/Binary/Table.hs:38-44), so `zebra summary` parity needs bytes,
    not DataFrame rows.  One parallel pass, block-local."""
    import pyarrow as pa

    from ..codec.blocks import decode_batch
    from ..operators.decode import schema_map_of

    smap = schema_map_of(blocks)

    def run(batches):
        parsed: dict[str, pa.Schema] = {}
        for rb in batches:
            for i in range(rb.num_rows):
                sid = rb.column("schema_id")[i].as_py()
                schema = parsed.get(sid)
                if schema is None:
                    schema = pa.ipc.read_schema(pa.py_buffer(smap[sid]))
                    parsed[sid] = schema
                batch = decode_batch(rb.column("payload")[i].as_py(), schema)
                col = batch.column("value")
                n = pa.compute.sum(pa.compute.binary_length(col)).as_py() or 0
                yield pa.RecordBatch.from_pydict(
                    {
                        "block_id": [rb.column("block_id")[i].as_py()],
                        "n_bytes": [int(n)],
                    }
                )

    return blocks.select("block_id", "schema_id", "payload").mapInArrow(
        run, schema="block_id string, n_bytes long"
    )
