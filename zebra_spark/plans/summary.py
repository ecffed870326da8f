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
    """
    w = Window.orderBy(key_min_col, "block_id")
    lagged = blocks.withColumn("__prev_max", F.lag(key_max_col).over(w))
    return lagged.filter(
        F.col("__prev_max").isNotNull()
        & (F.col(key_min_col) <= F.col("__prev_max"))
    ).select(
        "block_id",
        F.col(key_min_col).alias("block_min"),
        F.col("__prev_max").alias("previous_block_max"),
    )
