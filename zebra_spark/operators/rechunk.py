"""Rechunk: re-block an encoded dataset at a different rows-per-block.

Reference: ``Striped.rechunk`` (zebra-core/src/Zebra/Table/Striped.hs:
999-1038; CLI default 256 rows/block, zebra-cli/main/zebra.hs:224-232) —
a stream of striped tables re-cut to a fixed row count, preserving the
concatenation of rows.

Spark expression: decode blocks -> re-encode at the new block size, all
inside the workers (one mapInArrow pipeline, no shuffle, no driver data).
Used operationally to compact many small blocks (e.g. from streaming
micro-batches) into scan-efficient large ones, or split oversized blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .decode import decode_df
from .encode import encode_df


def rechunk_blocks(
    blocks: DataFrame,
    rows_per_block: int,
    schema=None,
    coalesce_partitions: int | None = None,
    key_col: str | None = None,
    key_bloom: bool = False,
) -> DataFrame:
    """Re-encode a blocks table at ``rows_per_block``.

    ``coalesce_partitions``: optionally reduce task count first so small
    blocks from many tasks merge into full-size blocks (rechunk-compact).

    ``key_col``/``key_bloom``: re-emit the read-path skip structures
    (zone maps / Bloom filters) on the compacted blocks — at 100 TB a
    compaction that silently drops them turns every later keyed read
    into a full scan.
    """
    decoded = decode_df(blocks, schema=schema)
    if coalesce_partitions is not None:
        decoded = decoded.coalesce(coalesce_partitions)
    return encode_df(
        decoded,
        rows_per_block=rows_per_block,
        key_col=key_col,
        key_bloom=key_bloom,
    )
