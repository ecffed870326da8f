"""Direct-read parquet encode: distribute row-group splits, read in-worker.

``encode_df`` (operators/encode.py) pipes rows JVM -> Arrow -> Python; that
double hop costs a full serialization of the input.  For the pure encode
job — where Python reads, encodes, and emits only small block rows — the
idiomatic high-throughput layout is to ship *splits* (file, row-group), not
rows: each task opens its split with pyarrow (local FS here; HDFS/S3
filesystems on a cluster) and streams batches straight into the codec.
This is exactly how Spark's own DataSourceV2 readers, and zebra's 1 MiB
chunked file streaming (zebra-core/src/Zebra/Serial/Binary/File.hs:104-126),
keep the scan on the worker.

Row-group granularity gives free partition pruning and deterministic
output independent of parallelism (split list is sorted).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from ..operators.encode import BLOCKS_DDL, encode_chunk_rows


def list_row_groups(path: str) -> list[tuple[str, int]]:
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    splits: list[tuple[str, int]] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        splits.extend((f, rg) for rg in range(md.num_row_groups))
    return splits


def encode_parquet_direct(
    spark: SparkSession,
    path: str,
    rows_per_block: int = 1 << 16,
    max_block_values: int = 1 << 22,
    columns: list[str] | None = None,
) -> DataFrame:
    """Encode a parquet dataset without the JVM->Python row hop.

    Returns the same blocks DataFrame as ``encode_df``.
    """
    splits = list_row_groups(path)
    # group splits into ~4 tasks per core instead of one task per row
    # group: each task streams several splits (the generator below already
    # iterates its batch), so per-task scheduling overhead amortizes —
    # measured 26 row groups on local[1]: 26 tasks cost ~2.8 s of pure
    # scheduling against 1.8 s of compute.  4x parallelism keeps elastic
    # balance against variable split sizes; on a large cluster
    # splits >> 4*cores and every core still gets a steady queue.
    n_tasks = max(1, min(len(splits), 4 * spark.sparkContext.defaultParallelism))
    sdf = spark.createDataFrame(splits, "path string, row_group int").repartition(
        n_tasks
    )

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..codec.warmup import warm_codec

        warm_codec()
        for rb in batches:
            paths = rb.column("path").to_pylist()
            rgs = rb.column("row_group").to_pylist()
            for p, rg in zip(paths, rgs):
                pf = pq.ParquetFile(p)
                table = pf.read_row_group(rg, columns=columns)
                # one state per row group: block_id seq stays unique across
                # chunks and the schema bytes ship once per row group
                state = {"seq": 0}
                for chunk in table.to_batches(max_chunksize=rows_per_block):
                    yield from encode_chunk_rows(
                        chunk, task_tag=f"{os.path.basename(p)}:{rg}",
                        max_block_values=max_block_values, _state=state,
                    )

    return sdf.mapInArrow(gen, schema=BLOCKS_DDL)
