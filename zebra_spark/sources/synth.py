"""Deterministic synthetic F1 table: (doc_id, tokens, n_tok, source).

FIXTURES.md F1: the primary input shape from BASELINE.json input_hint.
Generation is seeded and *distributed* — each Spark partition generates its
own rows from (seed, partition_id), so the same (n_rows, seed, parallelism)
always yields the same table regardless of cluster size, and generation
scales linearly with executors (no driver-side materialization).

Per-source token distributions intentionally differ (uniform vs Zipf vs
small-alphabet runs) so different blocks genuinely prefer different codecs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

VOCAB = 50_257
SOURCES = np.array(["web", "code", "books", "wiki", "forums"])
SOURCE_P = np.array([0.55, 0.20, 0.12, 0.08, 0.05])

F1_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

F1_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _gen_rows(start: int, n: int, seed: int) -> pa.RecordBatch:
    r = np.random.default_rng([seed, start])
    # sequence lengths: 80% short zipf-ish, 15% medium, 5% long (skew)
    bucket = r.choice(3, size=n, p=[0.80, 0.15, 0.05])
    n_tok = np.empty(n, dtype=np.int64)
    short = bucket == 0
    med = bucket == 1
    long_ = bucket == 2
    n_tok[short] = np.minimum(r.zipf(1.4, size=int(short.sum())), 512)
    n_tok[med] = r.integers(513, 2049, size=int(med.sum()))
    n_tok[long_] = r.integers(2049, 8193, size=int(long_.sum()))

    src_idx = r.choice(len(SOURCES), size=n, p=SOURCE_P)
    total = int(n_tok.sum())
    flat = np.empty(total, dtype=np.int32)
    offsets = np.concatenate(([0], np.cumsum(n_tok)))

    # per-source token models over the flat buffer (vectorized per source)
    row_src = np.repeat(src_idx, n_tok)
    for si, name in enumerate(SOURCES):
        m = row_src == si
        cnt = int(m.sum())
        if cnt == 0:
            continue
        if name == "web":  # zipf-ish natural text
            v = np.minimum(r.zipf(1.2, size=cnt) - 1, VOCAB - 1)
        elif name == "code":  # small alphabet with runs
            v = r.integers(0, 512, size=cnt)
        elif name == "books":
            v = np.minimum(r.zipf(1.35, size=cnt) - 1, VOCAB - 1)
        elif name == "wiki":
            v = r.integers(0, VOCAB, size=cnt)
        else:  # forums: bursty repeats
            base = r.integers(0, 2048, size=max(1, cnt // 8 + 1))
            v = np.repeat(base, 8)[:cnt]
        flat[m] = v.astype(np.int32)

    ids = np.arange(start, start + n)
    doc_id = pa.array(
        [f"{SOURCES[s]}-{i:010d}" for s, i in zip(src_idx, ids)], type=pa.string()
    )
    tokens = pa.LargeListArray.from_arrays(
        offsets.astype(np.int64), pa.array(flat, type=pa.int32())
    ).cast(pa.list_(pa.int32()))
    return pa.RecordBatch.from_arrays(
        [
            doc_id,
            tokens,
            pa.array(n_tok.astype(np.int32)),
            pa.array(SOURCES[src_idx], type=pa.string()),
        ],
        schema=F1_ARROW_SCHEMA,
    )


def f1_batch(n: int, seed: int = 42, start: int = 0) -> pa.RecordBatch:
    """Driver-side single batch (tests)."""
    return _gen_rows(start, n, seed)


def f1_table(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    partitions: int = 32,
    rows_per_batch: int = 1 << 14,
    exact_partitions: bool = False,
) -> DataFrame:
    """Distributed deterministic F1 table as a DataFrame.

    Determinism: row ``i`` depends only on (seed, floor(i / rows_per_batch)),
    not on ``partitions`` — identical data at any parallelism (the
    two-cluster-size scaling runs read identical input).

    ``exact_partitions``: slice the batch list into exactly ``partitions``
    contiguous equal runs (sc.parallelize) instead of repartition().
    repartition's RoundRobinPartitioning starts each INPUT partition at a
    random offset, so a small meta list lands multinomially (measured:
    64 batches over 32 partitions gave 1-5 batches per partition and 6
    empty ones) — fine for bulk data, fatal for a scaling-bench input
    whose task balance must be structural.
    """
    n_batches = (n_rows + rows_per_batch - 1) // rows_per_batch
    meta = [
        (b * rows_per_batch, min(rows_per_batch, n_rows - b * rows_per_batch))
        for b in range(n_batches)
    ]
    if exact_partitions:
        rdd = spark.sparkContext.parallelize(meta, min(partitions, len(meta)))
        mdf = spark.createDataFrame(rdd, "start long, n long")
    else:
        mdf = spark.createDataFrame(meta, "start long, n long").repartition(
            partitions
        )

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            starts = rb.column("start").to_pylist()
            ns = rb.column("n").to_pylist()
            for s, n in zip(starts, ns):
                yield _gen_rows(int(s), int(n), seed)

    return mdf.mapInArrow(gen, schema=F1_DDL)
