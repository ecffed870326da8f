"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: the exact baseline — a broadcast cross join
  with the query set (queries are small; the big side streams, no shuffle);
* LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; probes
  only join their bucket — the scale path (shuffle keyed by bucket id,
  candidate set ~ n/2^bits per probe instead of n).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast, pandas_udf


def _cosine_expr(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    ``queries``: (query_id, qvec).  Broadcast the queries — the corpus never
    shuffles, each task scores its partition and a single top-k-per-query
    aggregation follows (partial top-k map-side via window over small data).
    """
    joined = embeddings.crossJoin(broadcast(queries)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cosine_expr(F.col("qvec"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        joined.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )


def hyperplane_signatures(
    embeddings: DataFrame, dim: int, bits: int = 16, seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH signature per vector (vectorized numpy)."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, bits)).astype(np.float32)

    @pandas_udf("int")
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float32
        proj = mat @ planes  # (batch, bits)
        bitsm = (proj > 0).astype(np.uint32)
        codes = (bitsm << np.arange(bits, dtype=np.uint32)).sum(axis=1)
        return pd.Series(codes.astype(np.int32))

    return embeddings.withColumn("bucket", sig(F.col("embedding")))


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket."""
    corpus = hyperplane_signatures(embeddings, dim, bits)
    qsig = hyperplane_signatures(
        queries.withColumnRenamed("qvec", "embedding"), dim, bits
    ).withColumnRenamed("embedding", "qvec")
    joined = corpus.join(broadcast(qsig), on="bucket").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cosine_expr(F.col("qvec"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        joined.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )
