"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for embedding similarity next to hyperplane LSH
(similarity.py): a small spherical k-means codebook partitions the corpus
into `n_clusters` lists; a query scores only the lists of its `nprobe`
nearest centroids.  Candidate volume is ~ n * nprobe / n_clusters instead
of n, and the candidate join is a plain equi-join on cluster_id — the
shape that survives 100 TB (shuffle keyed by cluster, no cross product).

Scale design notes:
* training never moves the corpus: each task folds its partition into
  (cluster, count, sum_vec) partials, so the per-iteration traffic is
  O(tasks * k * dim) — independent of row count;
* the codebook (k x dim floats) is broadcast via UDF closure, never joined;
* probe fan-out is explode(query -> nprobe cluster ids) + equi-join, so a
  hot list degrades one task, not the job (cap lists like LSH if needed);
* determinism: centroid sums accumulate float32-rounded unit vectors in
  float64, which is exact (order-independent) below ~2^29 rows/cluster —
  the codebook, and therefore every assignment, is bit-reproducible on the
  same input regardless of partitioning or scheduling.

With ``nprobe == n_clusters`` the probe covers every list and the result
is EXACTLY brute-force top-k (same cosine fold, same tie-break) — that
configuration is hash-verified against the SQL oracle by the driver; the
approximate setting is checked by a recall bound in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast, pandas_udf

from .similarity import _cosine_expr


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return mat / norms


def kmeans_codebook(
    embeddings: DataFrame,
    n_clusters: int = 16,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train a spherical k-means codebook; returns (n_clusters, dim) float64.

    Seeds are the `n_clusters` vectors with the smallest xxhash64(id, seed)
    — deterministic, data-independent of layout, and a cheap TakeOrdered
    (no full sort materialized).  Each Lloyd iteration is one scan emitting
    per-partition (cluster, count, sum_vec) partials; the driver combines
    them in sorted order so the codebook is bit-stable.
    """
    import pyarrow as pa

    seed_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(n_clusters)
        .collect()
    )
    cents = _normalize(np.array([r[vec_col] for r in seed_rows], dtype=np.float64))
    k, dim = cents.shape

    out_schema = "cluster long, n long, sums array<double>"

    for _ in range(iters):
        c = cents  # bind current codebook into the closure

        def partials(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            acc_n = np.zeros(k, dtype=np.int64)
            acc_s = np.zeros((k, dim), dtype=np.float64)
            for rb in batches:
                flat = (
                    rb.column(vec_col)
                    .flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                )
                mat = _normalize(flat.reshape(rb.num_rows, dim))
                assign = (mat @ c.T).argmax(axis=1)
                acc_n += np.bincount(assign, minlength=k)
                # accumulate float32-rounded unit vectors: every addend has
                # a 24-bit mantissa and |v| <= 1, so float64 accumulation is
                # EXACT (no rounding) for < 2^29 rows per cluster — the sum
                # is therefore independent of row order AND partitioning
                np.add.at(acc_s, assign, mat.astype(np.float32).astype(np.float64))
            nz = np.flatnonzero(acc_n)
            if len(nz):
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(nz.astype(np.int64)),
                        pa.array(acc_n[nz]),
                        pa.array(list(acc_s[nz])),
                    ],
                    names=["cluster", "n", "sums"],
                )

        rows = (
            embeddings.select(vec_col)
            .mapInArrow(partials, schema=out_schema)
            .collect()
        )
        # fixed combine order -> bit-stable centroids
        rows.sort(key=lambda r: (r["cluster"], r["n"], r["sums"][0]))
        total_n = np.zeros(k, dtype=np.int64)
        total_s = np.zeros((k, dim), dtype=np.float64)
        for r in rows:
            total_n[r["cluster"]] += r["n"]
            total_s[r["cluster"]] += np.asarray(r["sums"], dtype=np.float64)
        live = total_n > 0
        cents = cents.copy()
        cents[live] = total_s[live] / total_n[live, None]
        cents = _normalize(cents)
    return cents


def ivf_assign(
    embeddings: DataFrame,
    codebook: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Attach the nearest-centroid list id (vectorized argmax dot)."""
    cb = np.ascontiguousarray(codebook, dtype=np.float64)

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = _normalize(np.stack(vecs.to_numpy()).astype(np.float64))
        return pd.Series((mat @ cb.T).argmax(axis=1).astype(np.int32))

    return embeddings.withColumn(out_col, nearest(F.col(vec_col)))


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    seed: int = 42,
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF probing.

    ``queries``: (query_id, qvec), small by contract.  Scoring uses the
    same sequential-fold cosine + (desc sim, asc id) tie-break as
    brute_force_topk, so with ``nprobe >= n_clusters`` the output is
    bit-identical to the exact baseline.
    """
    if codebook is None:
        codebook = kmeans_codebook(
            embeddings, n_clusters=n_clusters, iters=iters, seed=seed
        )
    nprobe = min(nprobe, len(codebook))
    corpus = ivf_assign(embeddings, codebook)

    cb = np.ascontiguousarray(codebook, dtype=np.float64)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = _normalize(np.stack(vecs.to_numpy()).astype(np.float64))
        sims = mat @ cb.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    qprobe = queries.withColumn("cluster_id", F.explode(probes(F.col("qvec"))))
    joined = corpus.join(broadcast(qprobe), on="cluster_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cosine_expr(F.col("qvec"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        joined.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )
