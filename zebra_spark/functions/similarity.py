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

    ``queries``: (query_id, qvec), small by contract (collected and shipped
    to every task).  Scale shape: each task scores only its own partition
    rows and keeps a LOCAL top-k per query, so the shuffle carries
    O(tasks * k * q) partial rows instead of the full n*q scored set; one
    tiny window then ranks the partials exactly.

    Bit-exactness: dot products and norms are sequential left-fold float64
    sums (np.cumsum), identical to ``F.aggregate`` folds and DuckDB's
    ``list_sum`` — so ranks match the SQL oracle exactly, ties broken by
    ascending neighbor_id.
    """
    import pyarrow as pa

    qrows = queries.select("query_id", "qvec").collect()
    q_ids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qvec"] for r in qrows], dtype=np.float64)  # (q, d)
    if qmat.size == 0:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, cos_sim double"
        )
    nq, dim = qmat.shape
    qnorm = np.sqrt(np.cumsum(qmat * qmat, axis=1)[:, -1])
    # chunk rows so the (rows, q, d) product tensor stays ~64 MB
    chunk_rows = max(64, (1 << 23) // max(1, nq * dim))

    def partial_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids_all = rb.column("vec_id").to_numpy(zero_copy_only=False)
            emb = rb.column("embedding")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            if flat.size != rb.num_rows * dim:
                raise ValueError("embedding dim mismatch vs queries")
            mat_all = flat.reshape(rb.num_rows, dim)
            out_q, out_n, out_c = [], [], []
            for s in range(0, rb.num_rows, chunk_rows):
                ids = ids_all[s : s + chunk_rows]
                mat = mat_all[s : s + chunk_rows]
                # sequential left-fold sums: bit-identical to SQL aggregate
                dots = np.cumsum(mat[:, None, :] * qmat[None, :, :], axis=2)[:, :, -1]
                enorm = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
                cos = dots / (enorm[:, None] * qnorm[None, :])
                cos[ids[:, None] == q_ids[None, :]] = -np.inf  # exclude self
                for qi in range(nq):
                    c = cos[:, qi]
                    order = np.lexsort((ids, -c))[:k]
                    keep = order[np.isfinite(c[order])]
                    out_q.append(np.full(len(keep), q_ids[qi], dtype=np.int64))
                    out_n.append(ids[keep].astype(np.int64))
                    out_c.append(c[keep])
            if out_q:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_q)),
                        pa.array(np.concatenate(out_n)),
                        pa.array(np.concatenate(out_c)),
                    ],
                    names=["query_id", "neighbor_id", "cos_sim"],
                )

    partials = embeddings.select("vec_id", "embedding").mapInArrow(
        partial_topk, schema="query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )


def _partition_local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Prune (query_id, neighbor_id, cos_sim) rows to each PARTITION's
    top-k per query before any shuffle: the same two-phase pattern
    brute_force_topk uses, applied to already-scored candidate rows.  State
    is bounded at O(queries * k) per task (re-pruned after every batch);
    the downstream exact window then ranks O(tasks * k * q) rows instead of
    every candidate.  Ties break by ascending neighbor_id, matching the
    final window ordering."""
    import pyarrow as pa

    def prune(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        qs = np.empty(0, np.int64)
        ns = np.empty(0, np.int64)
        cs = np.empty(0, np.float64)
        for rb in batches:
            qs = np.concatenate([qs, rb.column("query_id").to_numpy(zero_copy_only=False)])
            ns = np.concatenate([ns, rb.column("neighbor_id").to_numpy(zero_copy_only=False)])
            cs = np.concatenate([cs, rb.column("cos_sim").to_numpy(zero_copy_only=False)])
            # keep only the per-query top-k seen so far: sort by (query,
            # -cos, neighbor) and take the first k of each query run
            order = np.lexsort((ns, -cs, qs))
            qs, ns, cs = qs[order], ns[order], cs[order]
            starts = np.flatnonzero(np.concatenate(([True], qs[1:] != qs[:-1])))
            rank = np.arange(len(qs)) - np.repeat(starts, np.diff(np.concatenate((starts, [len(qs)]))))
            keep = rank < k
            qs, ns, cs = qs[keep], ns[keep], cs[keep]
        if len(qs):
            yield pa.RecordBatch.from_arrays(
                [pa.array(qs), pa.array(ns), pa.array(cs)],
                names=["query_id", "neighbor_id", "cos_sim"],
            )

    return scored.mapInArrow(
        prune, schema="query_id long, neighbor_id long, cos_sim double"
    )


def _bucket_pair_kernel(threshold: float):
    """Per-bucket all-pairs exact-cosine kernel (numpy, guide §4.2).

    Replaces the r6 within-bucket SELF-JOIN + per-row SQL ``_cosine_expr``:
    the join materialized every candidate pair as a row carrying BOTH full
    embedding arrays, and the interpreted higher-order fold then cost
    ~60 ops/element per pair — measured 121 s on the sf0.1 degenerate
    single-bucket driver query.  The kernel sees each bucket ONCE (m rows,
    not m^2 pair rows) and scores all pairs in blocked numpy at memory
    bandwidth (same query: 121 s -> ~4 s).

    Bit-exactness contract (the driver hashes against DuckDB):
    * every float32 element is widened to float64 BEFORE multiplying,
      exactly like ``_cosine_expr``'s per-element ``cast("double")``;
    * dots and norms are SEQUENTIAL left-fold sums via ``np.cumsum``
      (repo convention: cumsum == F.aggregate fold == DuckDB list_sum,
      bit-for-bit; np.dot's pairwise summation does NOT match);
    * ``cos >= threshold`` replicates Spark SQL comparison semantics where
      NaN is greater than any number (a zero-norm vector divides 0/0):
      NaN passes the filter, as it does in the SQL plan.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if m < 2:
            return empty
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        dim = E.shape[1]
        norms = np.sqrt(np.cumsum(E * E, axis=1)[:, -1])
        # block the (a, m, d) product tensor to ~64 MB, like brute_force_topk
        block = max(1, (1 << 23) // max(1, m * dim))
        out_a, out_b, out_c = [], [], []
        for s in range(0, m, block):
            A = E[s : s + block]
            prod = A[:, None, :] * E[None, :, :]
            dots = np.cumsum(prod, axis=2, out=prod)[:, :, -1]
            cos = dots / (norms[s : s + block, None] * norms[None, :])
            mask = ids[s : s + block, None] < ids[None, :]
            mask &= (cos >= threshold) | np.isnan(cos)
            ai, bj = np.nonzero(mask)
            if len(ai):
                out_a.append(ids[s + ai])
                out_b.append(ids[bj])
                out_c.append(cos[ai, bj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_c),
            }
        )

    return kernel


_PAIR_SCHEMA = "id_a long, id_b long, cos_sim double"


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    seed: int = 42,
    max_bucket: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale path).

    Shape mirrors MinHash LSH dedup: hyperplane signatures bucket the
    corpus, and each bucket is scored by the blocked numpy all-pairs
    kernel (r7; previously a within-bucket self-join whose pair rows each
    carried both embeddings — never the n^2 cross product either way).
    Hot buckets above ``max_bucket`` are dropped BEFORE grouping
    (quadratic/memory guard — a monster bucket never materializes in one
    task), singletons pruned.  Approximate by construction: pairs whose
    vectors land in different buckets are missed — raise ``bits``/probe
    count for recall, or use :func:`brute_force_topk` as the exact
    baseline.
    """
    corpus = hyperplane_signatures(embeddings, bits=bits, seed=seed).select(
        "vec_id", "embedding", "bucket"
    )
    counts = corpus.groupBy("bucket").agg(F.count("*").alias("n"))
    eligible = counts.filter((F.col("n") >= 2) & (F.col("n") <= max_bucket)).select(
        "bucket"
    )
    pruned = corpus.join(eligible, "bucket")
    pairs = pruned.groupBy("bucket").applyInPandas(
        _bucket_pair_kernel(threshold), schema=_PAIR_SCHEMA
    )
    return pairs.orderBy("id_a", "id_b")


def cosine_pairs_exact(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Exact all-pairs cosine filter — the oracle-checkable baseline for
    near-dup dedup; O(n^2), for bounded subsets / verification only.
    One degenerate bucket through the same blocked numpy kernel."""
    one = embeddings.select(
        "vec_id", "embedding", F.lit(0).alias("bucket")
    )
    pairs = one.groupBy("bucket").applyInPandas(
        _bucket_pair_kernel(threshold), schema=_PAIR_SCHEMA
    )
    return pairs.orderBy("id_a", "id_b")


def _lsh_planes(dim: int, bits: int, seed: int) -> np.ndarray:
    """Deterministic hyperplanes from (seed, dim, bits) — derivable inside
    every task, so no driver-side data peek is needed to learn the dim."""
    rng = np.random.default_rng(seed)
    return rng.normal(size=(dim, bits)).astype(np.float32)


def hyperplane_signatures(
    embeddings: DataFrame, dim: int | None = None, bits: int = 16, seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH signature per vector (vectorized numpy).

    ``dim`` is optional: each task derives the (identical) plane matrix from
    the seed and the batch's own vector width.
    """

    @pandas_udf("int")
    def sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float32
        planes = _lsh_planes(dim if dim is not None else mat.shape[1], bits, seed)
        proj = mat @ planes  # (batch, bits)
        bitsm = (proj > 0).astype(np.uint32)
        codes = (bitsm << np.arange(bits, dtype=np.uint32)).sum(axis=1)
        return pd.Series(codes.astype(np.int32))

    return embeddings.withColumn("bucket", sig(F.col("embedding")))


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 5,
    bits: int = 8,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket(s).

    ``multiprobe=1`` additionally probes every bucket at Hamming distance 1
    from the query signature (the standard multi-probe LSH recall fix: a
    vector whose projection is near a hyperplane lands one bit away).  The
    probe fan-out is query-side only — ``bits + 1`` probe rows per query,
    built with JVM xor, exploded, then one equi-join; each corpus vector
    lives in exactly one bucket so candidate pairs never duplicate.
    Candidates grow to ~(bits+1) * n / 2^bits per query — still a vanishing
    corpus fraction at scale.
    """
    corpus = hyperplane_signatures(embeddings, dim, bits)
    qsig = hyperplane_signatures(
        queries.withColumnRenamed("qvec", "embedding"), dim, bits
    ).withColumnRenamed("embedding", "qvec")
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(bits)],
        )
        qsig = qsig.withColumn("bucket", F.explode(probes))
    joined = corpus.join(broadcast(qsig), on="bucket").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cosine_expr(F.col("qvec"), F.col("embedding")).alias("cos_sim"),
    )
    # partition-local top-k BEFORE the ranking shuffle: the window sees
    # O(tasks * k * q) pruned rows, not every bucket candidate
    pruned = _partition_local_topk(
        joined.filter(F.col("query_id") != F.col("neighbor_id")), k
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )
