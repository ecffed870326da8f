"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB):
* exact dedup is a hash groupBy — one shuffle on a 16-byte digest, the
  canonical map-side-combinable aggregation;
* MinHash/LSH avoids the O(n^2) pair join: shingle hashes are computed
  JVM-side (xxhash64 inside codegen), signatures vectorized in numpy per
  Arrow batch, and candidates come from an equi-join on (band, band_hash)
  — Spark shuffles only bucket collisions;
* SimHash folds word-hash bit votes per batch with np.add.at — no
  shuffle, no per-row Python loops.

The MinHash permutation family is multiply-add over wrapping uint64
(``sig_j = min_i (a_j * h_i + b_j mod 2^64)``, odd ``a_j``) — a standard
universal-hashing family that vectorizes exactly (no 128-bit modular
arithmetic needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: digest, canonical doc_id, group size."""
    return (
        docs.groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .orderBy("digest")
    )


def _shingle_hash_col(k: int):
    """JVM-side word k-shingle hashes: array<long> per document."""
    words = "split(lower(text), '\\\\s+')"
    return F.expr(
        f"transform(sequence(1, greatest(size({words}) - {k} + 1, 1)), "
        f"i -> xxhash64(array_join(slice({words}, i, {k}), ' ')))"
    )


def _minhash_params(n_hashes: int):
    rng = np.random.default_rng(42)
    a = (rng.integers(0, 2**63, size=n_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 2**63, size=n_hashes, dtype=np.uint64)
    return a, b


MAX_SHINGLES_PER_SLICE = 1 << 20  # bounds the (shingles, n_hashes) matrix


def _fold_signatures(
    hashes, a: np.ndarray, b: np.ndarray, max_slice: int
) -> np.ndarray:
    """Per-row minhash minima over a sequence of shingle-hash lists.

    Vectorized, but in bounded row-aligned slices: the temporary
    (shingles, n_hashes) matrix is capped at ~n_hashes * max_slice u64
    (~512 MB worst case at the defaults), independent of batch size — a
    batch of 10k long documents must not materialize multiple GB.
    """
    lens = np.array([0 if h is None else len(h) for h in hashes], dtype=np.int64)
    n_rows = len(hashes)
    out_arr = np.zeros((n_rows, len(a)), dtype=np.uint64)
    if n_rows == 0 or lens.sum() == 0:
        return out_arr
    flat = np.concatenate(
        [np.asarray(h, dtype=np.int64) for h in hashes if h is not None and len(h)]
    ).view(np.uint64)
    nz_rows = np.flatnonzero(lens > 0)
    nz_lens = lens[nz_rows]
    row_end = np.cumsum(nz_lens)
    row_start = row_end - nz_lens
    r = 0
    while r < len(nz_rows):
        # take rows until the slice holds ~max_slice shingles (>=1 row)
        e = int(np.searchsorted(row_end, row_start[r] + max_slice, side="left"))
        e = max(e, r + 1)
        sl = flat[row_start[r] : row_end[e - 1]]
        with np.errstate(over="ignore"):
            mat = a[None, :] * sl[:, None] + b[None, :]  # wrapping uint64
        starts = row_start[r:e] - row_start[r]
        mins = np.minimum.reduceat(mat, starts, axis=0)
        out_arr[nz_rows[r:e]] = mins
        r = e
    return out_arr


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES, k: int = 5) -> DataFrame:
    a, b = _minhash_params(n_hashes)

    @pandas_udf("array<long>")
    def sig(hashes: pd.Series) -> pd.Series:
        out_arr = _fold_signatures(hashes, a, b, MAX_SHINGLES_PER_SLICE)
        return pd.Series(out_arr.view(np.int64).tolist())

    return docs.select("doc_id", sig(_shingle_hash_col(k)).alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    max_bucket: int = 1024,
    with_metrics: bool = False,
):
    """Candidate near-duplicate pairs via banded LSH on minhash signatures.

    Hot-bucket guard: the band self-join is quadratic in bucket size, so one
    boilerplate mega-bucket (empty docs, shared headers) would be O(k^2) at
    corpus scale.  Buckets above ``max_bucket`` members are DROPPED before
    the join and counted — the MaximumRowSize discipline (Merge/Table.hs:
    157-163) applied to LSH.  Singleton buckets are pruned too (no pair can
    come out of them), which removes most of the join input.

    ``with_metrics=True`` additionally returns the dropped-bucket metrics
    frame (band, bh, n_docs).
    """
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(docs, n_hashes)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.slice("sig", i * rows_per_band + 1, rows_per_band),
            )
        ).alias("band", "band_sig"),
    ).select("doc_id", "band", F.hash("band_sig").alias("bh"))
    # materialize ONCE (r7): bands feeds the count pass and BOTH sides of
    # the candidate self-join — without this the minhash signature UDF
    # (the expensive stage) evaluated 3x.  Slim rows: (doc_id, band, bh).
    bands = bands.localCheckpoint()
    counts = bands.groupBy("band", "bh").agg(F.count("*").alias("n_docs"))
    eligible = counts.filter(
        (F.col("n_docs") >= 2) & (F.col("n_docs") <= max_bucket)
    ).select("band", "bh")
    pruned = bands.join(eligible, ["band", "bh"])
    left = pruned.alias("l")
    right = pruned.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
    if with_metrics:
        dropped = counts.filter(F.col("n_docs") > max_bucket)
        return pairs, dropped
    return pairs


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word unigrams.

    Word hashes come from JVM-side xxhash64; the bit-vote fold is one
    vectorized np.add.at per Arrow batch (no shuffle, no Python-per-row).
    """
    words = docs.select(
        "doc_id",
        F.expr(
            "transform(split(lower(text), '\\\\s+'), w -> xxhash64(w))"
        ).alias("whs"),
    )

    @pandas_udf("long")
    def sh(whs: pd.Series) -> pd.Series:
        lens = np.array([0 if h is None else len(h) for h in whs], dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(whs), dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in whs if h is not None and len(h)]
        ).view(np.uint64)
        row_idx = np.repeat(np.arange(len(whs)), lens)
        bits = (
            (flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        votes = np.zeros((len(whs), 64), dtype=np.int64)
        np.add.at(votes, row_idx, bits)
        majority = (votes * 2 > lens[:, None]).astype(np.uint64)
        sig = np.zeros(len(whs), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(64):
                sig |= majority[:, i] << np.uint64(i)
        return pd.Series(sig.view(np.int64))

    return words.select("doc_id", sh("whs").alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard similarity for LSH candidate pairs (verify stage)."""
    grams = docs.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(size(split(lower(text),'\\\\s+'))-{n},0)),"
                f" i -> array_join(slice(split(lower(text),'\\\\s+'), i+1, {n}), ' '))"
            )
        ).alias("grams"),
    )
    cands = minhash_lsh_candidates(docs)
    a = grams.alias("a")
    b = grams.alias("b")
    joined = (
        cands.join(a, cands.doc_a == F.col("a.doc_id"))
        .join(b, cands.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("a.grams", "b.grams")).cast("double")
                / F.size(F.array_union("a.grams", "b.grams")).cast("double")
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold).orderBy("doc_a", "doc_b")


def dup_clusters(
    pairs: DataFrame,
    vertices: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    vertex_col: str = "vec_id",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs: (vertex, cluster) where
    cluster = min vertex id reachable through the pair graph.

    The step a training pipeline actually needs after candidate pairs:
    pick ONE keeper per duplicate CLUSTER (pairs alone over-delete when
    a~b, b~c but a!~c).  Min-label propagation (HashToMin): every round
    each vertex takes the min of its own label and its neighbors' labels —
    one broadcast-free equi-join + groupBy per round, converging in
    O(graph diameter) rounds, which for near-dup graphs is tiny (dup
    clusters are dense blobs).  Lineage is truncated per round with
    localCheckpoint so the plan does not grow with iterations; rounds are
    driver-bounded by ``max_iters`` and stop early at fixpoint.

    Vertices absent from ``pairs`` form singleton clusters (cluster = own
    id).  Exactly SQL-expressible (recursive CTE), so driver-verified.
    """
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(vertex_col).alias("u"), F.col(vertex_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.withColumnRenamed("u", "v"), on="v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry a per-row `changed` flag instead of re-joining old labels:
        # the (eager) localCheckpoint is the ONE job per round, and the
        # fixpoint test is an early-exit isEmpty scan over the checkpointed
        # rows — no extra join, no full count job
        new_labels = (
            labels.join(nbr_min, on="u", how="left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "changed"
                ),
            )
            .localCheckpoint()
        )
        done = new_labels.filter(F.col("changed")).isEmpty()
        labels = new_labels.drop("changed")
        if done:
            break
    return labels.select(
        F.col("u").alias(vertex_col), F.col("label").alias("cluster")
    )


def minhash_lsh_md5(docs: DataFrame, k: int = 5) -> DataFrame:
    """Engine-portable minhash+LSH: md5-derived shingle hashes, 4 hashes in
    2 bands of 2 -> banded candidate pairs (doc_a, doc_b).

    This is the VERIFICATION configuration of minhash LSH: every step is
    reproducible in ANSI SQL (character-k-gram substrings, 56-bit ints from
    the md5 hex prefix, min fold per salted hash, band-equality equi-join),
    so the driver's DuckDB oracle checks signatures AND band buckets
    exactly.  The production path stays minhash_signatures /
    minhash_lsh_candidates (xxhash64 shingles, bounded matrix fold,
    hot-bucket caps) — same algorithm, faster hash.

    All JVM codegen (md5/substr/transform/array_min) — no UDF, and each
    band candidate join is an equi-join.
    """
    sh = (
        f"transform(sequence(1, greatest(length(text)-{k - 1}, 1)),"
        f" i -> substr(text, i, {k}))"
    )

    def sig(j: int):
        return F.expr(
            f"array_min(transform({sh}, s -> "
            f"CAST(conv(substr(md5(concat('h{j}:', s)), 1, 14), 16, 10) AS BIGINT)))"
        ).alias(f"s{j}")

    # materialize the signatures ONCE (r7): the two band self-joins below
    # evaluate both sides, so without the checkpoint the md5-per-shingle
    # signature pass ran 4x (measured 23.3 s -> ~2 s on the sf0.1 driver
    # query together with the caller's repartition).  Tiny table: one row
    # of 5 longs per doc.
    sigs = docs.select("doc_id", sig(0), sig(1), sig(2), sig(3)).localCheckpoint()

    def band_pairs(cols: list[str]) -> DataFrame:
        l, r = sigs.alias("l"), sigs.alias("r")
        cond = F.col("l.doc_id") < F.col("r.doc_id")
        for c in cols:
            cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
        return l.join(r, cond).select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )

    return (
        band_pairs(["s0", "s1"])
        .union(band_pairs(["s2", "s3"]))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_enumerated(
    docs: DataFrame, n: int = 4, max_doc_id: int = 40, threshold: float = 0.05
) -> DataFrame:
    """Exact character-n-gram Jaccard over an ENUMERATED candidate set (all
    doc pairs below ``max_doc_id``) — the oracle-able configuration of the
    Jaccard verify stage: substring shingles (no regex dialect risk),
    set-intersection counts, one double division per row (bit-exact across
    engines).  Production verification runs the same math over LSH
    candidates (ngram_jaccard_pairs)."""
    grams = docs.filter(F.col("doc_id") < max_doc_id).select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(length(text)-{n - 1}, 1)),"
                f" i -> substr(text, i, {n}))"
            )
        ).alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    inter = F.size(F.array_intersect("a.g", "b.g"))
    union = F.size("a.g") + F.size("b.g") - inter
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def simhash_md5(docs: DataFrame, bits: int = 16, k: int = 4) -> DataFrame:
    """Engine-portable SimHash (verification config): md5-derived 56-bit
    shingle hashes, per-bit majority votes folded JVM-side into a
    ``bits``-wide signature.  Every step is ANSI-SQL-reproducible
    (substr shingles, md5 hex prefix ints, +-1 vote fold per bit, strict
    >0 majority), so the driver oracle checks signatures exactly.  The
    production path stays :func:`simhash` (xxhash64 words, one vectorized
    np.add.at bit fold)."""
    hs = (
        f"transform(transform(sequence(1, greatest(length(text)-{k - 1}, 1)),"
        f" i -> substr(text, i, {k})),"
        f" s -> CAST(conv(substr(md5(s), 1, 14), 16, 10) AS BIGINT))"
    )
    tagged = docs.select("doc_id", F.expr(hs).alias("hs"))
    bit_terms = [
        f"IF(aggregate(hs, 0L, (acc, h) -> acc + IF((shiftright(h, {b}) & 1) = 1, 1L, -1L)) > 0, {1 << b}L, 0L)"
        for b in range(bits)
    ]
    return tagged.select(
        "doc_id", F.expr(" + ".join(bit_terms)).alias("simhash16")
    ).orderBy("doc_id")
