"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB):
* exact dedup is a hash groupBy — one shuffle on a 16-byte digest, the
  canonical map-side-combinable aggregation;
* MinHash/LSH avoids the O(n^2) pair join: signatures are computed
  vectorized per row batch, then candidates come from an equi-join on
  (band_id, band_hash) — Spark shuffles only bucket collisions;
* SimHash buckets by the 16-bit halves of a 64-bit signature (any pair
  within hamming distance d shares a half with probability >= 1 - d/4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
_MERSENNE = (1 << 61) - 1


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: digest, canonical doc_id, group size."""
    return (
        docs.groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .orderBy("digest")
    )


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of word k-shingles (vectorized-ish; called per row from a
    pandas UDF, the string slicing itself is cheap vs the join it avoids)."""
    words = text.lower().split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    # cheap stable 61-bit hash per shingle (FNV-ish over bytes, numpy-friendly)
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(14695981039346656037)
        for b in s.encode():
            h = np.uint64((int(h) ^ b) * 1099511628211 % (1 << 64))
        out[i] = np.uint64(int(h) % _MERSENNE)
    return out


def _minhash_sig(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """sig_j = min_i (a_j * h_i + b_j mod p): (n_hashes,) from (n_shingles,)."""
    if len(hashes) == 0:
        return np.zeros(len(a), dtype=np.int64)
    hv = (
        a[None, :].astype(object) * hashes[:, None].astype(object) + b[None, :]
    ) % _MERSENNE
    return np.min(hv, axis=0).astype(np.int64)


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    rng = np.random.default_rng(42)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: _minhash_sig(_shingle_hashes(t or ""), a, b).tolist()
        )

    return docs.select("doc_id", sig(F.col("text")).alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame, n_hashes: int = N_HASHES, n_bands: int = N_BANDS
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH on minhash signatures."""
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
    left = bands.alias("l")
    right = bands.alias("r")
    return (
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


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word unigrams (xxhash64 JVM-side, bit-vote agg
    done vectorized in a pandas UDF over the word-hash arrays)."""
    words = docs.select(
        "doc_id",
        F.expr(
            "transform(split(lower(text), '\\\\s+'), w -> xxhash64(w))"
        ).alias("whs"),
    )

    @pandas_udf("long")
    def sh(whs: pd.Series) -> pd.Series:
        def one(hs):
            if hs is None or len(hs) == 0:
                return 0
            arr = np.asarray(hs, dtype=np.int64).view(np.uint64)
            bits = (arr[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 > len(arr)
            return int(
                np.sum(votes.astype(np.uint64) << np.arange(64, dtype=np.uint64)).view(
                    np.int64
                )
            )

        return whs.map(one)

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
