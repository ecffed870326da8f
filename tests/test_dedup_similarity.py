"""Semantic tests for dedup + similarity operators on crafted corpora."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zebra_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from zebra_spark.functions.similarity import brute_force_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light"
    )
    near = base.replace("afternoon", "evening")
    other = (
        "completely different content about distributed columnar storage "
        "engines compressing token arrays with bit packing and dictionaries"
    )
    rows = [
        ("a1", base),
        ("a2", base),  # exact dup of a1
        ("a3", near),  # near dup of a1
        ("b1", other),
        ("b2", "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_dedup_groups(corpus):
    groups = {r["keeper"]: r["n_copies"] for r in exact_dedup(corpus).collect()}
    assert groups["a1"] == 2  # a1+a2 identical
    assert groups["a3"] == 1 and groups["b1"] == 1


def test_minhash_finds_near_dups(corpus):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(corpus).collect()}
    assert ("a1", "a2") in pairs  # identical -> all bands collide
    assert ("a1", "a3") in pairs or ("a2", "a3") in pairs  # near-dup
    assert ("a1", "b1") not in pairs


def test_ngram_jaccard_scores(corpus):
    rows = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, threshold=0.0).collect()
    }
    assert rows[("a1", "a2")] == 1.0
    near = rows.get(("a1", "a3"), rows.get(("a2", "a3")))
    assert near is not None and 0.5 < near < 1.0


def _hamming(x: int, y: int) -> int:
    return bin((x ^ y) & ((1 << 64) - 1)).count("1")


def test_simhash_distance(corpus):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    assert sh["a1"] == sh["a2"]
    assert _hamming(sh["a1"], sh["a3"]) < 12
    assert _hamming(sh["a1"], sh["b1"]) > _hamming(sh["a1"], sh["a3"])


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(0)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
    # vec 100 = near-copy of vec 0
    rows.append((100, [float(x) for x in base[0] + 0.01], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_finds_planted_neighbor(embeddings):
    queries = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    top = brute_force_topk(embeddings, queries, k=3).collect()
    assert top[0]["neighbor_id"] == 100 and top[0]["rank"] == 1
    assert top[0]["cos_sim"] > 0.999


def test_lsh_ann_recall_on_planted_neighbor(embeddings):
    queries = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = lsh_ann_topk(embeddings, queries, dim=16, k=3, bits=4).collect()
    # planted near-copy lands in the same hyperplane bucket
    assert any(r["neighbor_id"] == 100 for r in res)


def test_lsh_multiprobe_improves_recall(spark):
    """Hamming-1 multiprobe must recover at least the single-bucket recall,
    and strictly more pairs when neighbors straddle a hyperplane."""
    from zebra_spark.functions.similarity import brute_force_topk, lsh_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in lsh_ann_topk(emb, queries, k=5, bits=4, multiprobe=0).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in lsh_ann_topk(emb, queries, k=5, bits=4, multiprobe=1).collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.3  # 5 probes of 16 buckets on 500 vectors


def test_lsh_hot_bucket_cap_drops_and_records(spark):
    """A boilerplate mega-bucket (many identical docs) must not explode the
    band self-join: buckets above the cap are dropped and counted."""
    from zebra_spark.functions.dedup import minhash_lsh_candidates

    rows = [(f"dup-{i:04d}", "same boilerplate text repeated everywhere") for i in range(300)]
    rows += [(f"uni-{i}", f"unique document number {i} with words {i * 7}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs, dropped = minhash_lsh_candidates(docs, max_bucket=64, with_metrics=True)
    d = dropped.collect()
    assert len(d) > 0 and all(r["n_docs"] == 300 for r in d)
    # no pair from the mega-bucket survives; join stays tiny
    assert pairs.filter(F.col("doc_a").startswith("dup")).count() == 0


def test_lsh_cap_keeps_small_buckets(spark):
    from zebra_spark.functions.dedup import minhash_lsh_candidates

    rows = [("a", "the quick brown fox jumps over the lazy dog today"),
            ("b", "the quick brown fox jumps over the lazy dog today"),
            ("c", "完全 different content that shares nothing at all here")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = minhash_lsh_candidates(docs, max_bucket=64)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert ("a", "b") in got


def test_minhash_sliced_equals_whole():
    """Bounded-slice signature fold must equal the single-shot fold."""
    from zebra_spark.functions.dedup import _fold_signatures, _minhash_params

    rng = np.random.default_rng(7)
    hashes = [rng.integers(-(2**62), 2**62, size=rng.integers(0, 300)).tolist()
              for _ in range(40)]
    hashes[3] = None
    hashes[9] = []
    a, b = _minhash_params(64)
    whole = _fold_signatures(hashes, a, b, max_slice=1 << 20)
    sliced = _fold_signatures(hashes, a, b, max_slice=17)
    assert (whole == sliced).all()


def test_dup_clusters_transitive(spark):
    """a~b, b~c (but not a~c) must land in ONE cluster labeled min(id);
    chain graphs converge within the iteration bound; singletons keep
    their own id."""
    from zebra_spark.functions.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 6), (4, 5)], "id_a long, id_b long"
    )
    vertices = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 6, 10, 11, 99]], "vec_id long"
    )
    got = {r.vec_id: r.cluster for r in dup_clusters(pairs, vertices).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 10: 10, 11: 10, 99: 99}
    # long chain: diameter > 1 still converges (label walks the chain)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20, 30)], "id_a long, id_b long"
    )
    cv = spark.createDataFrame([(i,) for i in range(20, 31)], "vec_id long")
    got2 = {r.vec_id: r.cluster for r in dup_clusters(chain, cv).collect()}
    assert set(got2.values()) == {20} and len(got2) == 11


def test_cosine_near_dup_pairs_finds_planted(spark):
    """LSH-bucketed embedding near-dup: planted near-identical vectors land
    in the same bucket and survive the exact-cosine verify."""
    from zebra_spark.functions.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(50, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(50)]
    rows += [(100 + i, (base[i] * 1.0001).tolist()) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_near_dup_pairs(emb, threshold=0.9999, bits=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(i, 100 + i) for i in range(5)}
    assert planted <= got
