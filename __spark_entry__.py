"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full encode→decode round-trip of the documents
table through the striped block codec (bit-identical law).
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline operators).  ``oracle_sql()`` — DuckDB equivalents;
omitted for ops whose semantics are not SQL-expressible (codec internals,
LSH heuristics) → driver records rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _roundtrip(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from zebra_spark.operators.decode import decode_df
    from zebra_spark.operators.encode import encode_df

    df = _load(spark, sf_dir, name)
    return decode_df(encode_df(df, rows_per_block=1 << 16), schema=df.schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode+decode round-trip at sf0.001; driver checks rows>0."""
    return _roundtrip(spark, "/root/testdata/sf0.001", "documents")


# ---------------------------------------------------------------------------


def _q_roundtrip(name: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _roundtrip(spark, sf_dir, name)

    return q


def _q_token_count(spark, sf_dir):
    from zebra_spark.functions.text import token_count

    return token_count(_load(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    from zebra_spark.functions.text import fingerprint

    return fingerprint(_load(spark, sf_dir, "documents"))


def _q_quality(spark, sf_dir):
    from zebra_spark.functions.text import quality_score

    return quality_score(_load(spark, sf_dir, "documents"))


def _q_lang_stats(spark, sf_dir):
    from zebra_spark.functions.text import lang_stats

    return lang_stats(_load(spark, sf_dir, "documents"))


def _q_dedup_exact(spark, sf_dir):
    from zebra_spark.functions.dedup import exact_dedup

    return exact_dedup(_load(spark, sf_dir, "documents"))


def _q_ann_topk(spark, sf_dir):
    from zebra_spark.functions.similarity import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


def _q_lsh_ann(spark, sf_dir):
    from zebra_spark.functions.similarity import lsh_ann_topk

    emb = _load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    queries = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    return lsh_ann_topk(emb, queries, dim=dim, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


def _q_minhash(spark, sf_dir):
    from zebra_spark.functions.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_load(spark, sf_dir, "documents"))


def _q_simhash(spark, sf_dir):
    from zebra_spark.functions.dedup import simhash

    return simhash(_load(spark, sf_dir, "documents"))


def _q_ngram_jaccard(spark, sf_dir):
    from zebra_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_load(spark, sf_dir, "documents"), threshold=0.5)


def _q_media_features(spark, sf_dir):
    """Multimodal plumbing: documents' bytes as opaque media payloads ->
    fixed-size feature vectors (rows-only check; decode itself is stubbed)."""
    from zebra_spark.functions.multimodal import extract_features

    media = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("text-bytes").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None)
        .cast("struct<height:int,width:int,channels:int,duration_ms:int>")
        .alias("meta"),
    )
    return extract_features(media)


def _q_roundtrip_synthetic_tokens(spark, sf_dir):
    """F1 token-table round-trip (BASELINE input_hint shape; the synthetic
    table is deterministic so rows-only + pytest cover bit-equality)."""
    from zebra_spark.operators.decode import decode_df
    from zebra_spark.operators.encode import encode_df
    from zebra_spark.sources.synth import f1_table

    df = f1_table(spark, 5000, partitions=8, rows_per_batch=1 << 10)
    return decode_df(encode_df(df, rows_per_block=1 << 10), schema=df.schema)


def _q_orders_by_status(spark, sf_dir):
    """Shuffle/agg demonstration with a value-exact oracle (no float aggs)."""
    return (
        _load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderstatus")
    )


def _q_nation_customer_orders(spark, sf_dir):
    """Broadcast-join pipeline: nation (tiny, broadcast) x customer x orders."""
    nation = _load(spark, sf_dir, "nation")
    customer = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.min("o_orderkey").alias("min_order"),
        )
        .orderBy("n_name")
    )


def _q_encode_summary(spark, sf_dir):
    from zebra_spark.operators.encode import encode_df

    docs = _load(spark, sf_dir, "lineitem")
    blocks = encode_df(docs, rows_per_block=1 << 16)
    return blocks.groupBy().agg(
        F.sum("n_rows").alias("total_rows"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.sum("zebra_bytes").alias("zebra_bytes"),
    )


def _q_verify_blocks(spark, sf_dir):
    """Distributed audit pass (crc + decode + reencode fixed point)."""
    from zebra_spark.operators.encode import encode_df
    from zebra_spark.operators.verify import verify_blocks

    blocks = encode_df(_load(spark, sf_dir, "events"), rows_per_block=1 << 14)
    return verify_blocks(blocks).groupBy().agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.col("crc_ok").cast("long")).alias("crc_ok"),
        F.sum(F.col("decode_ok").cast("long")).alias("decode_ok"),
        F.sum(F.col("reencode_identical").cast("long")).alias("reencode_identical"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable] = {
        f"roundtrip_{t}": _q_roundtrip(t)
        for t in ("documents", "lineitem", "orders", "events", "embeddings", "part")
    }
    qs.update(
        {
            "token_count": _q_token_count,
            "fingerprint": _q_fingerprint,
            "quality_score": _q_quality,
            "lang_stats": _q_lang_stats,
            "dedup_exact": _q_dedup_exact,
            "ann_topk": _q_ann_topk,
            "lsh_ann_topk": _q_lsh_ann,
            "minhash_lsh": _q_minhash,
            "simhash": _q_simhash,
            "ngram_jaccard": _q_ngram_jaccard,
            "orders_by_status": _q_orders_by_status,
            "nation_customer_orders": _q_nation_customer_orders,
            "media_features": _q_media_features,
            "roundtrip_synthetic_tokens": _q_roundtrip_synthetic_tokens,
            "encode_summary": _q_encode_summary,
            "verify_blocks": _q_verify_blocks,
        }
    )
    return qs


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {
        "roundtrip_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "roundtrip_lineitem": "SELECT * FROM lineitem",
        "roundtrip_orders": "SELECT * FROM orders",
        "roundtrip_events": "SELECT * FROM events",
        "roundtrip_embeddings": "SELECT vec_id, embedding, label FROM embeddings",
        "roundtrip_part": "SELECT * FROM part",
        "token_count": (
            "SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens "
            "FROM documents"
        ),
        "fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "quality_score": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_text, "
            "length(regexp_replace(text, '[^.!?,;:]', '', 'g')) / "
            "  CASE WHEN length(text)=0 THEN 1 ELSE length(text) END AS punct_ratio, "
            "(length(text) - length(regexp_replace(text, '\\s', '', 'g'))) / "
            "  CASE WHEN length(text)=0 THEN 1 ELSE length(text) END AS space_ratio, "
            "length(regexp_replace(text, '[^A-Z]', '', 'g')) / "
            "  CASE WHEN length(text)=0 THEN 1 ELSE length(text) END AS upper_ratio "
            "FROM documents"
        ),
        "lang_stats": (
            "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
            "MIN(doc_id) AS min_doc_id, MAX(n_chars) AS max_chars "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS digest, MIN(doc_id) AS keeper, "
            "COUNT(*) AS n_copies FROM documents GROUP BY md5(text) ORDER BY digest"
        ),
        "orders_by_status": (
            "SELECT o_orderstatus, COUNT(*) AS n_orders, "
            "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key, "
            "COUNT(DISTINCT o_custkey) AS n_customers "
            "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
        ),
        "nation_customer_orders": (
            "SELECT n_name, COUNT(*) AS n_orders, "
            "COUNT(DISTINCT c_custkey) AS n_customers, "
            "MIN(o_orderkey) AS min_order "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings "
            "WHERE vec_id < 10), "
            "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "  list_sum(list_transform(list_zip(q.qvec, e.embedding), "
            "    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / "
            "  (sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
            "   sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) "
            "  AS cos_sim "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id), "
            "ranked AS (SELECT query_id, neighbor_id, "
            "  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank "
            "FROM scored) "
            "SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked "
            "WHERE rank <= 5 ORDER BY query_id, rank"
        ),
    }
    return sql
