"""Text-analysis operators over the documents table.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs.  Each operator has an exact ANSI
SQL oracle (see __spark_entry__.oracle_sql) so the driver can verify it
against DuckDB value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PUNCT_CLASS = "[^.!?,;:]"
STOPWORDS = (
    "the,a,an,and,or,but,if,then,of,in,on,at,to,for,with,is,are,was,were,be,it,this,that"
)


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count per document (0 for blank text)."""
    n = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    return docs.select("doc_id", n.cast("int").alias("n_tokens"))


# BPE-ish pretokenizer: letter runs / digit runs / punctuation runs, each
# optionally glued to one leading space, plus residual whitespace.  Kept to
# constructs Java regex and RE2 (DuckDB) evaluate identically — no
# lookahead, ASCII classes — so the SQL oracle matches token-for-token.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """Whitespace AND BPE-ish-regex token counts per document.

    The BPE-ish count approximates what a byte-pair-encoding pretokenizer
    (word/number/punct splits with leading-space glue) would feed the
    merger — the standard budget metric for training-data pipelines.
    Pure JVM regexp (codegen), no Python.
    """
    ws = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.cast("int").alias("n_tokens_ws"),
        bpe.cast("int").alias("n_tokens_bpe"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint (md5 of the text)."""
    return docs.select("doc_id", F.md5(F.col("text")).alias("fp"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/whitespace/uppercase ratio features.

    Ratios are exact small-int divisions in double, so they compare
    bit-identically against the SQL oracle.
    """
    length = F.length("text")
    punct = F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    spaces = F.length("text") - F.length(F.regexp_replace("text", r"\s", ""))
    upper = F.length(F.regexp_replace("text", "[^A-Z]", ""))
    safe = F.when(length == 0, F.lit(1)).otherwise(length)
    return docs.select(
        "doc_id",
        length.cast("long").alias("n_chars_text"),
        (punct.cast("double") / safe.cast("double")).alias("punct_ratio"),
        (spaces.cast("double") / safe.cast("double")).alias("space_ratio"),
        (upper.cast("double") / safe.cast("double")).alias("upper_ratio"),
    )


def lang_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus stats (count + char sums) — summary-style agg."""
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID from character-class ratios (no SQL oracle —
    heuristic thresholds; verified rows-only + by pytest against the
    stored ``lang`` column accuracy)."""
    length = F.length("text")
    safe = F.when(length == 0, F.lit(1)).otherwise(length).cast("double")
    ascii_ratio = F.length(F.regexp_replace("text", r"[^\x00-\x7F]", "")) / safe
    digit_ratio = F.length(F.regexp_replace("text", "[^0-9]", "")) / safe
    pred = (
        F.when(ascii_ratio < 0.5, F.lit("non_latin"))
        .when(digit_ratio > 0.3, F.lit("numeric"))
        .otherwise(F.lit("latin"))
    )
    return docs.select("doc_id", "lang", pred.alias("lang_pred"))
