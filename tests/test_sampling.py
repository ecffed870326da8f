"""Deterministic sampling: stability, rate accuracy, strata isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from zebra_spark.functions.sampling import deterministic_sample, stratified_sample

SF = "/root/testdata/sf0.001"


def test_sample_is_stable_and_rate_accurate(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n = orders.count()
    s1 = deterministic_sample(orders, 0.2, "o_orderkey")
    got1 = sorted(r.o_orderkey for r in s1.select("o_orderkey").collect())
    # same verdicts under a different partitioning (per-row predicate)
    s2 = deterministic_sample(orders.repartition(13), 0.2, "o_orderkey")
    got2 = sorted(r.o_orderkey for r in s2.select("o_orderkey").collect())
    assert got1 == got2 and len(got1) > 0
    assert abs(len(got1) / n - 0.2) < 0.05  # md5 is uniform enough
    # different seed -> different (but still stable) sample
    s3 = deterministic_sample(orders, 0.2, "o_orderkey", seed=7)
    got3 = sorted(r.o_orderkey for r in s3.select("o_orderkey").collect())
    assert got3 != got1


def test_sample_rate_bounds(spark):
    import pytest

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    assert deterministic_sample(orders, 0.0, "o_orderkey").count() == 0
    assert deterministic_sample(orders, 1.0, "o_orderkey").count() == orders.count()
    with pytest.raises(ValueError):
        deterministic_sample(orders, 1.5, "o_orderkey")


def test_stratified_rates_apply_per_stratum(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = stratified_sample(
        docs,
        strata_col="lang",
        fractions={"en": 1.0, "de": 0.0},
        key_col="doc_id",
        default_rate=0.5,
    )
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == totals["en"]  # rate 1.0 keeps everything
    assert "de" not in by_lang  # rate 0.0 drops everything
    for lang, kept in by_lang.items():
        if lang != "en":
            assert kept <= totals[lang]
