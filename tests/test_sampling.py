"""Scale properties of the deterministic sampling operators: the whole point
of hash-mod bucketing (vs ``df.sample``) is that membership is a pure function
of the row key — invariant under partitioning, retries, and engine layout.
These tests pin that contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kitkat_spark.operators.sampling import hash_bucket, split_column

SF = "/root/testdata/sf0.01"


def _splits(df):
    return {
        r["doc_id"]: r["split"]
        for r in df.select("doc_id", split_column(F.col("doc_id")).alias("split")).collect()
    }


def test_split_invariant_under_repartitioning(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = _splits(docs)
    assert base == _splits(docs.repartition(3))
    assert base == _splits(docs.repartition(17, "lang"))


def test_split_fractions_near_80_10_10(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    counts = dict(
        docs.select(split_column(F.col("doc_id")).alias("s")).groupBy("s").count().collect()
    )
    assert counts["train"] / n == pytest.approx(0.80, abs=0.05)
    assert counts["valid"] / n == pytest.approx(0.10, abs=0.04)
    assert counts["test"] / n == pytest.approx(0.10, abs=0.04)


def test_membership_stable_across_scale_factors(spark):
    """A doc keeps its split when the corpus grows: sf0.001 doc_ids are a
    subset of sf0.01's, and each shared id must land in the same split —
    i.e. incremental appends never reshuffle existing membership."""
    small = _splits(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    big = _splits(spark.read.parquet(f"{SF}/documents.parquet"))
    shared = set(small) & set(big)
    assert shared, "fixture doc_id ranges unexpectedly disjoint"
    assert all(small[k] == big[k] for k in shared)


def test_bucket_range_and_determinism(spark):
    df = spark.range(0, 10_000).select(hash_bucket(F.col("id")).alias("b"))
    stats = df.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"), F.countDistinct("b").alias("nb")
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 99
    assert stats["nb"] == 100  # every bucket hit on 10k sequential keys
