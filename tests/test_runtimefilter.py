"""Bloom-bitmap semi-join reduction: no false negatives (the correctness
contract), real pruning (the point of the operator), and the plan shape the
100 TB regime needs (filter before the shuffle, shuffle join not broadcast).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kitkat_spark.operators.runtimefilter import (
    bloom_might_contain,
    bloom_pruned_join,
    build_bloom_bitmap,
)
from kitkat_spark.plans import explain_str


def test_no_false_negatives(spark):
    dim = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    bitmap = build_bloom_bitmap(dim, "k")
    members = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    kept = members.filter(bloom_might_contain(bitmap, F.col("k"))).count()
    assert kept == 500, "a Bloom filter must never drop a real key"


def test_false_positive_rate_is_low(spark):
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    bitmap = build_bloom_bitmap(dim, "k")
    # probe 20k keys guaranteed absent from the dim
    probes = spark.range(100_000, 120_000).select(F.col("id").alias("k"))
    fp = probes.filter(bloom_might_contain(bitmap, F.col("k"))).count()
    assert fp < 200, f"false-positive rate {fp / 20_000:.3%} (expect << 1%)"


def test_join_result_identical_to_plain_join(spark):
    fact = spark.range(0, 2000).select(
        (F.col("id") % 100).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 10).select((F.col("id") * 9).alias("dk"))
    got = (
        bloom_pruned_join(fact, dim, "fk", "dk")
        .select("fk", "payload", "dk")
        .collect()
    )
    want = (
        fact.join(dim, fact.fk == dim.dk).select("fk", "payload", "dk").collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_plan_filters_fact_before_shuffle_join(spark):
    from kitkat_spark.queries import QUERIES

    df = QUERIES["q_bloom_join"](spark, "/root/testdata/sf0.001")
    plan = explain_str(df, "simple")
    assert "ShuffledHashJoin" in plan, "hint must pin the 100 TB join shape"
    # the membership test (3 seeded getbit probes) runs as a codegen'd
    # filter on the fact side, upstream of its exchange
    assert plan.count("getbit") >= 3, "Bloom probe missing from the plan"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
