"""Partitioning invariance: results must be BIT-IDENTICAL when the same
query runs under a different shuffle layout — the property that makes a
pipeline reproducible when it moves from local[32] to a 1000-executor
cluster (or when AQE re-plans mid-job).

Float sums are not associative, so any round(sum(double)) aggregate breaks
this under enough groups; the decimal accumulation in functions/numeric.py
(dsum) exists precisely to restore it. These tests re-run representative
queries at a different spark.sql.shuffle.partitions and compare full result
sets value-for-value."""

from __future__ import annotations

import pytest

from kitkat_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"

# Queries whose aggregates have enough groups (or tight enough rounding)
# that a float-sum formulation WOULD flip digits across layouts —
# q_nation_volume did exactly that in round 3 (9 of 4,363 groups).
CASES = [
    "q_nation_volume",
    "q_agg_group",
    "q_returned_revenue",
    "q_stream_enrich",
    "q_incremental_dedup",
    # LSH family: md5-derived hashes and data-dependent bucket caps must
    # make candidate generation layout-independent too
    "q_near_dedup",
    # round-5: iterative fixed-point arithmetic (the reason PageRank is
    # int64, not float — float message passing WOULD flip under layouts),
    # sketch grids (Count-Min sums, histogram bins), and the Bloom-pruned
    # join (bitmap content must not depend on how the dim was partitioned)
    "q_pagerank",
    "q_count_min",
    "q_quantile_sketch",
    "q_bloom_join",
]


def _rows(spark, name):
    df = QUERIES[name](spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_layout(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(spark, name)
        spark.catalog.clearCache()
        # 7 is coprime to 32 and small enough to force very different
        # partition contents and reduction orders
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.catalog.clearCache()
    assert a == b, f"{name} changed results across shuffle layouts"
