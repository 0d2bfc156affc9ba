"""Runtime-filter join pruning: a hand-rolled Bloom-bitmap semi-join
reduction (SURVEY.md §2.B extension surface — the reference has no joins at
all, /root/reference/consumer/consumer.go is a straight-line stream renderer;
this is part of the mandated large-scale analytics surface).

The 100 TB problem this solves: joining a petabyte fact table to a SELECTIVE
dim (after its filters, say 40 of 1 000 000 suppliers) with a shuffle join
ships the ENTIRE fact table through the exchange and discards 99.99% of it
at the join. Spark's own answers are broadcast joins (only when the dim fits
in memory) and the AQE runtime Bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled — injected only when
heuristics fire). This module makes the move explicit and unconditional:

1. Build a k-hash Bloom bitmap over the dim's join keys with ONE aggregation
   (explode k hash positions -> groupBy word index -> bit_or). The bitmap is
   bounded by N_BITS — 16 KiB here — REGARDLESS of dim cardinality; it is
   collected to the driver and inlined into the plan as an array<long>
   literal, so executors test membership with pure codegen'd bit arithmetic
   (xxhash64 + shift + AND), no broadcast-hash-table probe, no Python.
2. Filter the fact table BEFORE its shuffle. False positives are removed by
   the exact join that follows, false negatives are impossible — the result
   is bit-identical to the plain join (the oracle IS the plain join), only
   the exchanged volume changes (by the selectivity factor: at 4% supplier
   selectivity, 96% of the fact rows never enter the shuffle).

Sizing: k=3 hashes, m=2^17 bits holds ~12k keys at <1% false positives
(m/n ≈ 10 bits/key); production would size m from the post-filter dim count
(a cheap count on the SMALL side). The driver-side collect is O(m/64) = 2048
rows max — bounded by the filter width, never by data.

The registry query forces a shuffle join via a SHUFFLE_HASH hint: with the
fixture-sized dim Spark would broadcast (which already prunes map-side) and
the Bloom filter would be dead code; the hint models the 100 TB regime where
the dim exceeds the broadcast threshold and the Bloom path is load-bearing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kitkat_spark.sources import load_table

N_BITS = 1 << 17  # 16 KiB bitmap
N_HASHES = 3


def _hash_positions(key: Column) -> list[Column]:
    """k independent bit positions from seeded xxhash64 (JVM-side)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(N_BITS)) for seed in range(N_HASHES)
    ]


def build_bloom_bitmap(dim: DataFrame, key: str) -> list[int]:
    """ONE aggregation over the dim side -> a dense list of 64-bit words.

    explode is map-side (k rows per key), the groupBy keys on word index
    (<= N_BITS/64 = 2048 distinct keys -> a tiny, perfectly combinable
    shuffle), and the collect is bounded by the bitmap width.
    """
    words = (
        dim.select(F.explode(F.array(*_hash_positions(F.col(key)))).alias("h"))
        .select(
            F.shiftright(F.col("h"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(h, 64) AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    bitmap = [0] * (N_BITS // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(bitmap: list[int], key: Column) -> Column:
    """Codegen'd membership test against the inlined bitmap literal."""
    arr = F.lit(bitmap)
    cond = F.lit(True)
    for h in _hash_positions(key):
        word = F.element_at(arr, F.shiftright(h, 6).cast("int") + F.lit(1))
        cond = cond & (F.getbit(word, F.pmod(h, F.lit(64))) == 1)
    return cond


def bloom_pruned_join(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Inner join with the fact side Bloom-pruned before its shuffle.

    Result-identical to ``fact.join(dim, fact[fact_key] == dim[dim_key])``;
    the SHUFFLE_HASH hint pins the plan to the regime the filter targets
    (see module docstring).
    """
    bitmap = build_bloom_bitmap(dim, dim_key)
    pruned = fact.filter(bloom_might_contain(bitmap, F.col(fact_key)))
    return pruned.join(dim.hint("shuffle_hash"), pruned[fact_key] == dim[dim_key])


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier of one nation, with lineitem Bloom-pruned before
    the shuffle join. The dim (suppliers of NATION_3, ~4% of suppliers)
    is exactly the selective-dim shape runtime filters exist for; the oracle
    is the PLAIN three-way join — the Bloom filter must be invisible in the
    result and visible only in the exchange volume."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    dim = (
        supp.join(
            F.broadcast(nat.filter(F.col("n_name") == "NATION_3")),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    joined = bloom_pruned_join(li, dim, "l_suppkey", "s_suppkey")
    return joined.groupBy("s_suppkey", "s_name").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


ORACLE: dict[str, str] = {
    # the plain join: Bloom pruning must not change a single row
    "q_bloom_join": """
        SELECT s_suppkey, s_name,
               count(*) AS n_lines,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY s_suppkey, s_name
    """,
}
