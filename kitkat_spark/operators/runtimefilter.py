"""Runtime-filter join pruning: a hand-rolled split-block Bloom filter
semi-join reduction (SURVEY.md §2.B extension surface — the reference has no
joins at all, /root/reference/consumer/consumer.go is a straight-line stream
renderer; this is part of the mandated large-scale analytics surface).

The 100 TB problem this solves: joining a petabyte fact table to a SELECTIVE
dim (after its filters, say 40 of 1 000 000 suppliers) with a shuffle join
ships the ENTIRE fact table through the exchange and discards 99.99% of it
at the join. Spark's own answers are broadcast joins (only when the dim fits
in memory) and the AQE runtime Bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled — injected only when
heuristics fire). This module makes the move explicit and unconditional:

1. Build the filter over the dim's join keys with ONE aggregation (word
   index -> bit_or of per-key masks). The bitmap is bounded by N_WORDS*8
   bytes — 16 KiB here — REGARDLESS of dim cardinality; it is collected to
   the driver and inlined into the plan as an array<bigint> literal, so
   executors test membership with pure codegen'd arithmetic — no
   broadcast-hash-table probe, no Python.
2. Filter the fact table BEFORE its shuffle. False positives are removed by
   the exact join that follows, false negatives are impossible — the result
   is bit-identical to the plain join (the oracle IS the plain join), only
   the exchanged volume changes (by the selectivity factor: at 4% supplier
   selectivity, 96% of the fact rows never enter the shuffle).

Layout: SPLIT-BLOCK, the cache-efficient variant Parquet and Impala ship
(Putze/Sanders/Singler, "Cache-, Hash- and Space-Efficient Bloom Filters",
WEA 2007 — public literature): ONE xxhash64 per key selects one 64-bit
block AND, from disjoint bit-fields of the same hash, the K bit positions
inside it. A probe is 1 hash + 1 array access + K getbits — the classic
k-independent-hash layout costs K hashes and K scattered word fetches
(measured ~2x slower here, and at memory scale each fetch is a cache miss).
At ~2 keys/word (4k keys in 2048 words) the in-block load is ~6/64 bits,
so the false-positive rate is ~(6/64)^3 ~ 1e-3; production sizes N_WORDS
from the post-filter dim count (a cheap count on the SMALL side).

The registry query forces a shuffle join via a SHUFFLE_HASH hint: with the
fixture-sized dim Spark would broadcast (which already prunes map-side) and
the Bloom filter would be dead code; the hint models the 100 TB regime where
the dim exceeds the broadcast threshold and the Bloom path is load-bearing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kitkat_spark.functions.numeric import DEC_REV_SQL, drev, dsum_dec, dsum_dec_sql
from kitkat_spark.sources import load_table

N_WORDS = 2048  # 64-bit blocks -> 16 KiB, 2^17 bits total
K_BITS = 3  # probe bits per key, from disjoint hash bit-fields


def _word_index(key: Column) -> Column:
    return F.pmod(F.xxhash64(key), F.lit(N_WORDS))


def _bit_positions(key: Column) -> list[Column]:
    """K in-block positions from disjoint 6-bit fields of the SAME hash
    (bits 17.., 23.., 29.. — clear of the low bits the word index uses)."""
    h = F.xxhash64(key)
    return [
        F.shiftright(h, 17 + 6 * i).bitwiseAND(F.lit(63)).cast("int")
        for i in range(K_BITS)
    ]


def build_bloom_bitmap(dim: DataFrame, key: str) -> list[int]:
    """ONE aggregation over the dim side -> a dense list of 64-bit words.

    Each key contributes one (word, 3-bit mask) row map-side; the groupBy
    keys on the word index (<= N_WORDS distinct keys -> a tiny, perfectly
    combinable shuffle), and the collect is bounded by the bitmap width,
    never by data.
    """
    k = F.col(key)
    p1, p2, p3 = _bit_positions(k)
    words = (
        dim.select(
            _word_index(k).alias("w"),
            p1.alias("p1"),
            p2.alias("p2"),
            p3.alias("p3"),
        )
        .select(
            "w",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), p1) | "
                "shiftleft(CAST(1 AS BIGINT), p2) | "
                "shiftleft(CAST(1 AS BIGINT), p3)"
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * N_WORDS
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(bitmap: list[int], key: Column) -> Column:
    """Codegen'd membership test: one word fetch from the inlined literal,
    K getbit probes. The cast pins array<bigint>: a bitmap whose words all
    happen to fit in int32 would otherwise infer array<int>, and getbit on
    an int rejects positions >= 32 at runtime."""
    arr = F.lit(bitmap).cast("array<bigint>")
    word = F.element_at(arr, _word_index(key).cast("int") + F.lit(1))
    cond = F.lit(True)
    for p in _bit_positions(key):
        cond = cond & (F.getbit(word, p) == 1)
    return cond


def bloom_words(dim: DataFrame, key: str) -> DataFrame:
    """The filter as a relation: (word index, 64-bit block) for OCCUPIED
    words only — same one-aggregation build as the list form, minus the
    driver collect."""
    k = F.col(key)
    p1, p2, p3 = _bit_positions(k)
    return (
        dim.select(
            _word_index(k).cast("int").alias("_bloom_w"),
            p1.alias("p1"),
            p2.alias("p2"),
            p3.alias("p3"),
        )
        .select(
            "_bloom_w",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), p1) | "
                "shiftleft(CAST(1 AS BIGINT), p2) | "
                "shiftleft(CAST(1 AS BIGINT), p3)"
            ).alias("mask"),
        )
        .groupBy("_bloom_w")
        .agg(F.bit_or("mask").alias("_bloom_bits"))
    )


def bloom_pruned_join(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Inner join with the fact side Bloom-pruned before its shuffle.

    The bitmap rides as a BROADCAST relation, not a plan literal: an inner
    join on the word index drops every fact row whose word holds no member
    (most rows, for a selective dim) before the getbit probes even run, the
    plan tree stays small (a 16 KiB array literal measured ~1.5 s of
    driver-side optimizer/stringification overhead PER INVOCATION — plan
    cost must never scale with filter width), and nothing round-trips
    through the driver. The list-literal form (``build_bloom_bitmap`` +
    ``bloom_might_contain``) remains for filter-only call sites.

    Result-identical to ``fact.join(dim, fact[fact_key] == dim[dim_key])``;
    the SHUFFLE_HASH hint pins the plan to the regime the filter targets
    (see module docstring).
    """
    words = bloom_words(dim, dim_key)
    k = F.col(fact_key)
    probes = _bit_positions(k)
    pruned = (
        fact.withColumn("_bloom_w", _word_index(k).cast("int"))
        .join(F.broadcast(words), "_bloom_w")
    )
    for p in probes:
        pruned = pruned.filter(F.getbit(F.col("_bloom_bits"), p) == 1)
    pruned = pruned.drop("_bloom_w", "_bloom_bits")
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
        dsum_dec(drev()).alias("revenue"),
    )


ORACLE: dict[str, str] = {
    # the plain join: Bloom pruning must not change a single row
    "q_bloom_join": f"""
        SELECT s_suppkey, s_name,
               count(*) AS n_lines,
               {dsum_dec_sql(DEC_REV_SQL)} AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY s_suppkey, s_name
    """,
}
