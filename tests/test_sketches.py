"""Sketch accuracy: the approximate aggregates the 100 TB path would run
instead of their exact forms must land within their documented error bounds
on the fixture data (exact twins computed side-by-side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kitkat_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_approx_percentile_within_tolerance(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)").alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("ex"),
    ).collect()[0]
    for approx, exact in zip(row.ap, row.ex):
        assert abs(approx - exact) / exact < 0.02, (approx, exact)


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
        F.countDistinct("l_partkey").alias("ex"),
    ).collect()[0]
    assert abs(row.ap - row.ex) / row.ex < 0.06  # ~3 sigma of rsd=0.02


def test_lsh_near_dedup_recall_vs_exact_jaccard(spark):
    """MinHash+LSH (8 bands x 4 rows) vs the exact inverted-index Jaccard
    pairs: candidates are exact-verified so precision is 1 by construction
    (every emitted pair re-checks jaccard >= 0.8); banding theory puts
    per-pair detection at j=0.8 around 1-(1-0.8^4)^8 ~ 0.985, so demand
    recall >= 0.8 on the fixture's near-dup families."""
    from kitkat_spark.queries import QUERIES

    exact = {
        (r.doc_a, r.doc_b) for r in QUERIES["q_ngram_jaccard"](spark, SF).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in QUERIES["q_near_dedup"](spark, SF).collect()}
    assert lsh <= exact, f"false positives: {sorted(lsh - exact)[:5]}"
    assert exact, "fixture should contain near-dup pairs"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.3f} below banding expectation"


def test_cms_raw_stream_equals_vocab_weighted_grid(spark):
    """The production raw-stream grid (cms_counters) and q_count_min's
    vocab-weighted build must produce the IDENTICAL grid — summing weights
    per cell is counting the stream."""
    from pyspark.sql import functions as F

    from kitkat_spark.operators.sketches import CMS_D, cms_counters

    toks = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, ["token"]
    )
    raw = {(r["seed"], r["bucket"]): r["n"] for r in cms_counters(toks).collect()}
    assert sum(raw.values()) == CMS_D * 9  # every token hits D cells
    # weighted build from the frequency table
    from kitkat_spark.operators.sketches import _bucket

    freq = toks.groupBy("token").agg(F.count("*").alias("n"))
    cells = freq.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("seed"), _bucket(F.col("token"), s).alias("bucket"))
                    for s in range(CMS_D)
                ]
            )
        ).alias("c"),
    ).groupBy("c.seed", "c.bucket").agg(F.sum("n").alias("n"))
    weighted = {(r["seed"], r["bucket"]): r["n"] for r in cells.collect()}
    assert raw == weighted


def test_hll_error_within_envelope_and_merge_law(spark):
    """q_hll_distinct's estimates must land inside ~2.5 standard errors of
    the m=64 HLL bound (1.04/sqrt(64) ~= 13% per group), and the sketch
    must obey the merge law the 100 TB story depends on: registers built
    from two disjoint shards MAX-merge to exactly the registers of the
    union (which is what lets per-day/per-shard sketches combine without a
    distinct pass)."""
    from kitkat_spark.operators.sketches import q_hll_distinct

    rows = q_hll_distinct(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["rel_err"]) < 0.33, (r["flag"], r["rel_err"])

    # merge law on the raw registers: split lineitem by parity of orderkey
    from kitkat_spark.functions.text import md5_long
    from kitkat_spark.operators.sketches import HLL_M, HLL_P, HLL_REST_W

    li = load_table(spark, SF, "lineitem").select(F.col("l_orderkey").alias("k"))
    h = md5_long(F.concat(F.lit("hll|"), F.col("k").cast("string")))
    hashed = li.select(
        (F.col("k") % 2).alias("shard"),
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.when(F.pmod(F.shiftright(h, HLL_P), F.lit(1 << HLL_REST_W)) == 0,
               F.lit(HLL_REST_W + 1))
        .otherwise(
            F.lit(HLL_REST_W + 1)
            - F.length(F.bin(F.pmod(F.shiftright(h, HLL_P), F.lit(1 << HLL_REST_W))))
        ).alias("rho"),
    )
    per_shard = hashed.groupBy("shard", "bucket").agg(F.max("rho").alias("r"))
    merged = {
        r["bucket"]: r["r"]
        for r in per_shard.groupBy("bucket").agg(F.max("r").alias("r")).collect()
    }
    union = {
        r["bucket"]: r["r"]
        for r in hashed.groupBy("bucket").agg(F.max("rho").alias("r")).collect()
    }
    assert merged == union
