"""Skew-resistant join: explicit key salting (SURVEY.md §4 / north-star
scale discipline).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for sort-merge
joins and after the skewed shuffle already materialized. Explicit salting
bounds the partition size *before* the shuffle: the hot side scatters each
key across ``n_salts`` sub-keys, the other side replicates each row
``n_salts`` times. Use when one key holds >~1/shuffle_partitions of all rows
(the null-key or celebrity-user shape).

Cost model: replicated side grows n_salts-fold — pick the SMALLER side to
replicate and a salt count ~= (hot key rows / target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with salt fan-out.

    The skewed side gets a uniform random salt in [0, n_salts); the other
    side is exploded to every salt value, so (key, salt) pairs still meet
    exactly once. Result equals the plain join row-for-row for ``inner``
    and ``left`` (the skewed side carries ONE salt per row, so its
    unmatched rows survive exactly once). ``right``/``full`` are rejected:
    each unmatched row of the replicated side would surface n_salts times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "outer-preserving the replicated side would duplicate its "
            "unmatched rows n_salts times"
        )
    salted_l = skewed.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    salted_r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")


def adaptive_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    hot_threshold: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-only salting: replicate the build side ONLY for keys whose
    row count exceeds ``hot_threshold``; everything else takes the plain
    join path. This is the production form of :func:`salted_join` — blanket
    salting replicates the entire build side n_salts-fold (n_salts x wire
    and build-memory cost even when 99.9% of keys are uniform), while here
    the replication cost is n_salts x |hot build rows|, which is tiny by
    definition (hot keys are few; that is what makes them hot).

    The hot-key list is ONE aggregation over the skewed side's join column
    (map-side combinable, output rows = distinct hot keys — broadcastable
    at any corpus size since a key needs hot_threshold rows to qualify,
    bounding the list at N/hot_threshold entries). Both inputs split on
    membership; the two join results union. Same row-for-row result as the
    plain join for 'inner'/'left' (each input row lands in exactly one
    branch).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"adaptive_salted_join supports how='inner'/'left' only, got {how!r}"
        )
    spark = skewed.sparkSession
    if hot_threshold is None:
        # rows-per-task sizing (the 10x stress-run lesson, SCALE_NOTES.md):
        # an absolute threshold that exercises salting on a small fixture
        # classifies a large fraction of keys as hot at 10x the data. A key
        # is only worth salting when it alone overfills a shuffle partition;
        # 4x headroom keeps the hot list to genuine celebrity keys.
        #
        # Sizing reuses the SAME per-key aggregation that builds the hot
        # list: persist the counts, total them (a job over distinct keys,
        # not a second fact-table scan — the previous form here paid a full
        # skewed.count() pass before the join even started), then read the
        # hot list back. The list is structurally tiny: a key needs more
        # than total/parts/4 rows to qualify, so at most 4*parts keys exist
        # — safe to collect and ship back as a broadcast-sized local table.
        counts = skewed.groupBy(on).agg(F.count("*").alias("_n")).persist()
        try:
            total = counts.agg(F.sum("_n")).collect()[0][0] or 0
            try:
                parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
            except (TypeError, ValueError):
                # e.g. "auto" on AQE-managed platforms
                parts = spark.sparkContext.defaultParallelism
            hot_threshold = max(1, int(total) // max(parts, 1) // 4)
            hot_rows = counts.filter(F.col("_n") > hot_threshold).select(on).collect()
        finally:
            counts.unpersist()
        hot = spark.createDataFrame(hot_rows, schema=skewed.select(on).schema)
    else:
        hot = (
            skewed.groupBy(on)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > hot_threshold)
            .select(on)
        )
    skew_hot = skewed.join(F.broadcast(hot), on, "left_semi")
    skew_cold = skewed.join(F.broadcast(hot), on, "left_anti")
    other_hot = other.join(F.broadcast(hot), on, "left_semi")
    cold = skew_cold.join(other, on, how)
    hot_joined = salted_join(skew_hot, other_hot, on, n_salts=n_salts, how=how)
    return cold.unionByName(hot_joined)


def q_skew_join_salted(spark, sf_dir):
    """Driver-verified skew join: lineitem adaptively salted against orders,
    then aggregated per order priority. The oracle is the PLAIN join:
    salting must be result-invisible, which is exactly the property worth a
    cross-engine value check.

    Uses :func:`adaptive_salted_join`: keys above the hot threshold take
    the (key, salt) scatter + replicated-build path, the uniform remainder
    joins plainly — so the replication cost tracks |hot rows|, not |build
    side|. The threshold is fixture-scaled (orders with > 4 lineitems) so
    BOTH branches execute against real data; at 100 TB the threshold is
    rows-per-task-sized and only genuine celebrity keys pay it. This is
    the manual guard for skew AQE can't fix (broadcast-ineligible hot
    build sides)."""
    from pyspark.sql import functions as F

    from kitkat_spark.functions.numeric import dsum
    from kitkat_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = adaptive_salted_join(li, orders, "l_orderkey", hot_threshold=4)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        dsum("l_quantity").alias("total_qty"),
    )


def q_skew_join_auto(spark, sf_dir):
    """Driver-verified PRODUCTION skew join: same lineitem⋈orders shape as
    :func:`q_skew_join_salted` but with ``hot_threshold=None``, i.e. the
    rows-per-task auto-sizing path a real deployment runs (threshold =
    total/shuffle_partitions/4, hot list collected from the same per-key
    agg). On a uniform fixture the hot list is usually empty and everything
    takes the plain-join branch — which is exactly the correct production
    behavior to verify: salting engages only for genuine celebrity keys,
    and the result is row-for-row the plain join either way (the oracle)."""
    from pyspark.sql import functions as F

    from kitkat_spark.functions.numeric import dsum
    from kitkat_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = adaptive_salted_join(li, orders, "l_orderkey", hot_threshold=None)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        dsum("l_quantity").alias("total_qty"),
    )


_PLAIN_JOIN_SQL = """
        SELECT o_orderpriority,
               count(*) AS n_lines,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """

ORACLE = {
    "q_skew_join_salted": _PLAIN_JOIN_SQL,
    "q_skew_join_auto": _PLAIN_JOIN_SQL,
}
