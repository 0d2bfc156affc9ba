"""Composed analytic queries (SURVEY.md §2.B widening): multi-join TPC-H-shaped
pipelines, correlated-subquery shapes, datetime/conditional scalar batteries,
distribution windows, and kNN classification over embeddings.

The reference has no relational surface at all (SURVEY §2.A "deliberately
absent" list — /root/reference/consumer/consumer.go implements only a
streaming decode pipeline), so everything here is north-star extension
surface expressed Spark-first.

Scale notes:
- Multi-join queries put the fixed-cardinality dims (nation 25 / region 5)
  behind explicit ``broadcast()`` and leave fact-fact joins to AQE
  (sort-merge + skew split at 100 TB; broadcast at test scale).
- The correlated-subquery shape is rewritten as a window aggregate — one
  shuffle on the correlation key instead of a per-row subquery; Catalyst
  would do the same de-correlation for the SQL form.
- kNN classification broadcasts the (small) query set against the corpus,
  so the corpus is never shuffled; at 100 TB the corpus side stays
  partition-local and only top-k per (query, partition) would need a
  secondary merge (documented in similarity.py's IVF variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kitkat_spark.functions.numeric import DEC_REV_SQL, drev, dsum, dsum_sql
from kitkat_spark.functions.vectors import dot, norm2
from kitkat_spark.sources import load_table

CUTOFF = "1998-06-01"


def q_mjoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 over customer⋈orders⋈lineitem.

    Both date filters and the segment filter are pushed to the parquet scans
    (asserted in tests/test_plan_quality.py); the final top-10 plans as
    TakeOrderedAndProject, not a global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < CUTOFF)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > CUTOFF)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(drev()).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def q_mjoin_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue by nation over a 6-table join.

    customer⋈orders⋈lineitem⋈supplier with the c/s nation-equality predicate,
    dims (nation, region) broadcast — at any scale only the two fact joins
    shuffle, and both shuffle on keys they already need for the join.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(drev()).alias("revenue")
        )
        .select("n_name", "revenue")
    )


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery shape: customers with above-nation-average
    balance. Expressed as a window aggregate — one hash shuffle on the
    correlation key (c_nationkey) instead of N subquery probes; this is the
    de-correlated plan Catalyst produces for the SQL form too.
    """
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey")
    # The average itself is filter-only, not an output column: double partial
    # aggregation order differs between engines, so a rounded copy of it would
    # flap at rounding boundaries (driver hashes exact values).
    return (
        cust.withColumn("nation_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        )
    )


def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar battery on orders: extraction, truncation, day
    difference, month arithmetic, month-end — all JVM expressions inside one
    whole-stage-codegen span (no shuffle at all; embarrassingly parallel)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since_epoch95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus_3m"),
        F.last_day("o_orderdate").alias("month_end"),
    )


def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar battery on lineitem: CASE bands, NULLIF/COALESCE,
    GREATEST/LEAST. Pure codegen expressions, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag"
        ),
        F.round(F.greatest(F.col("l_extendedprice"), F.col("l_quantity") * 1000), 2).alias(
            "bigger"
        ),
        F.round(F.least(F.col("l_tax"), F.col("l_discount")), 4).alias("smaller"),
    )


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows per market segment: quartile bucket, percent_rank,
    cume_dist over account balance. One shuffle on the partition key."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: each order's trailing-7-day revenue and order
    count per customer. RANGE (value-based) frames differ from ROWS frames
    when timestamps gap or tie — the frame is [ts - 7d, ts], not "previous k
    rows". Spark's rangeBetween needs a numeric order key, so the frame is
    expressed over epoch seconds; one shuffle+sort on the partition key
    serves both aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rev_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent single-column groupings in
    one pass (not expressible as rollup/cube). Spark expands to one Expand
    node + one hash aggregate: a single shuffle covers both groupings."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
               count(*) AS n_rows
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: bin arithmetic stays in codegen
    (no UDF), then one hash aggregate — the standard distributed-histogram
    layout (map-side partial counts, tiny reduce)."""
    orders = load_table(spark, sf_dir, "orders")
    bin_w = 20000
    return (
        orders.select(
            (F.floor(F.col("o_totalprice") / bin_w) * bin_w).cast("long").alias("bin_lo")
        )
        .groupBy("bin_lo")
        .agg(F.count("*").alias("n_orders"))
    )


N_CLASSIFY = 20
K_VOTES = 5


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label vote: predicted label for each query vector (vec_id <
    N_CLASSIFY) = majority label among its K_VOTES cosine-nearest neighbors.

    The query set is broadcast, so the corpus never shuffles for the join;
    the per-query top-k is a window over (query_id) — at scale this becomes
    partial top-k per partition then a k·P-row merge (similarity.py notes).
    Ties in the vote break toward the smaller label for determinism.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    emb = emb.withColumn("nrm", norm2(F.col("v")))
    queries = emb.filter(F.col("vec_id") < N_CLASSIFY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = emb.select(F.col("vec_id").alias("cand_id"), F.col("label"), "v", "nrm")
    scored = cand.join(F.broadcast(queries), F.col("cand_id") != F.col("query_id")).select(
        "query_id",
        "cand_id",
        "label",
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cos"),
    )
    w_top = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "cand_id")
    topk = scored.withColumn("rk", F.row_number().over(w_top)).filter(
        F.col("rk") <= K_VOTES
    )
    votes = topk.groupBy("query_id", "label").agg(F.count("*").alias("votes"))
    w_vote = W.partitionBy("query_id").orderBy(F.col("votes").desc(), "label")
    return (
        votes.withColumn("r", F.row_number().over(w_vote))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )


def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of event value over time, as the closed-form
    least-squares slope: slope = covar_pop(epoch, value) / var_pop(epoch)
    (+ intercept and correlation). All algebraic aggregates — O(1) partial
    state, ONE map-side-combinable shuffle, no model-fitting UDF; at 100 TB
    this is the cheapest possible per-group regression (same pass also
    yields r² = corr²). Scaled to per-day units so the rounded output is
    stable across engines' summation orders."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("ts").cast("double")
    y = F.col("value")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round((F.covar_pop(x, y) / F.var_pop(x)) * 86400, 4).alias(
            "slope_per_day"
        ),
        F.round(
            F.avg(y) - (F.covar_pop(x, y) / F.var_pop(x)) * F.avg(x), 4
        ).alias("intercept"),
        F.round(F.corr(x, y), 4).alias("corr"),
    )


ZSCORE_THRESHOLD = 3.0


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: events whose value sits more than 3
    population standard deviations from their type's mean. The per-type
    stats are a tiny aggregate broadcast BACK onto the scan (the
    q_length_outliers pattern) — the event stream itself never shuffles,
    so the filter is a narrow map at any scale; the same shape runs
    incrementally in streaming with the stats as a slowly-updating
    broadcast side."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > ZSCORE_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


SKY_BUCKET_CENTS = 100  # ~100 price buckets across the catalog's range


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator (Börzsönyi, Kossmann, Stocker,
    ICDE 2001 — public literature): the parts no other part strictly
    dominates on (retail price MINIMIZED, size MAXIMIZED) — the
    "cheapest-for-its-size" frontier. A part is dominated iff another part
    is <= on price and >= on size with at least one strict; ties on both
    dims survive together (no strict edge either way).

    Scale shape: the textbook formulation is an O(n^2) NOT-EXISTS self-join
    (the oracle runs exactly that); a single-sort cummax needs ONE global
    ordering — a single-partition window at 100 TB. This plan instead
    two-phases it like a prefix aggregation: (1) prices quantize to exact
    integer cents (decimal multiply — no float rounding) and bucket by
    cents div {SKY_BUCKET_CENTS}; (2) per-bucket size maxima aggregate to a
    ~price-range/{SKY_BUCKET_CENTS}-row relation whose prefix-max window is
    domain-sized (irrelevant at any corpus size, same argument as
    q_quantile_sketch's 256-row cum window) and broadcasts back; (3) the
    strict-dominance tests are bucket-local windows — rangeBetween(-1) on
    integer cents for cents' < cents, a (bucket, cents) partition max for
    the equal-price strict-size test — all partitioned by bucket, so every
    corpus-sized step shuffles once on the bucket key and sorts only within
    buckets. greatest(carry, in-bucket strict max) >= size OR
    equal-price max > size == dominated."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        "p_size",
    )
    pts = p.withColumn(
        "b", F.floor(F.col("cents") / F.lit(SKY_BUCKET_CENTS)).cast("long")
    )
    bm = pts.groupBy("b").agg(F.max("p_size").alias("bmax"))
    wb = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    carry = bm.select(
        "b", F.coalesce(F.max("bmax").over(wb), F.lit(-1)).alias("carry")
    )
    j = pts.join(F.broadcast(carry), "b")
    w_in = (
        W.partitionBy("b")
        .orderBy("cents")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_eq = W.partitionBy("b", "cents")
    dom = j.select(
        "p_partkey",
        "cents",
        "p_size",
        F.greatest(
            F.col("carry"),
            F.coalesce(F.max("p_size").over(w_in), F.lit(-1)),
        ).alias("lt_max"),
        F.max("p_size").over(w_eq).alias("eq_max"),
    )
    sky = dom.filter(
        ~(
            (F.col("lt_max") >= F.col("p_size"))
            | (F.col("eq_max") > F.col("p_size"))
        )
    )
    return sky.select("p_partkey", "cents", "p_size").orderBy(
        "cents", "p_partkey"
    )


MAD_K = 0.6745  # Phi^-1(0.75): scales MAD to sigma-equivalent units
MAD_THRESHOLD = 3.5  # Iglewicz-Hoaglin modified z-score cutoff


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers via the median/MAD modified z-score
    (Iglewicz & Hoaglin 1993, public statistics literature): |0.6745 *
    (x - median) / MAD| > 3.5. Unlike q_anomaly_zscore's mean/stddev, the
    median/MAD pair has a 50% breakdown point — the outliers themselves
    cannot drag the threshold, which is why production data-quality gates
    prefer it on heavy-tailed value streams.

    Plan: two tiny per-type aggregations (exact percentile — sort-based
    within each of the handful of type groups), each broadcast BACK onto
    the scan (the q_anomaly_zscore / q_length_outliers pattern), so the
    event stream itself never shuffles and the filter is a narrow map at
    any scale. At 100 TB the exact median swaps for the q_quantile_sketch
    mergeable summary; the broadcast-back shape is unchanged.

    Determinism: median and MAD are SNAPPED to the 4-dp grid before the
    score — interpolated medians of 2-dp values land ~1e-13 from a 3-dp
    gridpoint, so both engines round identically and the score arithmetic
    then runs on bit-identical inputs (engines may interpolate
    a+(b-a)*f vs (1-f)*a+f*b, which differ in the last ulp)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 4).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = (
        dev.withColumn("adev", F.abs(F.col("value") - F.col("med")))
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(adev, 0.5D)"), 4).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    rz = MAD_K * (F.col("value") - F.col("med")) / F.col("mad")
    # Round the score via an EXPLICIT product-then-integer-round in both
    # engines: Spark's round() rounds the exact decimal expansion of the
    # double while DuckDB multiplies by 10^d first, and a score landing an
    # ulp under a .00005 boundary (sf0.1: 3.85224999...97, whose double
    # product is exactly 38522.5) made the two disagree in the last digit.
    # round(x * 10^4) / 10^4 evaluates the same double product on both
    # sides, and integer half-away-from-zero agrees engine-to-engine.
    rz4 = F.round(rz * F.lit(10000.0), 0) / F.lit(10000.0)
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(rz) > MAD_THRESHOLD))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            rz4.alias("mad_z"),
        )
    )


WINSOR_LO = 0.05
WINSOR_HI = 0.95


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized mean: values clamped to the [p5, p95] band
    before averaging — the robust location estimate training-data quality
    reports use when a value column has fat tails (raw means are dominated
    by the tail; trimming drops data, winsorizing keeps row counts).

    Plan: one tiny per-type percentile aggregate broadcast back onto the
    scan (stream never shuffles), clamp = codegen'd least/greatest, then
    ONE map-side-combinable aggregate for count/sum/clamp tallies. The
    p5/p95 cut points are 4-dp-snapped like q_anomaly_mad's median so both
    engines clamp at bit-identical thresholds; clamped values live on a
    4-dp grid, so the decimal(18,4) sum is exact in both engines and the
    mean divides that exact sum by the count in double."""
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.round(F.expr(f"percentile(value, {WINSOR_LO}D)"), 4).alias("lo"),
        F.round(F.expr(f"percentile(value, {WINSOR_HI}D)"), 4).alias("hi"),
    )
    clamped = ev.join(F.broadcast(cuts), "event_type").withColumn(
        "wv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clamped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_clamped_lo"),
        F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_clamped_hi"),
        F.round(
            F.sum(F.col("wv").cast("decimal(18,4)")).cast("double")
            / F.count("*"),
            4,
        ).alias("winsor_mean"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*"),
            4,
        ).alias("raw_mean"),
    )


ORACLE: dict[str, str] = {
    "q_anomaly_mad": f"""
        WITH med AS (
            SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
            FROM events GROUP BY event_type
        ), mad AS (
            SELECT e.event_type,
                   round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad,
                   any_value(m.med) AS med
            FROM events e JOIN med m ON e.event_type = m.event_type
            GROUP BY e.event_type
        )
        SELECT event_id, e.event_type,
               round(value, 2) AS value,
               round({MAD_K} * (value - med) / mad * 10000.0) / 10000.0 AS mad_z
        FROM events e JOIN mad ON e.event_type = mad.event_type
        WHERE mad > 0
          AND abs({MAD_K} * (value - med) / mad) > {MAD_THRESHOLD}
    """,
    "q_winsorize": f"""
        WITH cuts AS (
            SELECT event_type,
                   round(quantile_cont(value, {WINSOR_LO}), 4) AS lo,
                   round(quantile_cont(value, {WINSOR_HI}), 4) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) AS n_events,
               any_value(lo) AS lo,
               any_value(hi) AS hi,
               CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clamped_lo,
               CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clamped_hi,
               round(CAST(sum(CAST(least(greatest(value, lo), hi)
                                   AS DECIMAL(18,4))) AS DOUBLE)
                     / count(*), 4) AS winsor_mean,
               round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / count(*), 4) AS raw_mean
        FROM events e JOIN cuts c ON e.event_type = c.event_type
        GROUP BY e.event_type
    """,
    "q_skyline": """
        WITH p AS (
            SELECT p_partkey,
                   CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                   p_size
            FROM part
        )
        SELECT a.p_partkey, a.cents, a.p_size
        FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.cents <= a.cents AND b.p_size >= a.p_size
              AND (b.cents < a.cents OR b.p_size > a.p_size)
        )
        ORDER BY a.cents, a.p_partkey
    """,
    "q_trend_slope": """
        SELECT event_type,
               count(*) AS n_events,
               round((covar_pop(epoch(ts), value) / var_pop(epoch(ts))) * 86400, 4)
                   AS slope_per_day,
               round(avg(value) - (covar_pop(epoch(ts), value) / var_pop(epoch(ts)))
                     * avg(epoch(ts)), 4) AS intercept,
               round(corr(epoch(ts), value), 4) AS corr
        FROM events GROUP BY event_type
    """,
    "q_anomaly_zscore": """
        WITH s AS (
            SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               round(value, 2) AS value,
               round((value - mu) / sigma, 4) AS zscore
        FROM events e JOIN s ON e.event_type = s.event_type
        WHERE abs((value - mu) / sigma) > 3.0
    """,
    "q_mjoin_revenue": f"""
        SELECT l_orderkey,
               {dsum_sql(DEC_REV_SQL)} AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '{CUTOFF}'
          AND l_shipdate > TIMESTAMP '{CUTOFF}'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q_mjoin_region_revenue": f"""
        SELECT n_name,
               {dsum_sql(DEC_REV_SQL)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "q_subquery_scalar": """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    "q_datetime_funcs": """
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               quarter(o_orderdate) AS o_quarter,
               month(o_orderdate) AS o_month,
               day(o_orderdate) AS o_day,
               date_trunc('month', o_orderdate) AS month_start,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS days_since_epoch95,
               o_orderdate + INTERVAL 3 MONTH AS plus_3m,
               last_day(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders
    """,
    "q_conditional_funcs": """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'high' END AS qty_band,
               coalesce(nullif(l_returnflag, 'N'), 'none') AS flag,
               round(greatest(l_extendedprice, l_quantity * 1000), 2) AS bigger,
               round(least(l_tax, l_discount), 4) AS smaller
        FROM lineitem
    """,
    "q_window_ntile": """
        SELECT c_custkey, c_mktsegment,
               round(c_acctbal, 2) AS acctbal,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cum_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "q_window_range": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER w, 2) AS rev_7d,
               count(*) OVER w AS n_7d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    """,
    "q_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    "q_histogram": """
        SELECT CAST(floor(o_totalprice / 20000) * 20000 AS BIGINT) AS bin_lo,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1
    """,
    "q_knn_classify": f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label,
                   list_cosine_similarity(q.embedding, c.embedding) AS cos
            FROM embeddings q, embeddings c
            WHERE q.vec_id < {N_CLASSIFY} AND c.vec_id <> q.vec_id
        ), topk AS (
            SELECT query_id, label
            FROM (
                SELECT query_id, label,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, cand_id) AS rk
                FROM scored
            )
            WHERE rk <= {K_VOTES}
        )
        SELECT query_id, label AS pred_label, votes
        FROM (
            SELECT query_id, label, count(*) AS votes,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY count(*) DESC, label) AS r
            FROM topk
            GROUP BY query_id, label
        )
        WHERE r = 1
    """,
}
