"""Relational operator surface (SURVEY.md §2.B, M1): scans, joins, aggregates,
windows, set ops, sort/limit, scalar/array/JSON batteries.

Every public ``q_*`` takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match its ``ORACLE[name]`` DuckDB SQL exactly (driver contract).

Scale design notes (apply to all):
- Filters/projections are expressed declaratively so Catalyst pushes them into
  the parquet scan (PushedFilters / ReadSchema — asserted in tests/test_plans).
- Join strategy: fixed-cardinality dims (region/nation/supplier/part/customer)
  get an explicit ``broadcast()`` hint; fact-fact joins go through AQE which
  picks sort-merge + skew splitting at scale.
- Aggregates use map-side partial aggregation automatically (HashAggregate
  x2 in the plan); no ``collect()`` anywhere.
- Doubles that cross the oracle boundary are rounded in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kitkat_spark.functions.numeric import (
    DEC_REV_SQL,
    RATE,
    drate,
    drev,
    dsum,
    dsum_dec,
    dsum_dec_sql,
    dsum_sql,
)
from kitkat_spark.sources import load_table


# ---------------------------------------------------------------------------
# scans & filters
# ---------------------------------------------------------------------------

def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scan: both predicates and the 4-column projection reach parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < "1997-01-01") & (F.col("l_quantity") > 30))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — a per-partition heap
    + single k-row merge, no full sort shuffle. Ties broken deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def q_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim equi join; aggregation after join keeps output small. AQE picks
    broadcast at test scale and sort-merge+skew-split when customer outgrows
    the broadcast threshold."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two explicit broadcast hints: nation(25) and region(5) are
    fixed-cardinality — broadcastable at ANY data scale, so no shuffle of the
    customer side at all."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi + left-anti (no row duplication,
    builds only the key set of the right side)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    order_keys = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        customer.join(order_keys, customer.c_custkey == order_keys.o_custkey, "left_semi")
        .select("c_custkey", F.lit("has_order").alias("tag"))
    )
    anti = (
        customer.join(order_keys, customer.c_custkey == order_keys.o_custkey, "left_anti")
        .select("c_custkey", F.lit("no_order").alias("tag"))
    )
    return semi.unionByName(anti)


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on BOTH sides (customers with a
    positive balance vs per-customer order rollups), tagged by match side.
    The order side is pre-aggregated to 1 row/key BEFORE the join — at scale
    this is the difference between joining 15x fewer rows and exploding the
    fact table through a wide outer join. Full outer cannot broadcast; AQE
    plans sort-merge, which is the right call at any scale."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust = customer.filter(F.col("c_acctbal") > 0).select("c_custkey", "c_mktsegment")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("order_total"),
    )
    joined = cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "full_outer")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_mktsegment",
        "n_orders",
        "order_total",
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("both")
        .alias("side"),
    )


def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min aggregation: each customer's most/least expensive order
    in ONE hash-aggregate pass — no self-join, no window sort. The ordering
    key packs (cents, orderkey) into a single int64 so ties on price break
    deterministically and identically in both engines. At scale this replaces
    the row_number()=1 pattern (shuffle+sort) with a map-side-combinable
    aggregate (shuffle only, O(1) state per key)."""
    orders = load_table(spark, sf_dir, "orders")
    ordkey = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(100_000_000)
        + F.col("o_orderkey")
    )
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("best_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
        F.min_by("o_orderkey", ordkey).alias("worst_order"),
        F.round(F.min("o_totalprice"), 2).alias("worst_price"),
        F.count("*").alias("n_orders"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range self-join: pairs of events by the same user within a
    10-minute forward window.

    The join key is (user_id, time_bucket), not user_id alone: bucketing ts
    into band-width buckets and probing buckets {b, b+1} bounds candidates
    to two buckets' worth per event instead of the user's ENTIRE history —
    per-key candidate work drops from O(|user|^2) to O(|user| x density).
    This is THE 100 TB range-join layout; the band predicate remains as the
    exact residual filter. (A per-user window rangeBetween frame could
    compute this particular aggregate with no join at all, but the operator
    under test is the general range join.)
    """
    band_s = 600  # 10 minutes
    ev = load_table(spark, sf_dir, "events")
    e1 = ev.withColumn("b", (F.unix_timestamp("ts") / band_s).cast("long")).alias("e1")
    # probe side appears in its own bucket and the previous one, so every
    # (e1, e2) pair with ts delta in (0, band] shares a bucket key
    e2 = (
        ev.withColumn("b0", (F.unix_timestamp("ts") / band_s).cast("long"))
        .withColumn("b", F.explode(F.array(F.col("b0"), F.col("b0") - 1)))
        .drop("b0")
        .alias("e2")
    )
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e1.b") == F.col("e2.b"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return (
        e1.join(e2, cond)
        .groupBy(F.col("e1.event_type").alias("event_type"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate hash aggregation with partial (map-side)
    combine; the filter pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    # decimal-exact products: double multiply + double->decimal cast rounds
    # differently in Spark vs DuckDB at ulp boundaries (see functions/numeric.py)
    disc_price = drev()
    charge = disc_price * (F.lit(1).cast(RATE) + drate("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_dec(disc_price).alias("sum_disc_price"),
            dsum_dec(charge).alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count("l_quantity"),
                4,
            ).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double")
                / F.count("l_discount"),
                4,
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation (expands to per-distinct
    aggregates; Spark rewrites via expand + two-phase agg) PLUS the scale
    path: ``approx_count_distinct`` (HyperLogLog++, rsd 2%) — O(1) agg
    state and mergeable partials instead of the Expand's k-fold scan. The
    HLL estimate itself is engine-specific, so what's driver-verified is a
    bounded-relative-error flag against the exact count (same
    sketch-vs-exact pattern as q_count_min / q_quantile_sketch): the
    oracle asserts TRUE, i.e. |approx/exact - 1| <= 10% (5x the rsd)."""
    li = load_table(spark, sf_dir, "lineitem")
    exact_parts = F.countDistinct("l_partkey")
    approx_parts = F.approx_count_distinct("l_partkey", rsd=0.02)
    return li.groupBy("l_returnflag").agg(
        exact_parts.alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
        (
            F.abs(approx_parts.cast("double") / exact_parts.cast("double") - 1.0)
            <= 0.10
        ).alias("approx_parts_ok"),
    )


def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets with GROUPING() markers (null-vs-subtotal
    disambiguation), matching DuckDB's GROUP BY ROLLUP."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n_rows")
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery: sample stddev/variance, correlation,
    covariance. Single map-side-combinable shuffle (all are algebraic
    aggregates with O(1) partial state)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per group (collect_list -> array_sort ->
    array_join): deterministic across engines because the list is sorted
    before concatenation. collect_list is single-shuffle but its per-group
    state is O(group size) — cap grouped cardinality at scale (here: nations
    per region, bounded by the schema)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): order counts + total price per priority,
    one column group per order status. Spark plans this as a single
    conditional aggregation when the pivot values are enumerated (always
    enumerate at scale — value discovery costs an extra pass)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        )
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont) plus the approx sketch the 100 TB path would use
    (approx_percentile / t-digest-style — not oracle-compared, exact twin
    only; at scale you'd ONLY run the sketch)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return li.groupBy("l_linestatus").agg(
        F.round(F.element_at(pct, 1), 4).alias("p25"),
        F.round(F.element_at(pct, 2), 4).alias("p50"),
        F.round(F.element_at(pct, 3), 4).alias("p75"),
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. One shuffle on o_custkey; rank ties broken
    by key so results are deterministic across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead over an explicit ROWS frame; same single
    shuffle/sort services all three window functions."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
    )


def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-navigation windows: first/last/second order per customer from one
    shuffle+sort (all three functions share the window). last_value needs the
    explicit unbounded-following frame — the default frame ends at CURRENT ROW
    and silently returns the current row's value."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_order"),
        F.last_value("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with ordinality: the first 4 embedding components as
    (vec_id, pos, val) rows. Generate runs inside whole-stage codegen — no
    shuffle; slicing BEFORE exploding bounds the fan-out (slice-then-explode
    is the scale rule: explode-then-filter materializes the full blowup)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # + 0.0 normalizes IEEE negative zero: a tiny negative component rounds
    # to unsigned 0.0 in Spark (BigDecimal HALF_UP) but -0.0 in DuckDB —
    # equal as numbers, different as hashed/rendered values
    return (
        emb.select("vec_id", F.posexplode(F.slice("embedding", 1, 4)))
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            (F.round(F.col("col").cast("double"), 4) + F.lit(0.0)).alias("val"),
        )
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (set semantics) over customer key sets,
    tagged so one DataFrame carries all three results."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        a.union(b).distinct().select("o_custkey", F.lit("union").alias("op"))
        .unionByName(a.intersect(b).select("o_custkey", F.lit("intersect").alias("op")))
        .unionByName(a.subtract(b).select("o_custkey", F.lit("except").alias("op")))
    )


# ---------------------------------------------------------------------------
# scalar / array / JSON function batteries
# ---------------------------------------------------------------------------

def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar battery — all codegen'd built-ins."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.upper("o_orderpriority").alias("pri_up"),
        F.substring("o_orderpriority", 1, 3).alias("pri3"),
        F.round("o_totalprice", 1).alias("price_r"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("price_dev"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.year("o_orderdate").cast("string")).alias(
            "status_tag"
        ),
        F.length("o_orderpriority").alias("pri_len"),
    )


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on events.props (schema-on-read)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.select(
        "event_id",
        "event_type",
        k.alias("k"),
        F.pmod(k, F.lit(7)).alias("k_mod7"),
        (k >= 50).alias("k_high"),
    )


def q_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings — transform/aggregate run
    in codegen; sums fold sequentially in double to match the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    sumsq = F.aggregate(
        F.transform(dvec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sumsq), 4).alias("l2_norm"),
        F.round(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x), 4).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vec_max"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (ANSI SQL, driver runs these at sf=0.01)
# ---------------------------------------------------------------------------

ORACLE: dict[str, str] = {
    "q_scan_filter": """
        SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 30
    """,
    "q_sort_limit": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
    "q_hash_join": """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q_broadcast_join": """
        SELECT r_name,
               count(*) AS n_customers,
               round(avg(c_acctbal), 2) AS avg_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_semi_anti_join": """
        SELECT c_custkey, 'has_order' AS tag FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT c_custkey, 'no_order' AS tag FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "q_outer_join": """
        WITH cust AS (
            SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0
        ), per_cust AS (
            SELECT o_custkey, count(*) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS order_total
            FROM orders GROUP BY o_custkey
        )
        SELECT coalesce(c_custkey, o_custkey) AS custkey,
               c_mktsegment, n_orders, order_total,
               CASE WHEN c_custkey IS NULL THEN 'order_only'
                    WHEN o_custkey IS NULL THEN 'customer_only'
                    ELSE 'both' END AS side
        FROM cust FULL OUTER JOIN per_cust ON c_custkey = o_custkey
    """,
    "q_minmax_by": """
        SELECT o_custkey,
               arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS best_order,
               round(max(o_totalprice), 2) AS best_price,
               arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS worst_order,
               round(min(o_totalprice), 2) AS worst_price,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    """,
    "q_range_join": """
        SELECT e1.event_type AS event_type, count(*) AS n_pairs
        FROM events e1
        JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts > e1.ts
         AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
        GROUP BY e1.event_type
    """,
    "q_string_agg": """
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_pivot": """
        SELECT o_orderpriority,
               count(*) FILTER (o_orderstatus = 'F') AS "F_n",
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                          FILTER (o_orderstatus = 'F'), 2) AS DOUBLE) AS "F_total",
               count(*) FILTER (o_orderstatus = 'O') AS "O_n",
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                          FILTER (o_orderstatus = 'O'), 2) AS DOUBLE) AS "O_total",
               count(*) FILTER (o_orderstatus = 'P') AS "P_n",
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                          FILTER (o_orderstatus = 'P'), 2) AS DOUBLE) AS "P_total"
        FROM orders GROUP BY o_orderpriority
    """,
    "q_stats_agg": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_quantity), 4) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_percentiles": """
        SELECT l_linestatus,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_linestatus
    """,
    "q_agg_group": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS sum_base_price,
               {dsum_dec_sql(DEC_REV_SQL)} AS sum_disc_price,
               {dsum_dec_sql(DEC_REV_SQL + " * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))")} AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                     / count(l_quantity), 4) AS avg_qty,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                     / count(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_agg_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(*) AS n_rows,
               TRUE AS approx_parts_ok
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q_rollup_cube": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_window_rank": """
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER w AS rn,
                   rank() OVER w AS rnk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ) WHERE rn <= 3
    """,
    "q_window_frame": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
               round(lag(o_totalprice, 1) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
               round(lead(o_totalprice, 1) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price
        FROM orders
    """,
    "q_first_last": """
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q_posexplode": """
        SELECT vec_id,
               CAST(i - 1 AS INT) AS pos,
               round(CAST(embedding[i] AS DOUBLE), 4) + 0.0 AS val
        FROM embeddings, range(1, 5) t(i)
    """,
    "q_set_ops": """
        WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        SELECT o_custkey, 'union' AS op FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
        UNION ALL
        SELECT o_custkey, 'intersect' AS op FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        UNION ALL
        SELECT o_custkey, 'except' AS op FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
    """,
    "q_scalar_funcs": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               upper(o_orderpriority) AS pri_up,
               substring(o_orderpriority, 1, 3) AS pri3,
               round(o_totalprice, 1) AS price_r,
               round(abs(o_totalprice - 100000.0), 2) AS price_dev,
               o_orderstatus || '-' || CAST(year(o_orderdate) AS VARCHAR) AS status_tag,
               CAST(length(o_orderpriority) AS INT) AS pri_len
        FROM orders
    """,
    "q_json_funcs": """
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS INT) AS k,
               CAST(json_extract_string(props, '$.k') AS INT) % 7 AS k_mod7,
               CAST(json_extract_string(props, '$.k') AS INT) >= 50 AS k_high
        FROM events
    """,
    "q_array_map_funcs": """
        SELECT vec_id, label,
               CAST(len(embedding) AS INT) AS dim,
               round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS l2_norm,
               round(list_sum(embedding::DOUBLE[]), 4) AS vec_sum,
               round(CAST(list_max(embedding) AS DOUBLE), 4) AS vec_max
        FROM embeddings
    """,
}
