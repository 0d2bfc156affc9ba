"""TPC-H long-tail join/decorrelation shapes (SURVEY.md §2.B — new design;
the reference /root/reference is a Kinesis CLI with no relational layer,
SURVEY §2.A). Complements warehouse.py's Q4/Q11/Q13/Q18 shapes with the
remaining planner-exercising patterns, adapted to the fixture star schema
(no partsupp table; lineitem's (l_partkey, l_suppkey) pairs stand in):

- q_nation_volume (Q7): two dimension arms hanging off one fact — customer
  nation AND supplier nation resolved per lineitem. All four dims broadcast;
  the only shuffles are the fact-side orders join + final agg.
- q_promo_revenue (Q14): conditional-aggregate ratio over a broadcast
  fact-dim join, one output row, map-side combinable.
- q_part_supplier_count (Q16): distinct-count aggregation after an anti-join
  exclusion list — the distinct runs on (brand, type, size, suppkey) AFTER
  the join, so the shuffle carries pre-deduped pairs only.
- q_small_qty_revenue (Q17): correlated scalar subquery (per-part average)
  decorrelated to a window aggregate — ONE shuffle of the filtered fact,
  no self-join rescan of lineitem.
- q_disjunctive_join (Q19): equi-join with a disjunctive residual predicate —
  Catalyst keys the join on partkey alone and evaluates the OR-of-ANDs as a
  post-join filter; part stays broadcast.
- q_idle_customers (Q22): global scalar threshold + NOT EXISTS anti-join +
  aggregation, the classic "customers with money but no orders" shape.

Scale notes: every dim (part/supplier/customer/nation) carries an explicit
``broadcast`` hint — fixed or sublinear cardinality at any sf (see
sources/tables.py BROADCASTABLE). Fact tables (lineitem/orders) are never
broadcast; their joins shuffle once on the join key and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kitkat_spark.sources import load_table

PROMO_MONTH = ("1996-09-01", "1996-10-01")
SMALL_QTY_FACTOR = 0.2
IDLE_MIN_BAL = 0.0

def _rev() -> F.Column:
    """Discounted revenue expression (Column creation needs a live session,
    so this can't be a module-level constant)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipped revenue between (supplier nation, customer nation)
    pairs per ship year. lineitem resolves BOTH arms: supplier->nation and
    order->customer->nation; every dimension broadcasts, so the fact crosses
    the wire once for the orders join and once for the final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: PROMO revenue share for one ship month. Part broadcasts;
    the month filter is pushed into the lineitem scan; the ratio is a
    two-accumulator conditional aggregate -> one row."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo, hi = PROMO_MONTH
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
                / F.sum(_rev()),
                2,
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


def q_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size) from lineitem's
    observed (part, supplier) pairs, excluding suppliers with negative
    balance (the complaints stand-in). The exclusion list is tiny ->
    broadcast anti-join; pairs are deduped before the distinct count, so
    the agg shuffle carries each (part, supplier) once."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    excl = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti")
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small-quantity Brand#1 orders — lines with
    quantity below 0.2x their part's average quantity. The correlated
    per-part average is a window aggregate over ONE partitionBy(l_partkey)
    shuffle of the brand-filtered fact (the naive form rescans and re-aggs
    lineitem, then joins — twice the fact traffic)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    filtered = li.join(
        F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey, "left_semi"
    )
    w = W.partitionBy("l_partkey")
    return (
        filtered.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.lit(SMALL_QTY_FACTOR) * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: equi-join on partkey with an OR-of-ANDs residual — Catalyst
    must key the broadcast join on the conjunct common to all branches
    (l_partkey = p_partkey) and run the disjunction as a post-join filter,
    not fall back to a cartesian."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"), F.count("*").alias("n_lines")
    )


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per-nation count/balance of customers with above-average
    positive balance and NO orders. The global average is a 1-row broadcast;
    the NOT EXISTS is a left anti-join against the orders key set. Customer
    never shuffles: both the threshold compare and the anti-join build side
    broadcast onto its scan, and the final agg is 25 groups."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > IDLE_MIN_BAL).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        orders.select("o_custkey"),
        rich.c_custkey == orders.o_custkey,
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


ORACLE: dict[str, str] = {
    "q_nation_volume": """
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1, 2, 3
    """,
    "q_promo_revenue": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_pct,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    "q_part_supplier_count": """
        WITH pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM pairs JOIN part ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
        )
        GROUP BY 1, 2, 3
    """,
    "q_small_qty_revenue": """
        WITH filtered AS (
            SELECT l_partkey, l_quantity, l_extendedprice,
                   avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
            FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
            )
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM filtered
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q_disjunctive_join": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q_idle_customers": """
        WITH a AS (
            SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer, a
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey
          )
        GROUP BY c_nationkey
    """,
}
