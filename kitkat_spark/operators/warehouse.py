"""Warehouse-maintenance + decorrelation operator surface (SURVEY.md §2.B —
new design; the reference /root/reference is a Kinesis CLI with no relational
layer, SURVEY §2.A).

CDC/dimension maintenance (the batch halves of a streaming ingest):

- q_merge_upsert: MERGE INTO semantics as one full-outer join — base dim vs
  a change set (latest order per customer), classifying every key as
  update / keep / insert. At 100 TB both sides shuffle once on the merge
  key; with the base table bucketed on the key (sources/bucketed.py) the
  base-side shuffle disappears entirely.
- q_scd2: slowly-changing-dimension type 2 build — per-key version chain
  with valid_from/valid_to/is_current derived by lead() over one
  partitionBy(key) shuffle+sort. No self-join (the naive SCD2 formulation
  shuffles the history twice).

Decorrelation long tail (TPC-H Q4/Q11/Q13/Q18 shapes) — each exercises a
Catalyst rewrite the engine must plan well:

- q_exists_join (Q4): correlated EXISTS -> left-semi join.
- q_having_scalar (Q11): HAVING against a global scalar aggregate -> tiny
  1-row broadcast onto the grouped table, no second scan of the fact.
- q_count_distribution (Q13): left outer join + two-level aggregation
  (count per key, then distribution of counts).
- q_group_filter_join (Q18): grouped-HAVING key set joined back to facts.

Float discipline: every cross-engine threshold compares sums of
integer-valued doubles (l_quantity), which are exact in IEEE754 — no
accumulation-order sensitivity at any scale. Price sums only appear
round()ed in output columns, never in predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kitkat_spark.sources import load_table

BIG_ORDER_QTY = 250
MIX_AVG_FACTOR = 1.5


def _latest_order_packed() -> Column:
    """Strictly-ordered tiebreak key for 'latest order per customer':
    epoch-days * 2^32 + orderkey. unix_date is timezone-free (o_orderdate is
    TIMESTAMP_NTZ and date-grained in the fixture), epoch-days < 2^16 and
    orderkeys < 2^32 at any realistic sf, so the packed key fits int64 with
    headroom; at larger key domains widen to a struct max_by key (same
    plan — DuckDB's arg_max can't take a struct key, hence packing)."""
    return F.unix_date(F.to_date("o_orderdate")) * F.lit(1 << 32) + F.col(
        "o_orderkey"
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE of a CDC batch into a dimension: base = customers with
    non-negative balance; changes = latest order price per customer from the
    2001+ order batch (a merge applies one ingest window, not all history).
    matched -> 'update' (balance becomes the latest order price),
    base-only -> 'keep', change-only -> 'insert'. One full-outer join on the
    merge key; the change set is pre-aggregated to 1 row/key (max_by with a
    packed deterministic tiebreak), so the join is key-unique on both sides."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    base = customer.filter(F.col("c_acctbal") >= 0)
    changes = (
        orders.filter(F.col("o_orderdate") >= "2001-01-01")
        .groupBy("o_custkey")
        .agg(F.max_by("o_totalprice", _latest_order_packed()).alias("latest_price"))
    )
    m = base.join(changes, base.c_custkey == changes.o_custkey, "full")
    action = (
        F.when(F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), "update")
        .when(F.col("o_custkey").isNull(), "keep")
        .otherwise("insert")
    )
    return m.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        action.alias("action"),
        F.round("c_acctbal", 2).alias("old_bal"),
        F.round(F.coalesce("latest_price", "c_acctbal"), 2).alias("new_bal"),
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension from the order history: per customer, each order
    opens a version valid until the next order's date (NULL = current). One
    shuffle+sort on (custkey); version, valid_to, is_current all come from
    the same window, so Spark plans a single Window node."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
        F.round("o_totalprice", 2).alias("price"),
    )


def q_exists_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having at least one line shipped > 60 days
    after the order date, counted by priority. Written through the SQL
    surface as a correlated EXISTS; Catalyst decorrelates it to a left-semi
    join on l_orderkey — the fact table shuffles once, no row explosion for
    multi-line matches."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"wh_{t}")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM wh_orders
        WHERE EXISTS (
            SELECT 1 FROM wh_lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
        )
        GROUP BY o_orderpriority
        """
    )


def q_having_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total shipped quantity exceeds 1.5x the
    per-part average — a grouped aggregate filtered against a global scalar
    aggregate of itself. The scalar is a 1-row broadcast cross join; the
    grouped table is computed once (no rescan of lineitem). Quantities are
    integer-valued doubles, so the threshold compare is exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("part_qty"))
    avg_qty = per_part.agg(F.avg("part_qty").alias("avg_qty"))
    return (
        per_part.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("part_qty") > F.lit(MIX_AVG_FACTOR) * F.col("avg_qty"))
        .select("l_partkey", F.round("part_qty", 2).alias("part_qty"))
    )


def q_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts, including
    zero-order customers via left outer join. Two hash aggregations; the
    second input (1 row/customer) is tiny relative to the join output."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1")
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_custs"))


def q_group_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (sum qty > 250) joined back to
    orders+customer. The HAVING key set is small (top ~1% of orders), so AQE
    broadcasts it into both fact joins; quantity sums are exact doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > BIG_ORDER_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


ORACLE: dict[str, str] = {
    "q_merge_upsert": """
        WITH base AS (
            SELECT * FROM customer WHERE c_acctbal >= 0
        ), changes AS (
            SELECT o_custkey,
                   arg_max(o_totalprice,
                           datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)) * 4294967296
                               + o_orderkey)
                       AS latest_price
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '2001-01-01'
            GROUP BY o_custkey
        )
        SELECT coalesce(c_custkey, o_custkey) AS custkey,
               CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
                        THEN 'update'
                    WHEN o_custkey IS NULL THEN 'keep'
                    ELSE 'insert' END AS action,
               round(c_acctbal, 2) AS old_bal,
               round(coalesce(latest_price, c_acctbal), 2) AS new_bal
        FROM base FULL OUTER JOIN changes ON c_custkey = o_custkey
    """,
    "q_scd2": """
        SELECT o_custkey AS custkey,
               CAST(row_number() OVER w AS INT) AS version,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               lead(o_orderdate) OVER w IS NULL AS is_current,
               round(o_totalprice, 2) AS price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q_exists_join": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    "q_having_scalar": """
        WITH per_part AS (
            SELECT l_partkey, sum(l_quantity) AS part_qty
            FROM lineitem GROUP BY l_partkey
        ), a AS (
            SELECT avg(part_qty) AS avg_qty FROM per_part
        )
        SELECT l_partkey, round(part_qty, 2) AS part_qty
        FROM per_part, a
        WHERE part_qty > 1.5 * avg_qty
    """,
    "q_count_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer
            LEFT JOIN (
                SELECT * FROM orders WHERE o_orderpriority NOT LIKE '1%'
            ) o ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT n_orders, count(*) AS n_custs
        FROM per_cust GROUP BY n_orders
    """,
    "q_group_filter_join": """
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS total_price,
               round(sum_qty, 2) AS sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
}
