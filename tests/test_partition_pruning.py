"""Partition pruning: a date-partitioned events layout + a day filter must
prune at the FILE level (PartitionFilters in the scan), reading only the
matching partition directories — the difference between scanning 100 TB and
scanning one day of it."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kitkat_spark.plans.explain import explain_str
from kitkat_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_registry_query_scan_is_partition_pruned(spark):
    """q_partition_prune's plan must carry the day range as
    PartitionFilters (directory-level pruning) and match the raw-table
    answer — the layout is result-invisible by contract."""
    from kitkat_spark.operators.layout import q_partition_prune

    df = q_partition_prune(spark, SF)
    plan = explain_str(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), f"day not in PartitionFilters: {plan[:500]}"

    raw = (
        load_table(spark, SF, "events")
        .withColumn("day", F.to_date("ts"))
        .filter(
            (F.col("day") >= F.lit("2024-01-08").cast("date"))
            & (F.col("day") <= F.lit("2024-01-14").cast("date"))
        )
        .groupBy("day", "event_type")
        .count()
    )
    got = {(r.day, r.event_type): r.n_events for r in df.collect()}
    want = {(r.day, r.event_type): r["count"] for r in raw.collect()}
    assert got == want and len(got) > 0


def test_day_filter_prunes_partitions(spark, tmp_path):
    part_path = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    ev.write.partitionBy("day").parquet(part_path)

    df = spark.read.parquet(part_path).filter(F.col("day") == "2024-01-05").select(
        "event_id", "value"
    )
    plan = explain_str(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), f"day filter not in PartitionFilters: {plan[:500]}"

    # and the answer matches the unpartitioned path
    want = ev.filter(F.col("day") == "2024-01-05").count()
    assert df.count() == want > 0


def test_dynamic_partition_pruning_via_dim_join(spark):
    """DYNAMIC partition pruning — the runtime half of the scan lever: when
    the pruning predicate only exists on the OTHER side of a join (a
    filtered dimension), Spark must inject a dynamicpruning subquery into
    the partitioned fact scan so only the joined days' directories are
    read. This is the star-schema shape at 100 TB: the fact's partition
    filter is discovered AT RUNTIME from the dim, not written in the query.
    Join answers must match the raw (unpartitioned) path exactly."""
    from kitkat_spark.operators.layout import partitioned_events

    assert (
        spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
        == "true"
    )
    fact = partitioned_events(spark, SF)
    # a genuinely-computed dim with a SELECTIVE FILTER — DPP's planner
    # heuristic (PartitionPruning.hasSelectivePredicate) only injects the
    # pruning subquery when the dim side carries a filter; a LIMIT or a
    # bare aggregate does not qualify
    dim = (
        load_table(spark, SF, "events")
        .select(F.to_date("ts").alias("day"))
        .distinct()
        .filter(F.dayofmonth("day") <= 5)
    )
    joined = fact.join(dim, "day").groupBy("day").agg(
        F.count("*").alias("n")
    )
    plan = explain_str(joined)
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamicpruning subquery in the fact scan: {plan[:800]}"
    )

    raw = (
        load_table(spark, SF, "events")
        .withColumn("day", F.to_date("ts"))
        .join(dim, "day")
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    got = {(r.day, r.n) for r in joined.collect()}
    want = {(r.day, r.n) for r in raw.collect()}
    assert got == want and len(got) > 0


def test_day_column_is_date_without_type_inference(spark):
    """The ADVICE r8 hardening, pinned end-to-end: a host session with
    partition-column type inference DISABLED reads the day partition
    column back as STRING — partitioned_events' explicit cast must still
    deliver DateType (red with the cast removed, green with it)."""
    from pyspark.sql.types import DateType

    from kitkat_spark.operators.layout import partitioned_events

    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = partitioned_events(spark, SF)
        assert isinstance(df.schema["day"].dataType, DateType), df.schema
        # and the values are real dates, not a stringly cast artifact
        assert df.select("day").distinct().count() > 1
    finally:
        spark.conf.set(key, prev)
