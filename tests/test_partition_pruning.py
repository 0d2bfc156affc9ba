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
