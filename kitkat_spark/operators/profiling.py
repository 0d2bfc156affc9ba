"""Table profiling: per-column statistics in one scan (SURVEY.md §2.B
extension surface — the data-quality audit step every ingestion pipeline
runs before training; the reference streams records without ever inspecting
them, consumer.go renders and moves on).

q_column_profile computes, for every profiled column of `events`, the row
count, null count, exact distinct count, and min/max — emitted in long
format (one row per column) because that is what a quality dashboard or a
schema-drift diff consumes.

Plan shape: ONE wide aggregation over ONE scan. The k exact
count_distinct aggregates make Catalyst plan an Expand (each input row
fans out k+1 times, one branch per distinct aggregate) followed by partial
aggregation — still a single pass over the data with map-side combine, and
the expand rows are narrow (each branch nulls out every column but its
own). At 100 TB the move is to swap `count_distinct` for
`approx_count_distinct` (HyperLogLog): the Expand disappears, the whole
profile collapses to one partial-agg pass, and the sketch is mergeable
across incremental loads — kept exact here because exactness is what the
cross-engine oracle verifies (HLL estimates are engine-specific and not
comparable). min/max/count are already single-pass regardless.

The wide->long pivot happens on the 1-row aggregate via inline(array(...))
— driver-light, no second scan, no unpivot shuffle. Timestamps are
profiled through an explicit second-truncated string projection so the
min/max render identically in every engine (same practice as the consume
renderer, streamparity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kitkat_spark.sources import load_table

PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "props", "ts"]


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-scan long-format profile of ``cols`` (see module docstring)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.inline(F.array(*structs)))


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-column profile of `events`; ts profiled via the second-truncated
    render so min/max strings are engine-portable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )
    return profile(ev, PROFILE_COLS)


def _oracle_branch(c: str, expr: str) -> str:
    return f"""
        SELECT '{c}' AS column_name,
               count(*) AS n_rows,
               count(*) - count({expr}) AS n_nulls,
               count(DISTINCT {expr}) AS n_distinct,
               CAST(min({expr}) AS VARCHAR) AS min_value,
               CAST(max({expr}) AS VARCHAR) AS max_value
        FROM events"""


ORACLE: dict[str, str] = {
    "q_column_profile": "\n        UNION ALL\n".join(
        _oracle_branch(c, e)
        for c, e in [
            ("event_id", "event_id"),
            ("user_id", "user_id"),
            ("event_type", "event_type"),
            ("value", "value"),
            ("props", "props"),
            ("ts", "strftime(ts, '%Y-%m-%d %H:%M:%S')"),
        ]
    ),
}
