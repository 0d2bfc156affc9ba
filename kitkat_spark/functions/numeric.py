"""Order-independent monetary aggregation.

Float summation is not associative: ``sum(double)`` depends on partition
count and task scheduling, so ``round(sum(x), 2)`` can flip the last cent
between two runs of the SAME query — and WILL flip it between a 32-partition
test run and a 100k-partition production run (observed: 9 of 4,363 groups in
q_nation_volume differed from DuckDB by one cent before this fix).

``dsum`` accumulates in ``decimal(18,4)`` instead: fixed-point addition is
exact and associative, so the result is identical under ANY partitioning —
the property a 100 TB pipeline needs for reproducible outputs. The rounded
result is surfaced as ``double`` so downstream schemas (and the driver's
value-hash compare against DuckDB) keep a single numeric type; the cast is
exact because rounded monetary magnitudes sit far below 2^53.

Spark widens the accumulator to decimal(28,4) automatically (sum adds 10
digits of headroom), which holds ~10^24 — enough for a planet-scale revenue
sum at 10^-4 granularity.

``DSUM_SQL`` is the DuckDB twin for oracle strings: DuckDB widens
decimal(18,4) sums to decimal(38,4); the round + double cast then lands on
the same wire values as Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact fixed-point sum of a monetary expression, rounded to ``scale``
    decimals and returned as double. Alias at the call site."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(18,4)")), scale).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum` for an SQL expression string."""
    return (
        f"CAST(round(sum(CAST({expr} AS DECIMAL(18,4))), {scale}) AS DOUBLE)"
    )
