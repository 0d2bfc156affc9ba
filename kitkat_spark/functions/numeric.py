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


# ---------------------------------------------------------------------------
# Decimal-exact PRODUCT expressions.
#
# ``dsum`` is safe only for raw monetary COLUMNS: their doubles encode exact
# 2-dp values, so the double->decimal cast is unambiguous (the value sits
# ~1e-11 from its decimal, 0.005 from the rounding boundary). A double
# PRODUCT like l_extendedprice*(1-l_discount) is an arbitrary double that can
# land within one ulp of a .xxxx5 boundary — and Spark (HALF_UP) and DuckDB
# then round the double->decimal conversion DIFFERENTLY (observed: one cent
# over 5,481 rows in q_agg_group's sum_charge).
#
# The cure is to never multiply in floating point: cast each FACTOR at its
# native scale (prices 2 dp, rates 2 dp, quantities 2 dp), multiply in
# decimal (exact, engine-identical), and reduce scale only via an explicit
# round() at the end. Two engine gotchas this module encodes:
#   * DuckDB CAST(decimal -> lower-scale decimal) TRUNCATES while Spark
#     rounds HALF_UP — so intermediate decimals must keep their full scale
#     until the final explicit round() (which is half-away-from-zero in
#     BOTH engines).
#   * Decimal multiply precision grows (p1+p2+1 in Spark); factor scales are
#     kept small (18,2)x(5,2)x(5,2) so the 3-way product stays exact at
#     (30,6) — no silent precision-loss rescale.
# ---------------------------------------------------------------------------

MONEY = "decimal(18,2)"  # prices / balances: 2-dp, up to 10^16
RATE = "decimal(4,2)"    # discounts / taxes in [0, 1): 2-dp
QTY = "decimal(8,2)"     # quantities: 2-dp, up to 10^6


def dmoney(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def drate(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def drev() -> Column:
    """Exact-decimal discounted revenue l_extendedprice*(1-l_discount):
    (18,2) x (5,2) -> decimal(24,4), exact in both engines."""
    return dmoney("l_extendedprice") * (F.lit(1).cast(RATE) - drate("l_discount"))


DEC_REV_SQL = (
    "(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
)


def dsum_dec(col: Column, scale: int = 2) -> Column:
    """Sum an ALREADY-decimal expression at its native scale, then round to
    ``scale`` and surface as double. Unlike :func:`dsum` there is no inner
    (18,4) cast — that cast would rescale scale-6 products, which DuckDB
    truncates and Spark rounds."""
    return F.round(F.sum(col), scale).cast("double")


def dsum_dec_sql(expr: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum_dec` — ``expr`` must already be a
    decimal expression (e.g. built from :data:`DEC_REV_SQL`)."""
    return f"CAST(round(sum({expr}), {scale}) AS DOUBLE)"
