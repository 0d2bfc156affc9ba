"""Query registry: the declared SURVEY.md §2 surface the driver verifies.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps the SQL-expressible subset to DuckDB twins (names/aliases
match column-for-column — driver hashes values after sorting columns by name).
Names absent from ``ORACLES`` get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kitkat_spark.operators import (
    analytic,
    dedup,
    multimodal,
    payloads,
    relational,
    sampling,
    similarity,
    streamparity,
    temporal,
    textops,
)

_MODULES = (
    relational,
    sampling,
    analytic,
    temporal,
    dedup,
    similarity,
    textops,
    payloads,
    multimodal,
    streamparity,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    for _name in dir(_m):
        if _name.startswith("q_"):
            QUERIES[_name] = getattr(_m, _name)
    ORACLES.update(getattr(_m, "ORACLE", {}))

_unmatched = set(ORACLES) - set(QUERIES)
assert not _unmatched, f"oracle without query: {_unmatched}"
