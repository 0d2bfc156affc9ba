"""Every SQL-expressible query must match its DuckDB oracle (the driver's
t2 gate, run locally at a smaller sf for speed). Rows-only queries are
checked for plausibility (non-empty / expected counts) in their own tests.
"""

from __future__ import annotations

import os

import pytest

from kitkat_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, name):
    df = QUERIES[name](spark, PARITY_SF)
    problems = compare(df, ORACLES[name], PARITY_SF)
    assert not problems, f"{name}: " + "; ".join(problems)
