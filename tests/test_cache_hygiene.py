"""Cache lifetime hygiene (VERDICT r5 item 5).

Several operators persist() optimizer boundaries that outlive the builder
call (the result DataFrame is collected by the caller). Two guarantees keep
a long-lived session from accumulating blocks:

1. ``caches.release_caches`` drops every persisted block (hosts call it
   between queries — bench.py, tools/stress.py).
2. Every registry entry is wrapped by ``queries._cache_scoped``: invoking
   query N+1 sweeps query N's blocks, so a driver loop that never calls
   release_caches still holds at most one query's working set.
"""

from __future__ import annotations

import os

import pytest

from kitkat_spark.caches import release_caches
from kitkat_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# Three queries whose implementations persist() intermediates
# (dedup.py, similarity.py, textops.py — the sites VERDICT r5 flagged).
CACHING_QUERIES = ["q_near_dedup", "q_embedding_near_dup", "q_winnow_fingerprint"]


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


@pytest.mark.parametrize("name", CACHING_QUERIES)
def test_release_caches_empties_session(spark, name):
    QUERIES[name](spark, SF_DIR).collect()
    release_caches(spark)
    assert _n_cached(spark) == 0, f"{name} left persisted blocks after release"


def test_back_to_back_queries_do_not_accumulate(spark):
    release_caches(spark)
    high_water = []
    for name in CACHING_QUERIES:
        # entering the next query sweeps the previous one's blocks
        QUERIES[name](spark, SF_DIR).collect()
        high_water.append(_n_cached(spark))
    # The footprint stays at one query's working set instead of accumulating
    # (without the _cache_scoped wrapper this reads [1, 2, 3]). A query whose
    # plan was already cached+released earlier in the session recomputes with
    # storage level NONE and registers 0 new blocks, so the bound is
    # max(first, 1), not strictly high_water[0].
    bound = max(high_water[0], 1)
    assert all(n <= bound for n in high_water), (
        f"cache footprint grew across queries: {high_water}"
    )
    release_caches(spark)
    assert _n_cached(spark) == 0
