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


# ---- the session-scoped LSH signature cache (round-13 verdict #8) ----


def test_sig_cache_two_sf_dirs_do_not_cross_contaminate(spark):
    """Two fixture dirs served from one session must each get their OWN
    signature table: the cache key carries sf_dir, a hit returns the same
    handles, and the two tables disagree on content (different corpora)."""
    from kitkat_spark.operators.dedup import (
        _SIG_CACHE,
        lsh_signatures_and_candidates,
    )

    release_caches(spark)
    _SIG_CACHE.clear()
    sig_a, cand_a = lsh_signatures_and_candidates(spark, "/root/testdata/sf0.001")
    sig_b, cand_b = lsh_signatures_and_candidates(spark, "/root/testdata/sf0.01")
    # same key -> same handles (the cache actually caches)
    sig_a2, cand_a2 = lsh_signatures_and_candidates(
        spark, "/root/testdata/sf0.001"
    )
    assert sig_a is sig_a2 and cand_a is cand_a2
    assert sig_a is not sig_b
    # content isolation: per-doc signatures differ between the corpora
    rows_a = {r.doc_id: r.sig for r in sig_a.select("doc_id", "sig").collect()}
    rows_b = {r.doc_id: r.sig for r in sig_b.select("doc_id", "sig").collect()}
    common = set(rows_a) & set(rows_b)
    assert common, "fixtures share doc_ids; key isolation untestable"
    assert any(rows_a[d] != rows_b[d] for d in common), (
        "sf0.001 and sf0.01 signature tables are identical — a cache key "
        "collision would be invisible"
    )
    release_caches(spark)
    _SIG_CACHE.clear()


def test_sig_cache_eviction_unpersists(spark):
    """Evicting another application's entry must UNPERSIST its signature
    table, not just drop the dict reference (a live multi-session host
    would otherwise leak the materialized block). Red-green: with the
    `del`-only eviction this block stays at a real storage level."""
    from kitkat_spark.operators.dedup import (
        _SIG_CACHE,
        lsh_signatures_and_candidates,
    )

    release_caches(spark)
    _SIG_CACHE.clear()
    # stand-in for a live foreign session's entry: a persisted frame keyed
    # to a different applicationId
    foreign = spark.range(10).persist()
    foreign.count()
    assert foreign.storageLevel.useMemory
    _SIG_CACHE[("some-other-app", "/root/testdata/sf0.001", False)] = (
        foreign,
        foreign,
    )
    lsh_signatures_and_candidates(spark, "/root/testdata/sf0.001")
    assert ("some-other-app", "/root/testdata/sf0.001", False) not in _SIG_CACHE
    assert not foreign.storageLevel.useMemory, (
        "evicted entry's signature table is still persisted"
    )
    release_caches(spark)
    _SIG_CACHE.clear()
