"""Star-algorithm connected components: correctness against a driver-side
union-find on random graphs, and convergence on graphs whose DIAMETER far
exceeds the round budget (the case O(diameter) label propagation cannot
handle)."""

from __future__ import annotations

import random

from kitkat_spark.operators.graph import connected_components_star


def _union_find(n_edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_long_path_converges_fast(spark):
    # a 2,000-node path has diameter 1,999: min-label propagation would need
    # 1,999 rounds; the star algorithm must finish within its 50-round cap
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(2000)], ["src", "dst"]
    )
    got = {r["u"]: r["label"] for r in connected_components_star(edges).collect()}
    assert len(got) == 2001
    assert set(got.values()) == {0}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(4)
    for trial in range(3):
        n = 400
        edge_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
        ]
        want = _union_find(edge_list)
        edges = spark.createDataFrame(edge_list, ["src", "dst"])
        got = {
            r["u"]: r["label"]
            for r in connected_components_star(edges).collect()
        }
        assert got == want, f"trial {trial}"


def test_binary_tree_and_islands(spark):
    # complete binary tree (log-diameter) + two disjoint islands
    tree = [(i, 2 * i + 1) for i in range(63)] + [(i, 2 * i + 2) for i in range(63)]
    islands = [(1000, 1001), (2000, 2001), (2001, 2002)]
    edges = spark.createDataFrame(tree + islands, ["src", "dst"])
    got = {r["u"]: r["label"] for r in connected_components_star(edges).collect()}
    assert all(got[u] == 0 for u in range(127))
    assert got[1000] == got[1001] == 1000
    assert got[2000] == got[2001] == got[2002] == 2000


def test_hybrid_cc_falls_back_to_star_on_deep_graphs(spark):
    from kitkat_spark.operators.corpus import connected_components

    # diameter 199 >> max_iter 3: the min-label fast path cannot converge,
    # so the hybrid must hand off to the star algorithm and still be right
    edges = spark.createDataFrame([(i, i + 1) for i in range(200)], ["src", "dst"])
    got = {r["u"]: r["label"] for r in connected_components(edges, max_iter=3).collect()}
    assert len(got) == 201
    assert set(got.values()) == {0}


def test_pagerank_fixed_point_hand_check(spark):
    """One iteration on the path 1-2-3, checked against hand-computed exact
    fixed-point values: contribs are rank div deg, update is
    150000 + (850 * sum) div 1000 — no floats anywhere."""
    from pyspark.sql import functions as F

    from kitkat_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])
    got = {r["u"]: r["rank"] for r in pagerank_fixed(edges, iters=1).collect()}
    # deg: {1:1, 2:2, 3:1}; contribs into 2 = 1e6 + 1e6, into 1/3 = 5e5
    assert got == {1: 575_000, 2: 1_850_000, 3: 575_000}


def test_pagerank_mass_is_conserved_approximately(spark):
    """On a 200-node random graph, total rank stays within truncation loss
    of N * SCALE (each node truncates < deg micro-units per round)."""
    import random

    from kitkat_spark.operators.graph import PR_SCALE, pagerank_fixed

    rng = random.Random(7)
    edges = spark.createDataFrame(
        list({(rng.randrange(200), rng.randrange(200)) for _ in range(400)}),
        ["u", "v"],
    )
    ranks = pagerank_fixed(edges, iters=3).collect()
    n = len(ranks)
    total = sum(r["rank"] for r in ranks)
    assert 0.97 * n * PR_SCALE < total <= n * PR_SCALE + 1
