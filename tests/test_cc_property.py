"""Property test for the distributed connected-components implementations
(operators/corpus.py hybrid min-label, operators/graph.py large/small-star)
against a pure-Python union-find oracle on hypothesis-generated graphs.

CC is the one custom iterative algorithm the dedup-clustering family rests
on (membership table -> canonical selection -> apply); its fixture tests
cover paths/cycles/islands, but the adversarial shapes — self-loops,
parallel + reversed duplicate edges, several components of mixed
diameter — are exactly what random graphs generate. Both execution paths
are exercised: the default hybrid (min-label fast path) and the
star-fallback forced via max_iter=1 (a 1-round budget the deeper random
graphs exceed, pushing every such example through
connected_components_star).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kitkat_spark.operators.corpus import connected_components


@st.composite
def edge_lists(draw):
    n = draw(st.integers(min_value=2, max_value=25))
    node = st.integers(min_value=0, max_value=n - 1)
    return draw(st.lists(st.tuples(node, node), min_size=1, max_size=50))


def union_find_labels(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp: dict[int, list[int]] = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


@given(edge_lists(), st.booleans())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cc_matches_union_find(spark, edges, force_star):
    df = spark.createDataFrame(edges, ["src", "dst"])
    # max_iter=1 exhausts the min-label budget on any diameter-2+ graph,
    # forcing the large/small-star fallback path
    got = {
        r["u"]: r["label"]
        for r in connected_components(
            df, max_iter=1 if force_star else 20
        ).collect()
    }
    assert got == union_find_labels(edges)
