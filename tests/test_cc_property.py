"""Property-based check of connected components against a union-find
reference: on random small multigraphs — duplicate edges, self-loops,
reversed pairs, stars, near-cliques, many singleton-pair components —
the pointer-jumping operator must label every node with the MINIMUM
node id reachable in the undirected graph.

The fixed-shape tests (test_operator_edges: chain, isolated pair,
100-node chain) cover the convergence story; hypothesis hunts the
structural corners the dedup pipelines actually produce, where edge
lists arrive unsorted, with both orientations, and with repeats (a
candidate pair verified under several LSH bands emits several edges).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_to_cassandra_spark.operators.graph import connected_components

_NODE = st.integers(min_value=1, max_value=18)

_EDGES = st.lists(st.tuples(_NODE, _NODE), min_size=1, max_size=25)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_EDGES)
def test_connected_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)
