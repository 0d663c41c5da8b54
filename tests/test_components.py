"""Iterative connected components (min-label propagation) — the dedup
group former. Chain graphs need multiple propagation rounds, so these
pin the loop's convergence, not just one hop."""

from __future__ import annotations

from lgid_spark.operators.components import (
    connected_components,
    dedup_keep_list,
)


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (21, 20)],
        ["src", "dst"],
    )
    comp = {r.vertex: r.component
            for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}
    keep = {r.component: (r.group_size, r.n_dropped)
            for r in dedup_keep_list(
                connected_components(edges)).collect()}
    assert keep == {1: (5, 4), 10: (3, 2), 20: (2, 1)}


def test_two_chains_merge_late(spark):
    # two long chains joined at the far end — worst case for label flow
    edges = [(i, i + 1) for i in range(1, 8)] + [(100 + i, 101 + i) for i in range(7)]
    edges.append((8, 107))  # join the tails
    df = spark.createDataFrame(edges, ["src", "dst"])
    comp = {r.vertex: r.component for r in connected_components(df).collect()}
    assert set(comp.values()) == {1}  # single component, min id 1
    assert len(comp) == 16
