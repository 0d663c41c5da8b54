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


def test_unconverged_raises_and_caches_bounded(spark):
    """A chain longer than max_iter rounds must RAISE, not silently
    return split components (a dedup stage would then keep several
    'canonical' docs from one group); and superseded per-round
    localCheckpoint caches are unpersisted as the loop advances, so
    the persistent-RDD count stays bounded instead of growing by one
    frame per round."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=5)

    jsc = spark.sparkContext._jsc
    before = len({r for r in jsc.getPersistentRDDs().keySet()})
    comp = connected_components(chain)  # 30-hop chain, ~30 rounds
    assert {r.component for r in comp.collect()} == {0}
    after = len({r for r in jsc.getPersistentRDDs().keySet()})
    # sym + the live labels round survive; dead rounds were freed
    assert after - before <= 3
