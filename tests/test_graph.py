"""Connected components vs a local union-find ground truth."""

from __future__ import annotations

import random

from trino_adaptive_partitioning_tool_spark.operators import graph


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    want = _union_find(edges)
    # both dispatch paths must converge to the min node id per component,
    # same as path-compressed union-find with min-root merging
    for threshold in (2_000_000, 0):  # single-task path, star path
        got = {
            r["node"]: r["component"]
            for r in graph.connected_components(
                df, single_task_threshold=threshold
            ).collect()
        }
        assert got == want, f"threshold={threshold}"


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_long_chain_needs_many_rounds(spark):
    # a 40-node path has diameter 39: exercises the iteration loop and
    # the checkpoint-per-round lineage truncation
    edges = [(i, i + 1) for i in range(40)]
    _check(spark, edges)


def test_disjoint_cliques(spark):
    edges = [(a, b) for base in (0, 100, 200)
             for a in range(base, base + 5) for b in range(a + 1, base + 5)]
    _check(spark, edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    roll = {
        r["cluster_rep"]: r["n_members"]
        for r in graph.cluster_rollup(graph.connected_components(df)).collect()
    }
    assert roll == {0: 5, 100: 5, 200: 5}


def test_deep_chain_converges_in_log_rounds(spark):
    """A 500-node path has diameter 499: min-label propagation would need
    ~500 rounds (and 500 Spark jobs); large-star/small-star must converge
    in O(log n) — the max_iter=20 budget only holds under the star
    algorithm."""
    edges = [(i, i + 1) for i in range(500)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in graph.connected_components(
            df, max_iter=20, single_task_threshold=0
        ).collect()
    }
    assert got == {i: 0 for i in range(501)}


def test_duplicate_and_bidirectional_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4), (4, 5)]
    _check(spark, edges)


def test_star_rounds_converged_at_last_round_does_not_raise(spark):
    """A graph already at its star fixed point must succeed even with
    max_iter=1: convergence is observed one round after it happens, so
    the confirming pass must not count against the budget."""
    df = spark.createDataFrame([(2, 1), (3, 1), (4, 1)], ["src", "dst"])
    labels = {
        r["node"]: r["component"]
        for r in graph.connected_components(
            df, max_iter=1, single_task_threshold=0
        ).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}


def test_star_rounds_raise_on_exhausted_budget(spark):
    """Genuinely non-converged labels must raise, not return silently
    wrong (a deep chain cannot fold in zero productive rounds)."""
    import pytest as _pytest

    chain = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(df, max_iter=0, single_task_threshold=0)
