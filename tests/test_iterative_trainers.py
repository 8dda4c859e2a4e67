"""N-parameterized iterative trainers with lineage truncation (r10
verdict #4): PageRank and the BPE trainer generalized from fixed
3-round unrolls to n_iterations=N with localCheckpoint truncation every
k rounds.

Certification strategy: the driver-checked 3-round queries stay as-is
(their oracles are unchanged); N=10 is certified here against
INDEPENDENT pure-Python dict references (the same harness pattern as
tests/test_pipeline_r10.py's PageRank property test), and plan size is
pinned BOUNDED: with truncate_every=k the final physical plan has the
same node count whether the trainer ran N or 2N rounds — the growth
that made fixed unrolls optimizer-bound past a handful of iterations
is gone.
"""
from __future__ import annotations

from pyspark.sql import functions as F


# --- independent references (no Spark) --------------------------------------


def _pagerank_ref(edges, n_iterations, init=1_000_000, base=150_000,
                  damping=85):
    """Integer-lattice PageRank on plain dicts: contrib = rank div
    out_degree; rank' = base + (damping * inflow) div 100. Floor
    division throughout — the operator's spec re-derived without
    Spark."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: init for n in nodes}
    for _ in range(n_iterations):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += ranks[s] // deg[s]
        ranks = {n: base + (damping * inflow[n]) // 100 for n in nodes}
    return ranks


def _bpe_ref(word_freqs, n_rounds, top, surrogates):
    """BPE merge rounds on a plain dict vocabulary: count
    frequency-weighted adjacent 2-char substrings, rank (count DESC,
    pair ASC), apply the winner with str.replace (left-to-right
    non-overlapping — identical semantics to Spark/DuckDB replace).
    Words that collide after a merge aggregate by summing freqs, which
    leaves every weighted pair count identical to the Spark trainer's
    row-mapped (non-aggregating) vocabulary."""
    out = []
    vocab = dict(word_freqs)
    for r in range(1, n_rounds + 1):
        counts: dict = {}
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                p = word[i:i + 2]
                counts[p] = counts.get(p, 0) + freq
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (pair, cnt) in enumerate(ranked[:top], start=1):
            out.append((r, pair, cnt, rank))
        winner = ranked[0][0]
        nxt: dict = {}
        for word, freq in vocab.items():
            w2 = word.replace(winner, surrogates[r - 1])
            nxt[w2] = nxt.get(w2, 0) + freq
        vocab = nxt
    return out


# --- PageRank N=10 ----------------------------------------------------------


_EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 5), (5, 1), (5, 2),
    (5, 3), (6, 4), (2, 6), (7, 1), (7, 6), (3, 7), (1, 7), (8, 1),
]


def test_pagerank_n10_truncated_matches_reference(spark):
    from trino_adaptive_partitioning_tool_spark.operators import graph

    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_micro"]
        for r in graph.pagerank_integer(
            edges, n_iterations=10, truncate_every=2
        ).collect()
    }
    assert got == _pagerank_ref(_EDGES, 10)


def test_pagerank_truncated_equals_untruncated(spark):
    from trino_adaptive_partitioning_tool_spark.operators import graph

    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    plain = {
        r["node"]: r["rank_micro"]
        for r in graph.pagerank_integer(edges, n_iterations=6).collect()
    }
    trunc = {
        r["node"]: r["rank_micro"]
        for r in graph.pagerank_integer(
            edges, n_iterations=6, truncate_every=2
        ).collect()
    }
    assert plain == trunc == _pagerank_ref(_EDGES, 6)


def test_pagerank_loop_joins_per_iteration_bounded(spark):
    """r13: out_degree is attached to the edge list ONCE before the
    loop, so each additional iteration adds exactly TWO joins
    (edges⋈ranks, nodes⋈inflow) — the pre-r13 loop re-joined the
    loop-invariant degree table every round (3 joins/iteration)."""
    from trino_adaptive_partitioning_tool_spark.operators import graph
    from trino_adaptive_partitioning_tool_spark.plans import inspect as pi

    edges = spark.createDataFrame(_EDGES, "src long, dst long")

    def joins(n: int) -> int:
        m = pi.plan_manifest(graph.pagerank_integer(edges, n_iterations=n))
        return sum(m["joins"].values())

    assert joins(6) - joins(3) == 2 * 3, (
        "pagerank loop body should cost exactly 2 joins per iteration"
    )


def test_pagerank_truncated_plan_size_bounded(spark):
    """With truncate_every=k, doubling N must NOT grow the final plan:
    the last checkpoint resets lineage, so the plan holds at most the
    post-checkpoint tail (same tail length when N % k is equal)."""
    from trino_adaptive_partitioning_tool_spark.operators import graph
    from trino_adaptive_partitioning_tool_spark.plans import inspect as pi

    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    n6 = pi.plan_manifest(
        graph.pagerank_integer(edges, n_iterations=6, truncate_every=2)
    )["physical_nodes"]
    n12 = pi.plan_manifest(
        graph.pagerank_integer(edges, n_iterations=12, truncate_every=2)
    )["physical_nodes"]
    unrolled12 = pi.plan_manifest(
        graph.pagerank_integer(edges, n_iterations=12)
    )["physical_nodes"]
    assert n6 == n12, f"plan grew with N despite truncation: {n6} vs {n12}"
    assert n12 < unrolled12 / 3, (
        f"truncated plan ({n12} nodes) should be a small fraction of "
        f"the 12-round unroll ({unrolled12} nodes)"
    )


# --- BPE N=10 ---------------------------------------------------------------


_WORDS = {
    "loww": 40, "lower": 24, "lowest": 9, "newer": 31, "newest": 13,
    "wider": 17, "widest": 6, "sleep": 21, "deeper": 8, "deepest": 5,
    "keeper": 12, "keep": 27, "seen": 19, "seed": 11, "speed": 7,
    "steep": 4, "weed": 3, "tree": 16, "free": 14, "freed": 2,
}


def _words_df(spark):
    return spark.createDataFrame(
        [(w, f) for w, f in _WORDS.items()], "word string, freq long"
    )


def test_bpe_train_n10_truncated_matches_reference(spark):
    from trino_adaptive_partitioning_tool_spark.queries.text import (
        _BPE_SURROGATE_ALPHABET,
        bpe_train_merges,
    )

    got = sorted(
        (r["round"], r["pair"], r["pair_count"], r["rank"])
        for r in bpe_train_merges(
            _words_df(spark), n_rounds=10, top=5, truncate_every=3
        ).collect()
    )
    want = sorted(
        _bpe_ref(_WORDS, 10, top=5, surrogates=_BPE_SURROGATE_ALPHABET)
    )
    assert got == want


def test_bpe_train_truncated_equals_untruncated(spark):
    from trino_adaptive_partitioning_tool_spark.queries.text import (
        bpe_train_merges,
    )

    frames = [
        bpe_train_merges(_words_df(spark), n_rounds=4, top=5),
        bpe_train_merges(
            _words_df(spark), n_rounds=4, top=5, truncate_every=1
        ),
    ]
    a, b = [
        sorted(
            (r["round"], r["pair"], r["pair_count"], r["rank"])
            for r in f.collect()
        )
        for f in frames
    ]
    assert a == b and len(a) == 20


def test_bpe_train_plan_size_bounded(spark):
    from trino_adaptive_partitioning_tool_spark.plans import inspect as pi
    from trino_adaptive_partitioning_tool_spark.queries.text import (
        bpe_train_merges,
    )

    n6 = pi.plan_manifest(
        bpe_train_merges(_words_df(spark), n_rounds=6, truncate_every=2)
    )["physical_nodes"]
    n12 = pi.plan_manifest(
        bpe_train_merges(_words_df(spark), n_rounds=12, truncate_every=2)
    )["physical_nodes"]
    unrolled8 = pi.plan_manifest(
        bpe_train_merges(_words_df(spark), n_rounds=8)
    )["physical_nodes"]
    assert n6 == n12, f"plan grew with N despite truncation: {n6} vs {n12}"
    assert n12 < unrolled8, (
        f"truncated 12-round plan ({n12} nodes) should undercut even an "
        f"8-round unroll ({unrolled8} nodes)"
    )


def test_bpe_registered_query_unchanged_by_refactor(spark, duck):
    """The registered 3-round query must still hash-match its unrolled
    DuckDB oracle after delegating to the general trainer."""
    from conftest import PARITY_SF_DIR

    from trino_adaptive_partitioning_tool_spark.queries import registry

    df = registry.queries()["bpe_merge_iterations"](spark, PARITY_SF_DIR)
    got = sorted(
        (r["round"], r["pair"], r["pair_count"], r["rank"])
        for r in df.collect()
    )
    want = sorted(
        (r[0], r[1], r[2], r[3])
        for r in duck.execute(
            registry.oracle_sql()["bpe_merge_iterations"]
        ).fetchall()
    )
    assert got == want and len(got) == 30


def test_bpe_round_cap_raises(spark):
    import pytest

    from trino_adaptive_partitioning_tool_spark.queries.text import (
        bpe_train_merges,
    )

    with pytest.raises(ValueError, match="at most"):
        bpe_train_merges(_words_df(spark), n_rounds=27)
