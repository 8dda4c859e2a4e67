"""Cross-engine fuzz for the integer-lattice k-means exactness claim.

The registered queries prove parity on the driver's testdata; this
suite proves it on ADVERSARIAL corpora — duplicates (argmin ties),
negatives (the sign branch of the centroid rounding formula), values
engineered to land the per-dimension mean exactly on .5 (the
half-away-from-zero boundary), k == n, and 1-dimensional data. Each
case runs the full Spark fit + assignment AND the unrolled DuckDB CTE
replay over the identical doubles and asserts bit-for-bit equality —
the same differential method test_cross_engine_fuzz.py applies to the
SQL miner."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trino_adaptive_partitioning_tool_spark.operators import clustering as C

# (seed, n, dim, k, iters, mutation)
_CASES = [
    (7, 40, 8, 4, 3, "plain"),
    (11, 60, 5, 5, 2, "dups"),       # heavy duplicate points: argmin ties
    (13, 30, 6, 3, 3, "negative"),   # all-negative coords: sign branch
    (17, 25, 4, 25, 2, "k_eq_n"),    # every point its own seed
    (19, 50, 1, 4, 4, "one_dim"),
    (23, 32, 3, 4, 3, "half_ties"),  # means land exactly on .5 lattice
]


def _corpus(seed: int, n: int, dim: int, mutation: str) -> np.ndarray:
    rng = np.random.RandomState(seed)
    base = rng.uniform(-1.0, 1.0, size=(n, dim))
    if mutation == "dups":
        # half the corpus is copies of the first 5 points
        for i in range(n // 2):
            base[n // 2 + i] = base[i % 5]
    elif mutation == "negative":
        base = -np.abs(base)
    elif mutation == "half_ties":
        # quantized values in {1, 2}: a 2-point cluster {1, 2} has an
        # exact mean of 1.5 — the rounding-boundary case
        base = rng.choice([0.0015, 0.0025], size=(n, dim))
    return base


@pytest.mark.parametrize(
    "seed,n,dim,k,iters,mutation",
    _CASES,
    ids=[c[5] for c in _CASES],
)
def test_kmeans_cross_engine_bit_exact(
    spark, duck, seed, n, dim, k, iters, mutation
):
    base = _corpus(seed, n, dim, mutation)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]

    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids, quantized = C.kmeans_fit(sdf, k=k, iters=iters)
    got = sorted(
        tuple(r) for r in C.assign_clusters(quantized, centroids).collect()
    )

    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [list(map(float, v)) for v in base]}
    )
    view = f"km_fuzz_{mutation}"
    duck.register(view, pdf)
    try:
        cte, final = C.kmeans_oracle_cte(k, iters, dim=dim, table=view)
        want = sorted(
            tuple(t)
            for t in duck.execute(
                f"WITH {cte} SELECT vec_id, cluster, dist2 FROM {final}"
            ).fetchall()
        )
    finally:
        duck.unregister(view)
    assert got == want, f"{mutation}: Spark/DuckDB k-means diverged"


def test_kmeans_greedy_cross_engine_bit_exact(spark, duck):
    """Same differential check for the farthest-point seeding path
    (duplicate-heavy corpus — exactly where seeding strategy matters)."""
    base = _corpus(29, 36, 4, "dups")
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids, quantized = C.kmeans_fit(sdf, k=5, iters=2, init="greedy")
    got = sorted(
        tuple(r) for r in C.assign_clusters(quantized, centroids).collect()
    )
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(base)),
            "embedding": [list(map(float, v)) for v in base],
        }
    )
    duck.register("km_fuzz_greedy", pdf)
    try:
        cte, final = C.kmeans_oracle_cte(
            5, 2, dim=4, table="km_fuzz_greedy", init="greedy"
        )
        want = sorted(
            tuple(t)
            for t in duck.execute(
                f"WITH {cte} SELECT vec_id, cluster, dist2 FROM {final}"
            ).fetchall()
        )
    finally:
        duck.unregister("km_fuzz_greedy")
    assert got == want
