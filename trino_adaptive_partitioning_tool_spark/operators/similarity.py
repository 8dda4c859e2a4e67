"""Similarity search over embedding columns (array<float>).

Extension operators (BASELINE.json): brute-force cosine top-k as the
correctness baseline, random-hyperplane LSH bucketing as the scale path,
and a cosine near-duplicate pair finder.

Scale design: the brute-force path broadcasts the (small) query set and
scans the corpus once — at 100 TB the corpus side stays partitioned and
the top-k is a per-partition partial top-k + global merge (Spark's window
/ TakeOrdered handles this). The LSH path shuffles on (plane-signature
bucket), so candidate volume, not n², crosses the wire. Dot products are
JVM-side `zip_with`/`aggregate` intrinsics — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × scan corpus once.

    Returns (query_id, vec_id, cosine, rank), rank 1..k, ties broken by
    vec_id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qvec"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    scored = c.crossJoin(q).select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Sign-bit signature of `vec` against fixed hyperplanes → bigint."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(p) for p in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("bigint"), i),
        ).otherwise(F.lit(0).cast("bigint"))
        for i, plane in enumerate(planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def _deterministic_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded, library-free so
    signatures are stable across runs/executors)."""
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: `n_tables` independent hyperplane signatures;
    query joins corpus on any matching (table, signature) bucket, exact
    cosine + top-k within the candidate set.

    Recall/cost dial: more tables → higher recall, more candidates. The
    join key is (table_idx, signature): a hash-partition shuffle, no n²."""
    tables_planes = [
        _deterministic_planes(n_planes, dim) for _ in range(n_tables)
    ]

    def signatures(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_idx"),
                    hyperplane_signature(
                        F.col("dvec"), tables_planes[t]
                    ).alias("signature"),
                )
                for t in range(n_tables)
            ]
        )
        return (
            df.select(
                F.col(idc).alias(out_id),
                _as_double(F.col(vec_col)).alias("dvec"),
            )
            .select(out_id, "dvec", F.explode(sigs).alias("s"))
            .select(out_id, "dvec", "s.table_idx", "s.signature")
        )

    c = signatures(corpus, id_col, "vec_id").withColumnRenamed("dvec", "cvec")
    q = signatures(queries, query_id_col, "query_id").withColumnRenamed(
        "dvec", "qvec"
    )
    cands = (
        c.join(F.broadcast(q), ["table_idx", "signature"])
        .select("query_id", "vec_id", "qvec", "cvec")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def cosine_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold) via the
    LSH buckets — self-join on (table, signature), verify with exact
    cosine."""
    tables_planes = [
        _deterministic_planes(n_planes, dim) for _ in range(n_tables)
    ]
    sigs = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_idx"),
                hyperplane_signature(F.col("dvec"), tables_planes[t]).alias(
                    "signature"
                ),
            )
            for t in range(n_tables)
        ]
    )
    base = (
        corpus.select(
            F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("dvec")
        )
        .select("id", "dvec", F.explode(sigs).alias("s"))
        .select("id", "dvec", "s.table_idx", "s.signature")
    )
    left = base.select(
        F.col("id").alias("id_a"), F.col("dvec").alias("vec_a"),
        "table_idx", "signature",
    )
    right = base.select(
        F.col("id").alias("id_b"), F.col("dvec").alias("vec_b"),
        "table_idx", "signature",
    )
    pairs = (
        left.join(right, ["table_idx", "signature"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b")
        .distinct()
    )
    return (
        pairs.withColumn(
            "cosine", F.round(cosine_expr(F.col("vec_a"), F.col("vec_b")), 6)
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
