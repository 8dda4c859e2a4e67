"""Deterministic integer-lattice k-means over embedding columns.

DataFrame-native Lloyd's iterations for training-data curation (topic
balancing, semantic outlier pruning — the SemDeDup/D4 family of
embedding-space curation steps). Unlike the pyspark.ml KMeans behind
operators/ivf.py (seeded but not SQL-replayable — float sums depend on
partition order), every step here is EXACT integer arithmetic, so the
whole fit replays bit-for-bit in the DuckDB oracle:

* vectors quantize to int64 lattice points (floor(x*1000), the same
  convention as the LSH signatures in operators/similarity.py);
* initial centroids are the k lowest-id vectors (ORDER BY id LIMIT k —
  deterministic, SQL-expressible);
* distances are integer: d2(q,c) = <q,q> - 2<q,c> + <c,c>, argmin ties
  broken by cluster id;
* new centroids round the exact per-dimension mean back to the lattice
  with a pure-integer half-away-from-zero formula,
  c = sign(s) * ((2|s| + n) intdiv (2n)), identical on Spark (`div`)
  and DuckDB (`//`) since both truncate toward zero and the operands
  are non-negative. No float enters the loop, so partition order,
  executor count, and engine cannot change the result.

Scale design (100 TB):
* assignment is MAP-ONLY: centroids are a k x dim literal (bounded,
  model-sized) folded into whole-stage codegen — no join, no shuffle;
* each update is ONE shuffle of k*dim partial sums per map partition
  (posexplode + groupBy(cluster, dim) with map-side combine), i.e.
  shuffle volume is O(parts * k * dim), independent of row count;
* centroids live driver-side between iterations (k x dim ints — the
  same bounded collect pyspark.ml's own Lloyd loop performs);
* the quantized corpus is scanned once per assignment pass — persist
  it for multi-iteration fits on cold storage.

Reference parity: the reference tool has no clustering surface (it is
a partition advisor, src/partitioning.py); this module is part of the
rebuild's LLM-pipeline extension mandate alongside operators/dedup.py
and operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1000


def quantize_expr(col: Column) -> Column:
    """int64 lattice quantization of a float-array column — the exact
    Spark twin of the oracle's
    list_transform(c, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT))."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT_SCALE))


def quantize_sql(expr: str) -> str:
    """DuckDB rendering of quantize_expr for oracle builders."""
    return (
        f"list_transform({expr}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"
    )


def _dot_long(a: Column, b: Column) -> Column:
    """Exact integer dot product of two long-array columns (JVM fold,
    whole-stage codegen — no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _long_array_lit(values: list[int]) -> Column:
    """Long-array literal in ONE Py4J call (r14, guide §1.2 driver
    overhead): the element-wise `F.array(*[F.lit(x).cast("long")...])`
    construction costs ~2 driver round trips PER ELEMENT — at dim=64,
    k=8 and one rebuild per Lloyd pass that is thousands of round trips
    of pure driver latency per fit (measured: the dominant share of the
    5-10s cold fits). One `F.expr` over `array(..L, ..)` parses to the
    identical folded Literal array."""
    return F.expr(
        "array(" + ",".join(f"{int(x)}L" for x in values) + ")"
    )


def _round_centroid(s: int, n: int) -> int:
    """Half-away-from-zero integer rounding of s/n. Mirrors the oracle's
    CASE WHEN s >= 0 THEN (2*s + n) // (2*n) ELSE -((2*(-s) + n) // (2*n))
    — all operands non-negative inside the division, so Python floor-div,
    Spark `div`, and DuckDB `//` (both truncating) agree exactly."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((2 * (-s) + n) // (2 * n))


def assign_clusters(
    quantized: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Map-only nearest-centroid assignment against a centroid literal.

    Returns (id_col, cluster, dist2): integer squared L2 distance on the
    lattice, ties broken by cluster id. One struct array_min per row —
    pure Column expressions, no join, no shuffle.
    """
    v = F.col(vec_col)
    qq = _dot_long(v, v)
    entries = []
    for j, c in enumerate(centroids):
        c_lit = _long_array_lit(c)
        cc = int(sum(x * x for x in c))
        d2 = qq - 2 * _dot_long(v, c_lit) + F.lit(cc).cast("long")
        entries.append(
            F.struct(d2.alias("d2"), F.lit(j).cast("int").alias("cl"))
        )
    best = F.array_min(F.array(*entries))  # struct order = (d2, cl)
    return quantized.select(
        F.col(id_col),
        best["cl"].alias("cluster"),
        best["d2"].alias("dist2"),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = True,
    init: str = "lowest",
) -> tuple[list[list[int]], DataFrame]:
    """Integer-lattice Lloyd's: `iters` assignment passes with centroid
    updates between them (iters=3 → assign, update, assign, update,
    assign). Returns (final centroids, quantized corpus frame).

    init="lowest" seeds with the k lowest-id vectors (one collect);
    init="greedy" uses farthest-point seeding (greedy_init — k-1 extra
    map-only passes, duplicate-proof seeds).

    Each update collects k*dim partial sums to the driver — bounded by
    model size (k x dim), never by corpus size; the identical pattern
    pyspark.ml's Lloyd loop uses. Empty clusters keep their previous
    centroid (standard Lloyd's fallback, replayed by the oracle's
    COALESCE over a LEFT JOIN)."""
    # quantize=False: the vector column is ALREADY integer-valued (e.g.
    # token-hash count vectors) — just widen to long
    vec = (
        quantize_expr(F.col(vec_col))
        if quantize
        else F.transform(F.col(vec_col), lambda x: x.cast("long"))
    )
    quantized = df.select(
        F.col(id_col), vec.alias("v")
    ).persist()  # scanned once per assignment pass + once per update —
    # without this every Lloyd pass re-reads and re-quantizes the full
    # corpus. Ownership: stays persisted for the caller's final
    # assignment; callers may .unpersist() the returned frame when done.
    if init not in ("lowest", "greedy"):
        raise ValueError(f"unknown init {init!r}: use 'lowest' or 'greedy'")
    if init == "greedy":
        centroids = greedy_init(quantized, k, id_col)
    else:
        # k lowest-id vectors: deterministic, SQL-expressible init
        init_rows = quantized.orderBy(id_col).limit(k).collect()
        if len(init_rows) < k:
            raise ValueError(
                f"k-means fit needs at least k={k} rows; corpus has "
                f"{len(init_rows)}"
            )
        centroids = [[int(x) for x in r["v"]] for r in init_rows]
    dim = len(centroids[0])

    for _ in range(iters - 1):
        assigned = assign_clusters(quantized, centroids, id_col)
        sums = (
            assigned.join(quantized, id_col)
            .select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: k * dim rows (model-sized)
        )
        by_cluster: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], [0] * dim)[r["pos"]] = int(
                r["s"]
            )
            counts[r["cluster"]] = int(r["n"])
        centroids = [
            [
                _round_centroid(by_cluster[j][d], counts[j])
                for d in range(dim)
            ]
            if j in by_cluster
            else centroids[j]  # empty cluster: carry previous
            for j in range(k)
        ]
    return centroids, quantized


def grouped_kmeans_refit(
    members: DataFrame,
    sub_k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    group_col: str = "cluster",
    vec_col: str = "embedding",
    quantize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Per-group Lloyd's over MANY groups in lock-step: mathematically
    identical to running kmeans_fit(k=sub_k) independently inside each
    group (same lowest-id init, same half-away-from-zero integer
    centroid update, same (d2, sub) tie-break, same empty-cluster
    carry), but each iteration is ONE Spark job covering every group —
    a driver loop of per-group fits costs jobs proportional to the
    group COUNT (hundreds of sequential fits when many clusters breach
    a ceiling), while this costs a fixed ~2 jobs per iteration at any
    group count. Model state is (n_groups x sub_k x dim) integers —
    collected per update, bounded by model size, never by corpus size;
    the assignment expression is a per-group WHEN chain of
    centroid-literal array_min probes (codegen-sized: n_groups x sub_k
    structs).

    ``members``: (id_col, group_col, vec_col) — every group must have
    at least sub_k rows (callers split clusters larger than a ceiling
    >= sub_k, so this holds by construction and is asserted).

    Returns (assignment, scratch): assignment = (id_col, group_col,
    sub) lazy over the persisted quantized scratch frame — the caller
    materializes its consumer, then unpersists the scratch."""
    from pyspark.sql import Window

    vec = (
        quantize_expr(F.col(vec_col))
        if quantize
        else F.transform(F.col(vec_col), lambda x: x.cast("long"))
    )
    q = members.select(
        F.col(id_col), F.col(group_col), vec.alias("v")
    ).persist()

    w = Window.partitionBy(group_col).orderBy(id_col)
    init_rows = (
        q.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= sub_k)
        .select(group_col, (F.col("rn") - 1).alias("sub"), "v")
        .collect()  # bounded: n_groups * sub_k rows (model-sized)
    )
    cents: dict[tuple[int, int], list[int]] = {
        (r[group_col], r["sub"]): [int(x) for x in r["v"]]
        for r in init_rows
    }
    groups = sorted({g for g, _ in cents})
    for g in groups:
        if (g, sub_k - 1) not in cents:
            raise ValueError(
                f"grouped refit needs >= sub_k={sub_k} rows per group; "
                f"group {g} has fewer"
            )
    dim = len(next(iter(cents.values())))

    def best_expr() -> F.Column:
        # Rendered as ONE SQL string (a single Py4J call): composing
        # n_groups x sub_k x dim centroid literals through the Column
        # API costs thousands of driver round trips PER PLAN BUILD —
        # at 8 groups x 8 subs x 64 dims that alone dominated the whole
        # refinement (~10s/plan). Plan-construction cost is real; the
        # expression below is the identical integer arithmetic.
        #
        # (d2, sub) packs into ONE long: key = d2*sub_k + sub, so
        # min(key) == argmin by (d2, then sub) — the exact tie-break
        # assign_clusters' struct array_min uses. (Structs are avoided
        # on purpose: the analyzer drops CreateStruct field aliases
        # when a coercion wraps a child, degrading names to col1/col2.)
        # The common <v,v> term shifts every key equally, so it is
        # dropped: key_j = (cc_j*sub_k + j) - 2*sub_k*<v,c_j>. Keys can
        # then go negative — pmod (not %) recovers j, since the dropped
        # qq*sub_k term is ≡ 0 (mod sub_k). Overflow headroom: |key| <
        # 2^63 needs |cc + 2<v,c>|*sub_k < 2^63 — the lattice bound
        # dim*(2*scale*max)^2*sub_k, satisfied with orders to spare.
        branches = []
        for g in groups:
            keys = []
            for j in range(sub_k):
                c = cents[(g, j)]
                cc = int(sum(x * x for x in c))
                arr = ", ".join(f"{int(x)}L" for x in c)
                dot = (
                    f"aggregate(zip_with(v, array({arr}), "
                    "(x, y) -> x * y), 0L, (acc, x) -> acc + x)"
                )
                keys.append(f"({cc * sub_k + j}L - {2 * sub_k}L * {dot})")
            branches.append(
                f"WHEN {group_col} = {int(g)} THEN CAST(pmod("
                f"array_min(array({', '.join(keys)})), {sub_k}) AS INT)"
            )
        # unreachable ELSE: every row's group is in `groups` by construction
        return F.expr(
            "CASE " + " ".join(branches) + " ELSE CAST(NULL AS INT) END"
        )

    for _ in range(iters - 1):
        sums = (
            q.select(
                group_col,
                best_expr().alias("sub"),
                F.posexplode("v").alias("pos", "val"),
            )
            .groupBy(group_col, "sub", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: n_groups * sub_k * dim (model-sized)
        )
        acc: dict[tuple[int, int], list[int]] = {}
        counts: dict[tuple[int, int], int] = {}
        for r in sums:
            key = (r[group_col], r["sub"])
            acc.setdefault(key, [0] * dim)[r["pos"]] = int(r["s"])
            counts[key] = int(r["n"])
        cents = {
            (g, j): (
                [
                    _round_centroid(acc[(g, j)][d], counts[(g, j)])
                    for d in range(dim)
                ]
                if (g, j) in acc
                else cents[(g, j)]  # empty sub-cluster: carry previous
            )
            for g in groups
            for j in range(sub_k)
        }

    assignment = q.select(
        F.col(id_col), F.col(group_col), best_expr().alias("sub")
    )
    return assignment, q


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: (id_col, cluster, dist2)."""
    centroids, quantized = kmeans_fit(df, k, iters, id_col, vec_col)
    return assign_clusters(quantized, centroids, id_col)


def kmeans_oracle_final_centroids(iters: int) -> str:
    """Name of the centroid CTE the LAST assignment pass of
    kmeans_oracle_cte uses — the fitted model a composing oracle can
    score additional rows against. Kept next to the builder so the
    naming knowledge lives in exactly one module."""
    return f"c{iters - 1}" if iters > 1 else "c0"


def kmeans_oracle_cte(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_cte: str | None = None,
    init: str = "lowest",
) -> tuple[str, str]:
    """Unrolled-CTE DuckDB replay of kmeans_assignments. Returns
    (cte_sql, final_assignment_cte_name); the final CTE has columns
    (id_col, cluster, dist2). Every value is integer-exact, so the
    replay is bit-identical to the Spark fit.

    `q_cte` overrides the default quantization CTE with a caller-built
    `q AS (...)` whose columns are ({id_col}, v BIGINT[]) — used by
    consumers whose vectors are derived (e.g. token-hash counts) rather
    than quantized embeddings. `init="greedy"` replays greedy_init's
    k-1 farthest-point selection rounds (min-dist-to-chosen argmax,
    same integer d2, ties by lowest id) before the Lloyd iterations."""
    parts = [
        q_cte
        if q_cte is not None
        else f"q AS (SELECT {id_col}, {quantize_sql(vec_col)} AS v"
        f" FROM {table})",
    ]
    if init not in ("lowest", "greedy"):
        raise ValueError(f"unknown init {init!r}: use 'lowest' or 'greedy'")
    if init == "greedy":
        gd2 = (
            "CAST(list_dot_product(q.v, q.v)"
            " - 2*list_dot_product(q.v, g.v)"
            " + list_dot_product(g.v, g.v) AS BIGINT)"
        )
        parts.append(
            f"g0 AS (SELECT 0 AS cl, v FROM"
            f" (SELECT {id_col}, v FROM q ORDER BY {id_col} LIMIT 1) t)"
        )
        gprev = "g0"
        for j in range(1, k):
            parts.append(
                f"p{j} AS (SELECT {id_col} FROM ("
                f"SELECT q.{id_col}, MIN({gd2}) AS md"
                f" FROM q CROSS JOIN {gprev} g GROUP BY q.{id_col}) t"
                f" ORDER BY md DESC, {id_col} LIMIT 1)"
            )
            parts.append(
                f"g{j} AS (SELECT cl, v FROM {gprev} UNION ALL"
                f" SELECT {j} AS cl, q.v FROM q"
                f" JOIN p{j} USING ({id_col}))"
            )
            gprev = f"g{j}"
        parts.append(
            f"c0 AS (SELECT CAST(cl AS INTEGER) AS cl, v FROM {gprev})"
        )
    else:
        parts.append(
            f"c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1"
            f" AS INTEGER) AS cl, v FROM"
            f" (SELECT {id_col}, v FROM q ORDER BY {id_col} LIMIT {k}) t)"
        )
    parts.append(f"dims AS (SELECT unnest(generate_series(1, {dim})) AS i)")
    prev = "c0"
    for it in range(1, iters + 1):
        d2 = (
            "CAST(list_dot_product(q.v, q.v) - 2*list_dot_product(q.v, c.v)"
            " + list_dot_product(c.v, c.v) AS BIGINT)"
        )
        parts.append(
            f"a{it} AS (SELECT {id_col}, cl AS cluster, d2 AS dist2 FROM ("
            f"SELECT q.{id_col}, c.cl, {d2} AS d2,"
            f" ROW_NUMBER() OVER (PARTITION BY q.{id_col}"
            f" ORDER BY {d2}, c.cl) AS rn"
            f" FROM q CROSS JOIN {prev} c) t WHERE rn = 1)"
        )
        if it < iters:
            parts.append(
                f"s{it} AS (SELECT a.cluster AS cl, g.i,"
                f" CAST(SUM(q.v[g.i]) AS BIGINT) AS s, COUNT(*) AS n"
                f" FROM a{it} a JOIN q USING ({id_col}) CROSS JOIN dims g"
                f" GROUP BY a.cluster, g.i)"
            )
            parts.append(
                f"n{it} AS (SELECT cl, list(c ORDER BY i) AS v FROM ("
                f"SELECT cl, i, CAST(CASE WHEN s >= 0"
                f" THEN (2*s + n) // (2*n)"
                f" ELSE -((2*(-s) + n) // (2*n)) END AS BIGINT) AS c"
                f" FROM s{it}) t GROUP BY cl)"
            )
            parts.append(
                f"c{it} AS (SELECT p.cl, COALESCE(nn.v, p.v) AS v"
                f" FROM {prev} p LEFT JOIN n{it} nn USING (cl))"
            )
            prev = f"c{it}"
    return ",\n    ".join(parts), f"a{iters}"


def write_centroids(
    spark,
    centroids: list[list[int]],
    path: str,
    meta: dict | None = None,
) -> None:
    """Persist a fitted centroid set as a tiny parquet model artifact
    (cluster id, integer centroid vector, optional metadata JSON) — the
    train-once/apply-everywhere seam: a batch job fits on the corpus
    sample, every later batch or streaming assignment loads the model
    and stays map-only. Integer centroids round-trip exactly (no float
    serialization drift)."""
    import json as _json

    rows = [
        (j, [int(x) for x in c], _json.dumps(meta or {}, sort_keys=True))
        for j, c in enumerate(centroids)
    ]
    spark.createDataFrame(
        rows, "cluster int, centroid array<long>, meta string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_centroid_model(spark, path: str) -> tuple[list[list[int]], dict]:
    """Load a centroid model written by write_centroids: (centroids in
    cluster-id order, the meta dict stored at write time). Malformed
    models raise ValueError (empty, duplicate ids, gapped ids, NULL
    vector elements, ragged/mismatched dimensions) — callers can trust
    a returned model. The dimension check matters downstream:
    assign_clusters builds the distance with zip_with, which pads a
    short vector with NULLs and would silently misassign instead of
    erroring (r7 advice)."""
    import json as _json

    rows = spark.read.parquet(path).orderBy("cluster").collect()
    if not rows:
        raise ValueError(f"empty centroid model at {path}")
    ids = [r["cluster"] for r in rows]
    if len(set(ids)) != len(ids):
        raise ValueError(
            f"centroid model at {path} has duplicate cluster ids"
        )
    if ids != list(range(len(rows))):
        raise ValueError(
            f"centroid model at {path} has non-contiguous cluster ids"
        )
    centroids = []
    for r in rows:
        if r["centroid"] is None or any(x is None for x in r["centroid"]):
            raise ValueError(
                f"centroid model at {path} has NULL vector elements "
                f"(cluster {r['cluster']})"
            )
        centroids.append([int(x) for x in r["centroid"]])
    dims = {len(c) for c in centroids}
    if len(dims) != 1:
        raise ValueError(
            f"centroid model at {path} has ragged dimensions {sorted(dims)}"
        )
    meta = _json.loads(rows[0]["meta"]) if rows[0]["meta"] else {}
    expected = meta.get("dim")
    if expected is not None and int(expected) != dims.pop():
        raise ValueError(
            f"centroid model at {path} dimension mismatch: meta dim="
            f"{expected}, vectors are {len(centroids[0])}-long"
        )
    return centroids, meta


def read_centroids(spark, path: str) -> list[list[int]]:
    """Centroids only — see read_centroid_model for the meta dict."""
    return read_centroid_model(spark, path)[0]


def greedy_init(
    quantized: DataFrame, k: int, id_col: str = "vec_id"
) -> list[list[int]]:
    """Deterministic farthest-point (k-center / Gonzalez) seeding: start
    from the lowest-id vector, then repeatedly take the point with the
    MAXIMUM distance to its nearest chosen seed (ties broken by lowest
    id). Spreads seeds across the data — on duplicate-heavy real corpora
    the lowest-id default can pick near-identical seeds; this RAISES if
    the corpus has fewer than k distinct points instead of silently
    duplicating seeds.

    Exactness: distances are the same integer d2 as assignment, and the
    argmax tie-break is total, so the seed set is a pure function of the
    data — no RNG, partition-order independent, SQL-replayable (k-1
    unrolled argmax rounds). Driver cost: k-1 bounded collects of one
    struct each; each round is ONE aggregation pass over the corpus —
    max of (d2, -id, v), the vector riding inside the struct, so there
    is no join back to recover it."""
    first = quantized.orderBy(id_col).limit(1).collect()
    if not first:
        raise ValueError("greedy_init on an empty corpus")
    seeds = [[int(x) for x in first[0]["v"]]]
    v = F.col("v")
    for _ in range(k - 1):
        qq = _dot_long(v, v)
        legs = []
        for c in seeds:
            c_lit = _long_array_lit(c)
            cc = int(sum(x * x for x in c))
            legs.append(
                qq - 2 * _dot_long(v, c_lit) + F.lit(cc).cast("long")
            )
        min_d2 = F.array_min(F.array(*legs))
        far = quantized.agg(
            F.max(
                F.struct(
                    min_d2.alias("d2"),
                    (-F.col(id_col)).alias("nid"),
                    v.alias("v"),
                )
            ).alias("b")
        ).collect()[0]["b"]
        if far["d2"] == 0:
            raise ValueError(
                f"greedy_init needs at least k={k} distinct points; "
                f"the corpus has only {len(seeds)}"
            )
        seeds.append([int(x) for x in far["v"]])
    return seeds
