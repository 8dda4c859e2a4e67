"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path besides hyperplane LSH (operators/similarity.py):
a coarse k-means quantizer partitions the corpus into cells; a query
probes only its `nprobe` nearest cells. At 100 TB the corpus is stored
bucketed/partitioned BY CELL, so a query touches nprobe partitions
instead of the full corpus — the classic IVF trade of recall for scan
fraction.

Training uses pyspark.ml KMeans (seeded) on the corpus sample; cell
assignment is the model's own JVM-side transform. Query→cell probing
happens driver-side with numpy over the (tiny) centroid matrix.
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _as_double, cosine_expr


def train_quantizer(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    sample_fraction: float = 1.0,
):
    """Seeded coarse quantizer. At scale, fit on a sample (the quantizer
    only needs the coarse geometry, not every vector)."""
    train = corpus.select(
        array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    if sample_fraction < 1.0:
        train = train.sample(fraction=sample_fraction, seed=seed)
    return KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)


def assign_cells(
    corpus: DataFrame,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, vector) — the inverted file. In production this is the
    DataFrame you write out `partitionBy("cell")`."""
    vectored = corpus.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("dvec"),
        array_to_vector(_as_double(F.col(vec_col))).alias("features"),
    )
    return model.transform(vectored).select(
        "vec_id", F.col("prediction").alias("cell"), "dvec"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    model=None,
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest cells per query, exact
    cosine inside them. Returns (query_id, vec_id, cosine, rank)."""
    spark = corpus.sparkSession
    model = model or train_quantizer(corpus, vec_col, n_cells)
    inverted = assign_cells(corpus, model, id_col, vec_col)

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    ).collect()  # query set is small by definition
    probe_rows = []
    for r in qrows:
        qv = np.array(r["qvec"])
        d2 = ((centers - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d2)[:nprobe]:
            probe_rows.append((r["query_id"], int(cell), r["qvec"]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int, qvec array<double>"
    )

    cands = inverted.join(F.broadcast(probes), "cell")
    scored = cands.select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qvec"), F.col("dvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )
