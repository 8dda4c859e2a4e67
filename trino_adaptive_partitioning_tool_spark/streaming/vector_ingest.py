"""Streaming vector ingest → LSH bucket enrichment (stream-static join).

The continuous-ingest half of the similarity surface: new embedding
vectors arrive as a stream, each micro-batch computes the SAME quantized
sign-random-projection signatures as the batch LSH path
(operators/similarity._signature_udf — one int64 matmul per Arrow
batch), and the signatures join a STATIC pre-bucketed corpus on
(table_idx, signature).

Determinism argument: the join is stream-static and stateless, so the
emitted candidate set is the union over micro-batches of per-batch inner
joins — invariant to how the feed slices. Ranking (exact cosine top-k)
runs once at drain time over the materialized candidates
(operators/similarity.rank_candidates), so the end result equals the
batch `lsh_bucketed_topk` for the same query set exactly — which is the
DuckDB-oracle contract of `streaming_similarity_ingest`.

At scale: the corpus signature frame is corpus-sized — it is NOT
broadcast; Spark shuffles each micro-batch's (tiny) signature set
against it hash-partitioned on the bucket key. A production deployment
would persist the corpus buckets partitioned by (table_idx, signature)
so each arriving batch probes only matching partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import similarity as sim


def bucket_signatures(
    vecs: DataFrame,
    out_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(out_id, table_idx, signature) bucket keys for every vector —
    works identically on a static frame or a streaming one (the
    signature UDF is stateless)."""
    sig_udf = sim._signature_udf(n_planes, n_tables, dim)
    return vecs.select(
        F.col(id_col).alias(out_id),
        F.posexplode(sig_udf(sim._as_double(F.col(vec_col)))).alias(
            "table_idx", "signature"
        ),
    )


def ingest_candidates(
    stream_vecs: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Streaming (query_id, vec_id) candidate pairs: the stream side's
    per-batch signatures equi-joined against the static corpus buckets.
    Append-mode safe with no watermark (stateless join); duplicates
    across tables are expected and deduplicated at rank time."""
    c = bucket_signatures(
        corpus, "vec_id", id_col, vec_col, n_planes, n_tables, dim
    )
    q = bucket_signatures(
        stream_vecs, "query_id", id_col, vec_col, n_planes, n_tables, dim
    )
    return q.join(c, ["table_idx", "signature"]).select("query_id", "vec_id")
