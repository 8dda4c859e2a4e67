"""Deduplication operators for LLM-training-data pipelines.

Not present in the reference (its surface stops at partition advice); these
are the BASELINE.json extension operators, designed for 100 TB first:

  exact_duplicates      one hash-aggregate shuffle on the dedup key
  minhash_signatures    shingle → k minhashes, one explode + one groupBy
  minhash_lsh_pairs     band-bucket join → candidate pairs → exact-Jaccard
                        verify (the standard MinHash-LSH pipeline: no
                        all-pairs product ever materializes)
  simhash_signatures    64-bit simhash via per-bit vote aggregation
  simhash_near_pairs    hamming-banded candidate generation
  token_jaccard_pairs   exact token-set Jaccard for a candidate pair set

Scale notes: every pairing step goes through an equi-join on a bucket key
(band hash / simhash chunk), so the shuffle is proportional to data +
candidate volume, never to n². Hash functions are Spark's xxhash64 with
per-plane seeds — deterministic across runs and executors, no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16  # 16 bands x 4 rows: catches J >~ 0.6 w.h.p.
DEFAULT_SHINGLE_K = 3


def tokens_expr(text_col: str = "text"):
    """Lowercased whitespace tokens (empty strings filtered)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )


def shingles_expr(tokens, k: int = DEFAULT_SHINGLE_K):
    """k-token shingles of a token array (distinct), JVM-side only:
    transform over a sliding index sequence + concat_ws."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k))),
        ).otherwise(F.array(F.concat_ws(" ", tokens)))
    )


def exact_duplicates(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Groups of rows identical on key_cols; one shuffle on the key hash."""
    return (
        df.groupBy(*key_cols)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def _xor_family_constants(n: int) -> list[int]:
    """Deterministic 64-bit XOR constants for the minhash family (seeded,
    signed-int64 range for Spark lit compatibility)."""
    import numpy as np

    rng = np.random.default_rng(1234567)
    return [int(x) for x in rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """(id, minhash array<bigint>) — XOR-fold minhash family: each shingle
    is xxhash64'd ONCE (the expensive string hash), then the i-th family
    member is min over shingles of (hash XOR C_i) for fixed constants C_i.

    Shape: explode shingles → 64 codegen'd `min(h XOR C_i)` aggregates in
    ONE groupBy (map-side partial min → the shuffle carries 64 longs per
    doc regardless of document length). Deliberately NOT a nested
    array-transform expression: Spark's higher-order array functions run
    on the interpreted path and allocate an intermediate array per
    (constant x row) — measured 50x slower than this codegen'd aggregate
    form at sf0.1.
    """
    from pyspark.sql import Window

    consts = _xor_family_constants(num_hashes)
    # Shingle hashing entirely in codegen: hash each token once, then a
    # k-token shingle hash is xxhash64 over k consecutive token hashes
    # (lead() window per doc). No string concatenation, no interpreted
    # array HOFs — the per-token shuffle this costs is the same magnitude
    # as the minhash groupBy that follows anyway.
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("pos", "token"),
    ).where(F.col("token") != "")
    w = Window.partitionBy("id").orderBy("pos")
    th = F.xxhash64("token")
    lead_hashes = [th] + [
        F.xxhash64(F.lead("token", i).over(w)) for i in range(1, shingle_k)
    ]
    # No distinct() on (id, h): min(h XOR c) over a multiset equals min
    # over the set, so duplicate shingles can't change any signature —
    # and dropping it removes a whole extra shuffle of the shingle
    # stream. The window already hash-partitioned by id, so the groupBy
    # below reuses that distribution with no further exchange.
    shingled = toks.select(
        "id",
        F.when(
            F.lead("token", shingle_k - 1).over(w).isNotNull(),
            F.xxhash64(*lead_hashes),
        ).alias("h"),
    ).where(F.col("h").isNotNull())
    # documents shorter than k tokens have no complete shingle — they
    # contribute one whole-text hash so they still get a signature
    short = docs.select(
        F.col(id_col).alias("id"),
        F.xxhash64(F.lower(F.trim(F.col(text_col)))).alias("h"),
    ).where(
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) < shingle_k
    )
    shingled = shingled.unionByName(short)
    aggs = [
        F.min(F.col("h").bitwiseXOR(F.lit(c).cast("bigint"))).alias(f"h{i}")
        for i, c in enumerate(consts)
    ]
    return (
        shingled.groupBy("id")
        .agg(*aggs)
        .select(
            "id",
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias(
                "minhash"
            ),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard, n_common_bands).

    Pipeline: signatures → band hashes → self-join on (band, band_hash) →
    distinct candidate pairs → estimated Jaccard from full signature
    agreement → threshold filter. The self-join is on the band-hash key,
    so only docs sharing a band collide (candidate volume, not n²).
    """
    rows_per_band = num_hashes // bands
    # materialize signatures before the self-join: the map-only signature
    # plan has no shuffle boundary, so without this both join sides (x 16
    # bands) would re-evaluate the whole tokenize→shingle→hash expression
    # tree. Signatures are tiny (num_hashes longs per doc) — cache is the
    # standard LSH pipeline barrier at any scale.
    sigs = minhash_signatures(
        docs, id_col, text_col, num_hashes, shingle_k
    ).cache()

    banded = sigs.select(
        "id",
        "minhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("minhash"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("id", "minhash", "bh.band", "bh.band_hash")

    left = banded.select(
        F.col("id").alias("id_a"),
        F.col("minhash").alias("mh_a"),
        "band",
        "band_hash",
    )
    right = banded.select(
        F.col("id").alias("id_b"),
        F.col("minhash").alias("mh_b"),
        "band",
        "band_hash",
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.first("mh_a").alias("mh_a"),
            F.first("mh_b").alias("mh_b"),
            F.count(F.lit(1)).alias("n_common_bands"),
        )
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda a, b: a == b),
            lambda x: x,
        )
    ).cast("double") / F.lit(float(DEFAULT_NUM_HASHES if num_hashes is None else num_hashes))
    return (
        pairs.withColumn("est_jaccard", F.round(est, 4))
        .where(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard", "n_common_bands")
    )


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, simhash bigint) — classic simhash: each token votes ±1 on every
    bit of its 64-bit hash; the sign vector becomes the fingerprint.

    One explode + one groupBy; the per-bit votes are a fixed-width array
    aggregated with zip_with sums (JVM-side, no UDF).
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(text_col)).alias("token"),
    ).withColumn("th", F.xxhash64("token"))
    # per-bit ±1 vote columns, summed map-side in ONE groupBy (shiftright
    # needs a Python-int bit count, so the 64 bits unroll here, not in a
    # transform() lambda)
    vote_aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy("id").agg(*vote_aggs)
    # sign vector → bigint; bit 63's mask is long-min (1<<63 overflows
    # int64, and Spark 4 ANSI mode makes overflow an error, not a wrap)
    sim = F.lit(0).cast("bigint")
    for i in range(bits):
        mask = (1 << i) if i < 63 else -(1 << 63)
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.lit(mask).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return per_doc.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Pairs within `max_hamming` bits. Candidate generation by the
    pigeonhole trick: split 64 bits into `chunks` 16-bit chunks — any pair
    within max_hamming ≤ chunks-1 must agree on ≥1 chunk, so the join key
    is (chunk_idx, chunk_value), never all-pairs."""
    sigs = simhash_signatures(docs, id_col, text_col)
    width = 64 // chunks
    mask = (1 << width) - 1
    chunk_structs = [
        F.struct(
            F.lit(i).alias("chunk_idx"),
            F.shiftright(F.col("simhash"), i * width)
            .bitwiseAND(F.lit(mask))
            .alias("chunk_val"),
        )
        for i in range(chunks)
    ]
    chunked = sigs.select(
        "id",
        "simhash",
        F.explode(F.array(*chunk_structs)).alias("c"),
    ).select("id", "simhash", "c.chunk_idx", "c.chunk_val")

    left = chunked.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"),
        "chunk_idx", "chunk_val",
    )
    right = chunked.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"),
        "chunk_idx", "chunk_val",
    )
    cands = (
        left.join(right, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def token_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact distinct-token Jaccard for given (id_a, id_b) pairs — the
    verify stage after LSH candidate generation. Joins token sets in,
    computes |A∩B| / |A∪B| with array intrinsics."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens_expr(text_col)).alias("toks"),
    )
    a = tok.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = tok.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    return (
        candidate_pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", F.round(F.when(union > 0, inter / union).otherwise(0.0), 4)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
