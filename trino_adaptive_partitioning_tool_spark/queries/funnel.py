"""Corpus preprocessing funnel: the end-to-end training-data filter
pipeline as ONE query.

Real LLM corpus preparation is a SEQUENCE of filters — language check,
quality score, repetition cut, exact dedup, near-dedup — and what
matters operationally is the ATTRITION at each stage (how many documents
and tokens survive). This query composes the engine's own operators
(language_id, quality_scores, repetition_stats, keep-canonical,
MinHash-LSH → exact-Jaccard verify → connected components) into that
funnel and reports one row per stage:

    (stage_idx, stage, n_docs, n_tokens)

The oracle nests the REGISTERED sub-oracles verbatim (language, quality,
repetition — each already hash-green), chains the same filters in SQL,
replays the minhash sketch over the filtered CTE (the `source` parameter
of the sig CTEs), and closes near-dup clusters with a recursive CTE — so
one digest row certifies the whole pipeline composition, not just its
parts.

Scale shape: every stage is a filter or equi-join keyed on doc_id/text
(shuffle-safe); pair generation runs over stage-4 SURVIVORS only (the
standard pipeline order — dedup last, on the already-shrunk corpus), and
clustering goes through the size-adaptive connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dops
from ..operators import graph
from ..operators import text as tops
from ..operators.dedup import tokens_expr
from ..sources import tables
from . import dedup as qdedup
from . import text as qtext
from .registry import register

QUALITY_MIN = 37.0
REPETITION_MAX = 0.08
JACCARD_MIN = 0.7

_STAGES = (
    "input",
    "lang_consistent",
    "quality",
    "repetition",
    "exact_dedup",
    "near_dedup",
)


def _funnel_oracle() -> str:
    # nest the REGISTERED sub-oracles verbatim (qtext is imported above,
    # so they are in the registry by the time this builder runs)
    from . import registry as _registry

    lang_sql = _registry._ORACLES["text_language_id"]
    quality_sql = _registry._ORACLES["text_quality_scores"]
    rep_sql = _registry._ORACLES["text_repetition_stats"]
    toks = qtext._TOKS
    # same scoped MATERIALIZED treatment as the extended funnel: DuckDB
    # inlines CTEs per reference, re-executing the sketch per stage leg
    # (measured 49s -> 0.5s at sf0.01); execution hint only
    sig_ctes = qdedup._minhash_sig_ctes(source="s4", prefix="m").replace(
        "msig AS (", "msig AS MATERIALIZED (")
    banded = qdedup._minhash_banded_cte(source="msig").replace(
        "banded AS (", "banded AS MATERIALIZED (")
    jac = (
        "ROUND(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)"
        " / len(list_distinct(list_concat(ta.toks, tb.toks))), 4)"
    )
    stage_legs = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage_idx, '{name}' AS stage,"
        f" COUNT(*) AS n_docs,"
        f" CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens"
        f" FROM {src}"
        for i, (name, src) in enumerate(
            zip(_STAGES, ["base", "s1", "s2", "s3", "s4", "s5"])
        )
    )
    return f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, lang, text, len({toks}) AS n_tokens FROM documents
    ),
    langp AS (SELECT doc_id, predicted_lang FROM ({lang_sql}) q),
    quals AS (SELECT doc_id, quality_score FROM ({quality_sql}) q),
    reps AS (SELECT doc_id, dup_bigram_ratio FROM ({rep_sql}) q),
    s1 AS (
      SELECT b.* FROM base b JOIN langp l USING (doc_id)
      WHERE l.predicted_lang = b.lang
    ),
    s2 AS (
      SELECT s1.* FROM s1 JOIN quals USING (doc_id)
      WHERE quality_score >= {QUALITY_MIN}
    ),
    s3 AS MATERIALIZED (
      SELECT s2.* FROM s2 LEFT JOIN reps USING (doc_id)
      WHERE COALESCE(dup_bigram_ratio, 0.0) <= {REPETITION_MAX}
    ),
    s4 AS MATERIALIZED (
      SELECT s3.* FROM s3
      JOIN (SELECT text, MIN(doc_id) AS mn FROM s3 GROUP BY text) c
        ON s3.text = c.text AND s3.doc_id = c.mn
    ),
    {sig_ctes},
    {banded},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    dtok AS MATERIALIZED (SELECT doc_id, list_distinct({toks}) AS toks FROM documents),
    verified AS (
      SELECT c.id_a, c.id_b FROM cand c
      JOIN dtok ta ON ta.doc_id = c.id_a
      JOIN dtok tb ON tb.doc_id = c.id_b
      WHERE {jac} >= {JACCARD_MIN}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION
      SELECT id_b AS src, id_a AS dst FROM verified
    ),
    reach(node, root) AS (
      SELECT DISTINCT src AS node, src AS root FROM edges
      UNION
      SELECT e.dst AS node, r.root FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS MATERIALIZED (SELECT node, MIN(root) AS rep FROM reach GROUP BY node),
    s5 AS (
      SELECT s4.* FROM s4
      LEFT JOIN labels ON s4.doc_id = labels.node
      WHERE labels.node IS NULL OR labels.rep = s4.doc_id
    )
    SELECT * FROM (
    {stage_legs}
    ) funnel ORDER BY stage_idx
    """


@register("corpus_filter_funnel", oracle=_funnel_oracle(), memo=True)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage document/token attrition of the full preprocessing
    funnel (see module docstring). Composes only already-verified
    operators; the oracle replays the identical chain in SQL, including
    the minhash sketch over survivors and a recursive-CTE closure for
    the near-dup clusters."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from ..operators.dedup import ensure_parallelism

    docs = tables.load_table(spark, sf_dir, "documents")
    # r13 (guide §2.4): the language and quality annotators are pure
    # column expressions, so they are computed INLINE in the one
    # annotated pass — the previous structure projected each into its
    # own frame and joined it back on doc_id, paying two doc-grain
    # joins (and two extra corpus scans) for values derivable in the
    # scan projection. Repetition stays a left join: it is an
    # aggregation-based annotator (its map-only array form measured
    # 2.4x slower — see operators/text.repetition_stats r13 note).
    # ensure_parallelism spreads the now-single annotator projection
    # when the scan cannot (single-row-group local files); a no-op on
    # well-split 100 TB inputs.
    reps = tops.repetition_stats(docs).select("doc_id", "dup_bigram_ratio")

    # ONE annotated pass instead of six sequential sub-DataFrames: each
    # per-stage predicate becomes a boolean column, sequential survival
    # is the prefix-AND, and the funnel counts come from conditional
    # sums over a single aggregate — six stage legs re-executing the
    # whole filter chain (6x corpus scans and ~100 plan exchanges at
    # scale) collapse into one.
    lang_ok = F.col("predicted_lang") == F.col("lang")
    qual_ok = F.col("quality_score") >= QUALITY_MIN
    rep_ok = F.coalesce(F.col("dup_bigram_ratio"), F.lit(0.0)) <= REPETITION_MAX
    # The repetition annotator joins left so stage 0 is unconditionally
    # the full corpus (the stage predicates null-guard via the boolean
    # columns: a null flag counts as not-surviving, never as dropped
    # from the input row count). The annotated frame is persisted: BOTH
    # consumers (the survivor chain and the final conditional
    # aggregate) previously re-ran the annotator joins per reference.
    ann = (
        ensure_parallelism(docs)
        .select(
            "doc_id", "lang", "text",
            F.size(tokens_expr("text")).cast("bigint").alias("n_tokens"),
            tops.predicted_lang_col("text").alias("predicted_lang"),
            tops.quality_score_col("text").alias("quality_score"),
        )
        .join(reps, "doc_id", "left")
        .select(
            "doc_id", "text", "n_tokens",
            lang_ok.alias("lang_ok"),
            (lang_ok & qual_ok).alias("s2_ok"),
            (lang_ok & qual_ok & rep_ok).alias("s3_ok"),
        )
        # r14 (guide §5; r13 verdict #3): MEMORY_AND_DISK — this frame
        # is corpus-sized AND carries the text payload, so MEMORY_ONLY
        # eviction at scale would re-run both annotators per consumer
        # (the exact cost the persist exists to kill). `text` cannot be
        # projected out: the dedup leg below consumes it (window
        # partition key + minhash input); the flags-only alternative
        # re-attaches text with an extra doc-grain join + corpus scan.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # exact dedup among stage-3 survivors: canonical = lowest doc_id per
    # text (rank-1 window over the survivor partition)
    w = Window.partitionBy("text").orderBy("doc_id")
    s4 = (
        ann.where("s3_ok")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        # referenced by pair generation, the near-dup flag join and the
        # final aggregate — cache one materialization (memo keeps the
        # plan, so the cache is hit on every call). MEMORY_AND_DISK
        # (r14): survivor-sized but text-carrying — spill, don't evict.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cands = dops.minhash_lsh_pairs(
        s4.select("doc_id", "text"), jaccard_threshold=0.0
    ).select("id_a", "id_b")
    verified = dops.token_jaccard_pairs(
        s4.select("doc_id", "text"), cands, threshold=JACCARD_MIN
    ).select("id_a", "id_b")
    comp = graph.connected_components(verified, "id_a", "id_b")
    non_reps = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id"), F.lit(True).alias("is_dup")
    )
    # No broadcast hint: non_reps is proportional to the duplicate count
    # (30-50 % of a web corpus), i.e. corpus-scale — let AQE broadcast
    # only when it actually fits.
    flagged = (
        s4.join(non_reps, "doc_id", "left")
        .select(
            "doc_id",
            F.lit(True).alias("s4_ok"),
            F.coalesce(~F.col("is_dup"), F.lit(True)).alias("s5_ok"),
        )
    )
    final = ann.join(flagged, "doc_id", "left").select(
        "n_tokens", "lang_ok", "s2_ok", "s3_ok",
        F.coalesce(F.col("s4_ok"), F.lit(False)).alias("s4_ok"),
        F.coalesce(F.col("s5_ok"), F.lit(False)).alias("s5_ok"),
    )
    flags = [F.lit(True), F.col("lang_ok"), F.col("s2_ok"),
             F.col("s3_ok"), F.col("s4_ok"), F.col("s5_ok")]
    aggs = []
    for i, flag in enumerate(flags):
        aggs.append(
            F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias(f"n{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(flag, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias(f"t{i}")
        )
    one = final.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{name}', n{i}, t{i}" for i, name in enumerate(_STAGES)
    )
    return one.selectExpr(
        f"stack(6, {stack_args}) AS (stage_idx, stage, n_docs, n_tokens)"
    ).orderBy("stage_idx")


# ---------------------------------------------------------------------------
# Extended funnel: v1's five filters plus the round-6 stages — the
# model-quality gate (hashed linear classifier, weight_sum >= 0) before
# dedup, and a span-level dedup cut (cross-document duplicated-span
# ratio over the near-dedup SURVIVORS) after it. Registered separately
# so the certified v1 flagship stays untouched.
# ---------------------------------------------------------------------------
SPAN_RATIO_MAX = 0.35
SPAN_STAGE_N = 3  # trigram spans: post-dedup survivors share no 8-gram
# spans at parity scale, so the stage would be a no-op there; trigram
# granularity makes the cut observable (and therefore certified) while
# the operator itself defaults to n=8 for production corpora
_EXT_STAGES = (
    "input",
    "lang_consistent",
    "quality",
    "repetition",
    "model_quality",
    "exact_dedup",
    "near_dedup",
    "span_dedup",
)


def _funnel_extended_oracle() -> str:
    from . import registry as _registry
    from .text import _model_weight_sum_sql, _ngram_hash_cte

    lang_sql = _registry._ORACLES["text_language_id"]
    quality_sql = _registry._ORACLES["text_quality_scores"]
    rep_sql = _registry._ORACLES["text_repetition_stats"]
    toks = qtext._TOKS
    # MATERIALIZED: DuckDB inlines CTEs per reference, and the 16
    # banded legs + stage legs would re-execute the minhash sketch per
    # reference (minutes at sf0.01). Execution hint only — results
    # unchanged. Applied per-fragment: "sig" is shadowed inside the
    # nested quality sub-oracle and a global replace trips DuckDB's
    # duplicate-alias binder check.
    sig_ctes = qdedup._minhash_sig_ctes(source="s5", prefix="m").replace(
        "msig AS (", "msig AS MATERIALIZED (")
    banded = qdedup._minhash_banded_cte(source="msig").replace(
        "banded AS (", "banded AS MATERIALIZED (")
    jac = (
        "ROUND(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)"
        " / len(list_distinct(list_concat(ta.toks, tb.toks))), 4)"
    )
    stage_legs = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage_idx, '{name}' AS stage,"
        f" COUNT(*) AS n_docs,"
        f" CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens"
        f" FROM {src}"
        for i, (name, src) in enumerate(
            zip(_EXT_STAGES, ["base", "s1", "s2", "s3", "s4", "s5", "s6", "s7"])
        )
    )
    return f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, lang, text, len({toks}) AS n_tokens FROM documents
    ),
    langp AS (SELECT doc_id, predicted_lang FROM ({lang_sql}) q),
    quals AS (SELECT doc_id, quality_score FROM ({quality_sql}) q),
    reps AS (SELECT doc_id, dup_bigram_ratio FROM ({rep_sql}) q),
    mq AS (
      SELECT doc_id, {_model_weight_sum_sql(toks)} AS weight_sum
      FROM documents
    ),
    s1 AS (
      SELECT b.* FROM base b JOIN langp l USING (doc_id)
      WHERE l.predicted_lang = b.lang
    ),
    s2 AS (
      SELECT s1.* FROM s1 JOIN quals USING (doc_id)
      WHERE quality_score >= {QUALITY_MIN}
    ),
    s3 AS MATERIALIZED (
      SELECT s2.* FROM s2 LEFT JOIN reps USING (doc_id)
      WHERE COALESCE(dup_bigram_ratio, 0.0) <= {REPETITION_MAX}
    ),
    s4 AS MATERIALIZED (
      SELECT s3.* FROM s3 JOIN mq USING (doc_id) WHERE weight_sum >= 0
    ),
    s5 AS MATERIALIZED (
      SELECT s4.* FROM s4
      JOIN (SELECT text, MIN(doc_id) AS mn FROM s4 GROUP BY text) c
        ON s4.text = c.text AND s4.doc_id = c.mn
    ),
    {sig_ctes},
    {banded},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    dtok AS MATERIALIZED (SELECT doc_id, list_distinct({toks}) AS toks FROM documents),
    verified AS (
      SELECT c.id_a, c.id_b FROM cand c
      JOIN dtok ta ON ta.doc_id = c.id_a
      JOIN dtok tb ON tb.doc_id = c.id_b
      WHERE {jac} >= {JACCARD_MIN}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION
      SELECT id_b AS src, id_a AS dst FROM verified
    ),
    reach(node, root) AS (
      SELECT DISTINCT src AS node, src AS root FROM edges
      UNION
      SELECT e.dst AS node, r.root FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS MATERIALIZED (SELECT node, MIN(root) AS rep FROM reach GROUP BY node),
    s6 AS MATERIALIZED (
      SELECT s5.* FROM s5
      LEFT JOIN labels ON s5.doc_id = labels.node
      WHERE labels.node IS NULL OR labels.rep = s5.doc_id
    ),
    {_ngram_hash_cte(SPAN_STAGE_N, source="s6", prefix="sp_").replace(
        "sp_e AS (", "sp_e AS MATERIALIZED (")},
    sp_df AS (SELECT h, COUNT(*) AS ndocs FROM sp_e GROUP BY h),
    sp_ratio AS (
      SELECT e.doc_id,
             CAST(ROUND(CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE) AS VARCHAR)::DECIMAL(38,12), 6)
               AS DOUBLE) AS ratio
      FROM sp_e e JOIN sp_df USING (h)
      GROUP BY e.doc_id
    ),
    s7 AS (
      SELECT s6.* FROM s6
      LEFT JOIN sp_ratio r ON s6.doc_id = r.doc_id
      WHERE r.doc_id IS NULL OR r.ratio <= {SPAN_RATIO_MAX}
    )
    SELECT * FROM (
    {stage_legs}
    ) funnel ORDER BY stage_idx
    """


@register(
    "corpus_filter_funnel_extended",
    oracle=_funnel_extended_oracle(),
    memo=True,
)
def corpus_filter_funnel_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v1 funnel plus two round-6 stages: a model-quality gate
    (hashed-linear-classifier weight_sum >= 0, map-only) before dedup,
    and a span-level dedup cut (cross-document duplicated-span ratio
    over the NEAR-DEDUP SURVIVORS <= SPAN_RATIO_MAX = 0.35) after it — the full
    eight-stage corpus curation pipeline, composed exclusively from
    individually-oracled operators, certified end to end as one row per
    stage."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from ..operators import text as textops
    from ..operators.dedup import ensure_parallelism

    docs = tables.load_table(spark, sf_dir, "documents")
    # r13: same restructure as the v1 funnel (see corpus_filter_funnel)
    # — language/quality/model annotators are inline column expressions
    # in ONE spread projection; repetition (aggregation-based) stays the
    # single annotator left join; the annotated frame is persisted for
    # its two consumers.
    reps = tops.repetition_stats(docs).select("doc_id", "dup_bigram_ratio")

    lang_ok = F.col("predicted_lang") == F.col("lang")
    qual_ok = F.col("quality_score") >= QUALITY_MIN
    rep_ok = F.coalesce(F.col("dup_bigram_ratio"), F.lit(0.0)) <= REPETITION_MAX
    model_ok = textops.model_weight_sum_col("text") >= 0
    ann = (
        ensure_parallelism(docs)
        .select(
            "doc_id", "lang", "text",
            F.size(tokens_expr("text")).cast("bigint").alias("n_tokens"),
            tops.predicted_lang_col("text").alias("predicted_lang"),
            tops.quality_score_col("text").alias("quality_score"),
        )
        .join(reps, "doc_id", "left")
        .select(
            "doc_id", "text", "n_tokens",
            lang_ok.alias("lang_ok"),
            (lang_ok & qual_ok).alias("s2_ok"),
            (lang_ok & qual_ok & rep_ok).alias("s3_ok"),
            (lang_ok & qual_ok & rep_ok & model_ok).alias("s4_ok"),
        )
        # r14 (guide §5): corpus-sized + text payload — spill, don't
        # evict (see corpus_filter_funnel's ann for the full rationale)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    s5 = (
        ann.where("s4_ok")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cands = dops.minhash_lsh_pairs(
        s5.select("doc_id", "text"), jaccard_threshold=0.0
    ).select("id_a", "id_b")
    verified = dops.token_jaccard_pairs(
        s5.select("doc_id", "text"), cands, threshold=JACCARD_MIN
    ).select("id_a", "id_b")
    comp = graph.connected_components(verified, "id_a", "id_b")
    non_reps = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id"), F.lit(True).alias("is_dup")
    )
    s6 = (
        s5.join(non_reps, "doc_id", "left")
        .where(F.coalesce(~F.col("is_dup"), F.lit(True)))
        .drop("is_dup")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # skew_safe pinned False: the span stage runs over near-dedup
    # SURVIVORS (boilerplate documents largely removed), and the
    # composed pipeline wants a build-time-action-free, stable plan
    spans = textops.duplicate_span_stats(
        s6.select("doc_id", "text"), n=SPAN_STAGE_N, skew_safe=False
    ).select("doc_id", "shared_span_ratio")
    flagged = (
        s6.join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.lit(True).alias("s6_ok"),
            (
                F.col("shared_span_ratio").isNull()
                | (F.col("shared_span_ratio") <= SPAN_RATIO_MAX)
            ).alias("s7_ok"),
        )
    )
    s5_flags = s5.select("doc_id", F.lit(True).alias("s5_ok"))
    final = (
        ann.join(s5_flags, "doc_id", "left")
        .join(flagged, "doc_id", "left")
        .select(
            "n_tokens", "lang_ok", "s2_ok", "s3_ok", "s4_ok",
            F.coalesce(F.col("s5_ok"), F.lit(False)).alias("s5_ok"),
            F.coalesce(F.col("s6_ok"), F.lit(False)).alias("s6_ok"),
            F.coalesce(F.col("s7_ok"), F.lit(False)).alias("s7_ok"),
        )
    )
    flags = [F.lit(True), F.col("lang_ok"), F.col("s2_ok"), F.col("s3_ok"),
             F.col("s4_ok"), F.col("s5_ok"), F.col("s6_ok"), F.col("s7_ok")]
    aggs = []
    for i, flag in enumerate(flags):
        aggs.append(
            F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias(f"n{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(flag, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias(f"t{i}")
        )
    one = final.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{name}', n{i}, t{i}" for i, name in enumerate(_EXT_STAGES)
    )
    return one.selectExpr(
        f"stack(8, {stack_args}) AS (stage_idx, stage, n_docs, n_tokens)"
    ).orderBy("stage_idx")
