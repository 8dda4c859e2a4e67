"""Digest suites: fold verified queries into single checked rows.

The driver's correctness gate checks the FIRST 50 registered queries
(registration order). Rounds 1-2 proved more than 50 queries green, and
round 3 adds the LLM-pipeline flagships to the checked window — so the
lower-traffic relational/grouping/function queries are *folded*: each
digest query re-executes the original registered queries and reduces
every result to one row

    (op, n_rows, key_hash, num_sum)

where ``key_hash`` is an order-independent sum of a 36-bit md5 hash over
the exact-typed columns (strings / integers) of every row, and
``num_sum`` is an exact DECIMAL sum of the double columns rounded to 4
decimals (>= the intrinsic decimal precision of the money-typed data, so
engine-side fp accumulation noise cannot flip a rounding boundary).
The DuckDB oracle applies the identical reduction to the original
oracle SQL, so a digest row is green iff the full underlying result
still matches the oracle value-for-value on its exact columns and to 4
decimals on its double columns.

The folded queries all remain individually registered (past the window)
and are still verified 1:1 against their oracles by
tests/test_oracle_parity.py every run; the digests keep them inside the
driver-visible window without spending 16 slots.

36-bit hash (not the 60-bit dedup hash): the per-row hashes are summed,
and sum(36-bit x 15k rows) < 2^50 stays exactly representable in the
final DOUBLE on both engines (DuckDB SUM(BIGINT) returns INT128, which
its pandas bridge would otherwise narrow lossily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import registry
# the folded sub-queries live in these modules; importing them here makes
# the digest oracles buildable even when suites is imported standalone
# (outside registry._load_all's ordering)
from . import (  # noqa: F401
    advisor,
    cdc,
    clustering,
    core_sql,
    core_sql2,
    crawl,
    dedup,
    funnel,
    multimodal,
    quality,
    relational_ext,
    sampling,
    similarity,
    streaming_q,
    text,
    timeseries,
    tpch_shapes,
)
from .registry import register

# (query_name, exact_cols, double_cols) — column split per live schema;
# tests/test_suites.py asserts this table matches the registered query
# schemas so drift is caught immediately.
_RELATIONAL: list[tuple[str, list[str], list[str]]] = [
    ("anti_join_customers", ["c_custkey", "c_name"], []),
    ("having_large_orders", ["l_orderkey"], ["total_qty"]),
    ("in_subquery_filter", ["c_custkey", "c_name"], []),
    ("multiset_ops", ["o_custkey"], []),
    ("semi_join_suppliers", ["s_suppkey", "s_name"], []),
    ("set_ops_customers", ["c_custkey"], []),
]
_GROUPING: list[tuple[str, list[str], list[str]]] = [
    (
        "cube_aggregation",
        ["orderstatus", "orderpriority", "n_orders"],
        ["total_price"],
    ),
    ("grouping_sets_agg", ["returnflag", "linestatus"], ["revenue"]),
    (
        "pivot_status_by_priority",
        ["o_orderpriority", "n_f", "n_o", "n_p"],
        ["rev_f"],
    ),
    ("rollup_returns", ["returnflag", "linestatus", "n_rows"], ["sum_qty"]),
]
_FUNCTIONS: list[tuple[str, list[str], list[str]]] = [
    ("array_agg_lines", ["l_orderkey", "line_numbers", "n_lines"], []),
    ("conditional_revenue_share", [], ["small_type_share_pct"]),
    ("correlated_small_quantity_revenue", [], ["avg_yearly"]),
    ("json_extract_rollup", ["event_type", "sum_k", "max_k", "n_events"], []),
    (
        "scalar_functions",
        ["p_partkey", "brand_upper", "name_len", "type_prefix", "size_band"],
        ["uplifted_price"],
    ),
    (
        "window_functions_suite",
        ["o_custkey", "o_orderkey", "price_rank", "price_dense_rank"],
        ["prev_price", "next_price", "running_total", "moving_sum3"],
    ),
]

_DEC = "decimal(38,6)"


def _md5_36(col: F.Column) -> F.Column:
    """36-bit non-negative hash: first 9 hex chars of md5 (JVM codegen,
    no UDF). DuckDB twin: ('0x' || substr(md5(x), 1, 9))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 9), 16, 10).cast("bigint")


def _digest_df(
    spark: SparkSession, sf_dir: str, spec: list[tuple[str, list[str], list[str]]]
) -> DataFrame:
    out: DataFrame | None = None
    for name, exact_cols, dbl_cols in spec:
        df = registry._QUERIES[name](spark, sf_dir)
        if exact_cols:
            key = F.concat_ws(
                "|", *[F.col(c).cast("string") for c in exact_cols]
            )
        else:
            key = F.lit("")
        num: F.Column | None = None
        for c in dbl_cols:
            term = F.coalesce(
                F.round(F.col(c), 4).cast(_DEC), F.lit(0).cast(_DEC)
            )
            num = term if num is None else num + term
        num_agg = (
            F.coalesce(F.sum(num), F.lit(0).cast(_DEC))
            if num is not None
            else F.lit(0).cast(_DEC)
        )
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum(_md5_36(key)), F.lit(0))
            .cast("double")
            .alias("key_hash"),
            num_agg.cast("double").alias("num_sum"),
        ).select(F.lit(name).alias("op"), "n_rows", "key_hash", "num_sum")
        out = agg if out is None else out.unionByName(agg)
    assert out is not None
    return out.orderBy("op")


def _digest_sql(spec: list[tuple[str, list[str], list[str]]]) -> str:
    parts: list[str] = []
    for name, exact_cols, dbl_cols in spec:
        sub = registry._ORACLES[name]
        if exact_cols:
            # identifiers quoted: folded queries include columns that
            # collide with keywords ("count") or are case-sensitive ("F")
            key = (
                "concat_ws('|', "
                + ", ".join(f'CAST("{c}" AS VARCHAR)' for c in exact_cols)
                + ")"
            )
        else:
            key = "''"
        row_hash = f"('0x' || substr(md5({key}), 1, 9))::BIGINT"
        # Round via VARCHAR -> DECIMAL, not ROUND(double): Spark's ROUND
        # converts through BigDecimal.valueOf (the SHORTEST decimal
        # representation) then rounds HALF_UP, so an upstream value of
        # 0.123450 — whose binary double is a hair below the tie — rounds
        # UP in Spark but DOWN under DuckDB's binary-value rounding.
        # DuckDB's VARCHAR cast is the same shortest round-trip repr, and
        # decimal ROUND is the same half-away-from-zero, so this emulates
        # Spark's semantics exactly (verified on the tie cases).
        num = (
            " + ".join(
                f'COALESCE(ROUND(CAST("{c}" AS VARCHAR)::DECIMAL(38,12), 4)'
                f"::DECIMAL(38,6), 0)"
                for c in dbl_cols
            )
            or "0::DECIMAL(38,6)"
        )
        parts.append(
            f"SELECT '{name}' AS op, COUNT(*) AS n_rows,\n"
            f"  CAST(COALESCE(SUM({row_hash}), 0) AS DOUBLE) AS key_hash,\n"
            f"  CAST(COALESCE(SUM({num}), 0) AS DOUBLE) AS num_sum\n"
            f"FROM ({sub}) AS digest_sub"
        )
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) digest_union ORDER BY op"
    )


@register("relational_ops_digest", oracle=_digest_sql(_RELATIONAL))
def relational_ops_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds P7/§2.7 + subquery-filter queries (anti/semi joins, set and
    multiset ops, IN-subquery, HAVING) into one checked digest row each.
    See module docstring for the reduction and why it is hash-faithful."""
    return _digest_df(spark, sf_dir, _RELATIONAL)


@register("grouping_analytics_digest", oracle=_digest_sql(_GROUPING))
def grouping_analytics_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the multi-dimensional grouping surface (CUBE, GROUPING SETS,
    ROLLUP, pivot) into one checked digest row each."""
    return _digest_df(spark, sf_dir, _GROUPING)


@register("functions_windows_digest", oracle=_digest_sql(_FUNCTIONS))
def functions_windows_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the scalar-function / JSON / array-agg / window-function
    suites and the correlated-subquery scalars into one checked digest
    row each."""
    return _digest_df(spark, sf_dir, _FUNCTIONS)


# ---------------------------------------------------------------------------
# Round-4 expansion: certify the remaining registered surface inside the
# driver's 50-row window. Same reduction as above; specs generated from
# the live Spark/DuckDB schemas (scripts/gen_digest_specs.py) and pinned
# here as literals so schema drift breaks tests/test_suites.py loudly.
# ---------------------------------------------------------------------------

_TPCH: list[tuple[str, list[str], list[str]]] = [
    ("bulk_suppliers_for_part_family", ["s_name"], ["s_acctbal"]),
    ("customer_order_count_distribution", ["c_count", "custdist"], []),
    ("disjunctive_predicate_revenue", [], ["revenue"]),
    ("idle_wealthy_customers", ["name_bucket", "numcust"], ["totacctbal"]),
    (
        "large_volume_customers",
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate"],
        ["o_totalprice", "sum_qty"],
    ),
    ("late_ship_priority_counts", ["o_orderpriority", "order_count"], []),
    (
        "min_acctbal_supplier_per_part",
        ["p_partkey", "p_name", "s_name"],
        ["supplier_acctbal"],
    ),
    ("multi_supplier_late_orders", ["s_name", "numwait"], []),
    ("nation_market_share", ["o_year"], ["nation_volume", "total_volume"]),
    ("null_safe_aggregation",
     ["n_rows", "n_with_exec", "total_exec_ms", "n_null_exec", "n_null_cpu"],
     []),
    ("order_price_histogram", ["bucket", "n_orders", "bucket_value"], []),
    ("part_supplier_variety",
     ["p_brand", "p_type", "p_size", "supplier_cnt"], []),
    ("part_value_concentration", ["l_partkey"], ["part_value"]),
    # r7: displaced from the priority window by partition_recommendation_drift
    ("priority_counts_windowed", ["o_orderpriority", "order_count"], []),
    (
        "priority_shipping_channels",
        ["l_linestatus", "high_line_count", "low_line_count"],
        [],
    ),
    ("product_profit_by_nation_year",
     ["nation", "o_year"], ["sum_profit"]),
    ("promo_revenue_share", [], ["promo_revenue", "total_revenue"]),
    ("range_interval_join",
     ["o_orderpriority", "lines_shipped_90d"], ["revenue_90d"]),
    ("returned_item_revenue_topk",
     ["c_custkey", "c_name", "n_name", "revenue"], []),
    ("scan_filter_sort_limit",
     ["o_orderkey", "o_custkey"], ["total_price"]),
    ("simple_predicate_revenue", [], ["revenue"]),
    ("top_revenue_supplier", ["s_suppkey", "s_name"], ["total_revenue"]),
    ("volume_shipping_bilateral",
     ["supp_nation", "cust_nation", "l_year"], ["revenue"]),
]

_CDC_TIMESERIES: list[tuple[str, list[str], list[str]]] = [
    ("daily_gap_fill", ["event_type", "day", "n_events", "sum_value"], []),
    ("event_funnel_conversion",
     ["step_idx", "step", "n_users"], ["conversion_rate"]),
    ("forward_fill_daily_value", ["event_type", "day", "filled_value"], []),
    ("full_outer_daily_activity", ["day", "n_orders", "n_events"], []),
    ("rolling_7day_revenue",
     ["o_orderpriority", "day", "days_in_window"], ["rev_7d"]),
    ("sessionize_gap_sensitivity",
     ["gap_minutes", "n_sessions", "n_singleton_sessions",
      "max_session_events", "total_events"], []),
    ("user_retention_cohorts",
     ["cohort_week", "week_offset", "n_active", "cohort_size"],
     ["retention_rate"]),
    ("user_value_trend",
     ["user_id", "n_events"], ["slope_per_day", "value_time_corr"]),
]

_TEXT_EXTENDED: list[tuple[str, list[str], list[str]]] = [
    ("bm25_search_topk", ["doc_id", "lang"], ["bm25"]),
    ("bpe_corpus_compression",
     ["lang", "n_words", "symbols_before", "symbols_after"], []),
    ("bpe_merge_iterations",
     ["round", "pair", "pair_count", "rank"], []),
    ("bpe_merge_pair_counts", ["pair", "pair_count", "rank"], []),
    ("cluster_mixture_plan",
     ["cluster", "lang", "n_docs", "total_tokens", "budget_tokens"],
     ["mixture_share"]),
    ("cluster_quality_profile",
     ["cluster", "n_docs", "n_low_quality", "sum_quality_centi"],
     ["mean_quality"]),
    ("corpus_filter_funnel",
     ["stage_idx", "stage", "n_docs", "n_tokens"], []),
    ("corpus_filter_funnel_extended",
     ["stage_idx", "stage", "n_docs", "n_tokens"], []),
    ("corpus_mixture_plan",
     ["lang", "source", "n_docs", "total_tokens", "budget_tokens"],
     ["mean_diversity", "mixture_share"]),
    ("corpus_top_tokens", ["token", "cnt"], []),
    ("corpus_zipf_stats",
     ["n_vocab", "total_tokens", "head_n"], ["zipf_slope", "zipf_r2"]),
    ("crawl_corpus_funnel", ["stage", "n_records"], []),
    ("crawl_to_corpus_pipeline",
     ["stage_idx", "stage", "n_records"], []),
    ("dataset_quality_audit",
     ["table_name", "column_name", "total_rows", "non_null",
      "distinct_values"],
     ["null_rate"]),
    ("document_chunking_stats",
     ["doc_id", "n_chunks", "total_chunk_chars", "chunks_md5"], []),
    ("document_topic_clusters", ["doc_id", "cluster", "dist2"], []),
    ("html_text_extraction_stats",
     ["n_links", "n_docs", "distinct_titles", "total_words", "total_pw"],
     []),
    ("jsonl_ingest_stats", ["lang", "n_docs", "total_chars"], []),
    ("language_id_confusion",
     ["true_lang", "predicted_lang", "n_docs", "lang_total"], []),
    ("lateral_explode_tokens", ["doc_id", "tok"], []),
    ("pii_redaction_stats",
     ["doc_id", "n_email", "n_url", "n_phone", "redacted_md5"], []),
    ("text_bpe_token_counts",
     ["doc_id", "bpe_token_count", "ws_token_count", "vowel_count"], []),
    ("text_entropy_scores",
     ["doc_id", "n_tokens", "n_distinct_tokens"],
     ["token_entropy", "normalized_entropy"]),
    ("text_fingerprint_md5", ["doc_id", "content_md5"], []),
    ("text_language_id", ["doc_id", "predicted_lang", "marker_hits"], []),
    ("text_lm_perplexity",
     ["doc_id", "n_bigrams"], ["avg_logp", "pseudo_ppl"]),
    ("text_model_quality_scores",
     ["doc_id", "n_features", "weight_sum", "is_quality"],
     ["model_score"]),
    ("text_model_quality_scores_loaded",
     ["doc_id", "n_features", "weight_sum_micro", "is_quality"],
     ["model_score"]),
    ("text_quality_scores",
     ["doc_id"],
     ["stopword_ratio", "punct_ratio", "repetition_ratio", "length_score",
      "quality_score"]),
    ("text_token_stats",
     ["doc_id", "char_count", "token_count", "distinct_tokens"],
     ["avg_token_len"]),
    ("text_winnow_fingerprints",
     ["doc_id", "winnow_fp", "winnow_size"], []),
    ("topic_balanced_doc_sample",
     ["doc_id", "cluster", "lang", "source"], []),
    ("warc_ingest_stats",
     ["status", "n_records", "total_body_bytes"], ["avg_body_bytes"]),
    ("winnow_containment_pairs",
     ["id_a", "id_b", "shared_fps"], ["containment"]),
]

_DEDUP_SIMILARITY: list[tuple[str, list[str], list[str]]] = [
    ("cluster_balanced_sample", ["vec_id", "cluster", "label"], []),
    ("cluster_outlier_prune", ["vec_id", "cluster", "dist2"], []),
    ("decontamination_embedding_scan",
     ["label", "cosine_band", "n_vecs"], ["top_cosine"]),
    ("dedup_exact", ["canonical_doc_id", "dup_count", "n_chars"], []),
    ("dedup_exact_groups", ["canonical_id", "dup_count"], []),
    ("dedup_keep_canonical", ["doc_id", "lang", "source", "n_chars"], []),
    ("dedup_minhash_verified", ["id_a", "id_b"], ["jaccard"]),
    ("dedup_simhash", ["id_a", "id_b", "hamming"], []),
    ("dedup_source_attribution",
     ["source", "n_docs", "n_dup_docs"], ["dup_rate"]),
    ("dedup_token_jaccard", ["id_a", "id_b"], ["jaccard"]),
    ("embedding_cluster_profile",
     ["cluster", "n_vecs", "sum_dist2", "min_dist2", "max_dist2",
      "n_labels", "est_pairs"], ["cluster_share"]),
    ("embedding_dedup_keep_canonical", ["vec_id", "label"], []),
    ("embedding_drift_report",
     ["cluster", "n_fit", "n_new", "sum_d2_fit", "sum_d2_new",
      "population_status"], []),
    ("embedding_kmeans_greedy_assign",
     ["vec_id", "cluster", "dist2"], []),
    ("embedding_near_duplicates", ["id_a", "id_b"], ["cosine"]),
    ("embedding_near_duplicates_exact", ["id_a", "id_b"], ["cosine"]),
    ("embedding_quantization_stats",
     ["vec_id", "label", "n_dims"], ["scale", "max_abs_err"]),
    ("pagerank_transaction_graph",
     ["node", "rank_micro", "rank"], []),
    ("semdedup_keep_canonical", ["vec_id", "label"], []),
    ("similarity_ivf_topk", ["query_id", "vec_id", "rank"], ["cosine"]),
    ("similarity_pq_topk", ["query_id", "vec_id", "rank"], ["l2"]),
    ("similarity_topk_bruteforce",
     ["query_id", "vec_id", "rank"], ["cosine"]),
]

_STATS_FUNCTIONS: list[tuple[str, list[str], list[str]]] = [
    # r7: displaced from the driver window by embedding_kmeans_assign
    # (this round's flagship); its gated-exact output folds exactly
    ("approx_distinct_profile", ["metric"], ["value_checked"]),
    ("date_functions_suite",
     ["order_year", "order_quarter", "n_orders", "first_month_end",
      "max_day_of_year", "max_days_since_1995"], []),
    ("event_type_share", ["event_type", "n", "is_heavy"], ["share"]),
    ("grouped_bool_aggregates",
     ["o_orderpriority", "all_over_1k", "any_finished", "n_open",
      "n_large"], []),
    ("median_and_spread",
     ["c_mktsegment", "n_customers"],
     ["median_bal", "mean_bal", "sd_bal"]),
    ("mode_per_segment",
     ["c_mktsegment", "modal_nation", "n_customers"], []),
    ("part_name_fuzzy_pairs", ["name_a", "name_b", "edit_distance"], []),
    ("pivot_api_segment_status", ["c_mktsegment", "F", "O", "P"], []),
    ("ranking_distribution_suite",
     ["c_mktsegment", "c_custkey", "acctbal_quartile"],
     ["pct_rank", "cume_distribution"]),
    ("regexp_functions_suite",
     ["c_custkey", "extracted_id", "name_dezeroed", "n_name_parts",
      "has_triple_zero"], []),
    ("salted_group_count", ["key", "count"], []),
    ("stat_moments_suite",
     ["l_returnflag", "n_rows"],
     ["qty_price_corr", "qty_price_covar", "qty_price_covar_pop",
      "qty_var", "qty_var_pop", "qty_sd"]),
    ("string_agg_brands", ["p_type", "brands", "n_brands"], []),
    ("unpivot_part_metrics", ["p_partkey", "metric"], ["value"]),
    ("window_frame_suite",
     ["c_custkey", "c_mktsegment", "balance_quartile"],
     ["balance_pct_rank", "second_lowest_bal", "max_bal"]),
    ("zorder_cell_stats", ["zcell", "n_rows"], ["sum_qty"]),
]

_QUALITY_SAMPLING: list[tuple[str, list[str], list[str]]] = [
    ("bucket_join_advice",
     ["table_name", "column_name", "join_freq", "ndv", "advised_buckets"],
     []),
    ("cms_heavy_hitters", ["user_id", "event_count"], []),
    ("dq_constraint_report",
     ["table_name", "check_name", "n_rows", "n_violations"],
     ["violation_rate"]),
    ("dq_coverage_gaps", ["relation", "n_parents", "n_childless"], []),
    ("dq_referential_orphans",
     ["relation", "n_child_rows", "n_orphan_keys", "n_orphan_rows"], []),
    ("drift_repartition_scripts",
     ["view_name", "current_keys_csv", "added_columns_csv", "new_spec_csv",
      "alter_ddl"], []),
    ("event_type_user_overlap",
     ["type_a", "type_b", "n_both", "n_a", "n_b"], ["user_jaccard"]),
    ("histogram_quantile_estimate", [], ["q", "quantile_checked"]),
    ("media_to_corpus_pipeline",
     ["stage_idx", "stage", "n_records"], []),
    ("metadata_pushdown_aggregates",
     ["table_name", "column_name", "n_rows", "n_nulls"],
     ["min_v", "max_v"]),
    ("multimodal_adpcm_decode_stats",
     ["samples_per_block", "n_assets", "sum_frames"],
     ["avg_abs_amplitude"]),
    ("multimodal_aiff_decode_stats",
     ["channels", "n_assets", "sum_frames"], ["avg_abs_amplitude"]),
    ("multimodal_audio_fingerprint_near_dup",
     ["hamming", "n_pairs"], []),
    ("multimodal_avi_frame_stats",
     ["width", "n_assets", "n_frames", "total_pw"], ["avg_intensity"]),
    ("multimodal_bmp_decode_stats",
     ["n_assets", "sum_width", "sum_height", "total_pw_sum"],
     ["avg_intensity"]),
    ("multimodal_channel_stats",
     ["n_channels", "channel", "n_assets"], ["avg_channel_mean"]),
    ("multimodal_feature_search",
     ["query_id", "vec_id", "rank"], ["cosine"]),
    ("multimodal_flac_decode_stats",
     ["channels", "is_const", "n_assets", "sum_frames"],
     ["avg_abs_amplitude"]),
    ("multimodal_frame_sample",
     ["asset_id", "n_frames", "last_frame_ms"], []),
    ("multimodal_gif_decode_stats",
     ["interlaced", "n_assets", "sum_width", "sum_height",
      "total_pw_sum"],
     ["avg_intensity"]),
    ("multimodal_jpeg_channel_stats",
     ["n_channels", "channel", "n_assets"], ["avg_channel_mean"]),
    ("multimodal_jpeg_decode_stats",
     ["jpeg_mode", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_mixed_corpus_stats",
     ["fmt", "n_assets", "sum_width", "sum_height"], ["avg_intensity"]),
    ("multimodal_mulaw_decode_stats",
     ["channels", "n_assets", "sum_frames"], ["avg_abs_amplitude"]),
    ("multimodal_palette_png_stats",
     ["indexed", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_phash_near_dup", ["hamming", "n_pairs"], []),
    ("multimodal_png_decode_stats",
     ["channels", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_png_depth_stats",
     ["depth", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_progressive_jpeg_stats",
     ["jpeg_mode", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_progressive_png_stats",
     ["interlaced", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_real_decode_stats",
     ["n_assets", "sum_width", "sum_height", "total_bytes"],
     ["avg_intensity"]),
    ("multimodal_resize_real_stats",
     ["n_assets", "sum_width", "sum_height", "total_bytes"],
     ["avg_intensity"]),
    ("multimodal_resize_stats",
     ["media_type", "n_assets", "total_resized_bytes"],
     ["avg_scale_x", "avg_scale_y"]),
    ("multimodal_scene_changes",
     ["asset_id", "n_frames", "n_scene_changes"], ["max_luma_delta"]),
    ("multimodal_tiff_decode_stats",
     ["packbits", "n_assets", "sum_width", "sum_height", "total_pw_sum"],
     ["avg_intensity"]),
    ("multimodal_wav_decode_stats",
     ["channels", "n_assets", "sum_frames"], ["avg_abs_amplitude"]),
    ("multimodal_webp_decode_stats",
     ["channels", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_webp_lz_decode_stats",
     ["channels", "n_assets", "sum_width", "sum_height"],
     ["avg_intensity"]),
    ("multimodal_y4m_frame_stats",
     ["asset_id", "n_frames", "last_frame_ms"], ["avg_luma"]),
    ("partition_layout_whatif",
     ["candidate_key", "n_partitions", "n_rows", "max_partition_rows"],
     ["skew_ratio", "est_scan_fraction"]),
    ("partition_spec_history",
     ["view_name", "generation", "partition_keys_csv", "spec_changed",
      "n_spec_changes"], []),
    ("rollup_advice",
     ["table_name", "column_name", "groupby_freq", "ndv", "table_rows"],
     ["est_rollup_fraction"]),
    ("sequence_packing_manifest",
     ["lang", "shard", "pack_id", "seq_in_pack", "doc_id", "token_count",
      "pack_offset"], []),
    ("sequence_packing_stats",
     ["lang", "shard", "pack_id", "n_docs", "pack_tokens"], []),
    ("shuffle_partition_advice",
     ["query_id", "input_bytes", "advised_partitions"], []),
    ("skew_salt_advice", ["key", "n_rows", "salt_factor"], []),
    ("source_cap_report",
     ["source", "n_docs", "n_kept", "n_dropped", "kept_chars"], []),
    ("stratified_sample_stats", ["lang", "n_docs", "total_chars"], []),
    ("table_file_metadata",
     ["table_name", "n_rows", "n_row_groups", "n_columns"], []),
    ("weighted_bernoulli_sample",
     ["lang", "n_kept", "n_total", "kept_chars"], []),
    ("workload_drift_report",
     ["kind", "name", "n_early", "n_late", "rank_early", "rank_late",
      "status"], []),
]


@register("tpch_digest", oracle=_digest_sql(_TPCH))
def tpch_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the TPC-H query-shape sweep (Q4-Q22 analogs,
    queries/tpch_shapes.py + queries/relational_ext.py) plus the core
    scan/sort/null-guard/interval-join rows into one checked digest row
    per query."""
    return _digest_df(spark, sf_dir, _TPCH)


@register("cdc_timeseries_digest", oracle=_digest_sql(_CDC_TIMESERIES))
def cdc_timeseries_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the time-series completion surface (gap fill, forward fill,
    rolling windows, full-outer day alignment, regression trends,
    queries/timeseries.py)."""
    return _digest_df(spark, sf_dir, _CDC_TIMESERIES)


@register("text_extended_digest", oracle=_digest_sql(_TEXT_EXTENDED))
def text_extended_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the extended text-pipeline surface (BM25, entropy, PII,
    chunking, language-ID, BPE counts, winnow fingerprints, mixture
    planning, queries/text.py)."""
    return _digest_df(spark, sf_dir, _TEXT_EXTENDED)


@register("dedup_similarity_digest", oracle=_digest_sql(_DEDUP_SIMILARITY))
def dedup_similarity_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the dedup + embedding-similarity surface (exact dedup,
    token-Jaccard, simhash, verified minhash, quantization, brute-force /
    IVF top-k, and the exact all-pairs oracle twins — the twins stay
    bench-banned (bench.py) but are correctness-checkable at the
    driver's sf0.01)."""
    return _digest_df(spark, sf_dir, _DEDUP_SIMILARITY)


@register("stats_functions_digest", oracle=_digest_sql(_STATS_FUNCTIONS))
def stats_functions_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the statistics / function-surface suites (moments, ranking,
    window frames, regexp, date functions, mode, fuzzy pairs, z-order
    cells, pivot/unpivot, salted grouping)."""
    return _digest_df(spark, sf_dir, _STATS_FUNCTIONS)


@register("quality_sampling_digest", oracle=_digest_sql(_QUALITY_SAMPLING))
def quality_sampling_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds data-quality constraints/orphans/coverage, sampling
    (weighted Bernoulli, stratified), user-overlap, sequence packing,
    multimodal resize/frame plumbing, and the CMS / histogram-quantile
    sketch probes."""
    return _digest_df(spark, sf_dir, _QUALITY_SAMPLING)


_STREAMING: list[tuple[str, list[str], list[str]]] = [
    ("streaming_audio_fingerprint_ingest", ["hamming", "n_pairs"], []),
    ("streaming_click_attribution",
     ["user_id", "click_id", "purchase_id", "click_us", "purchase_us"],
     ["purchase_value"]),
    ("streaming_click_attribution_full",
     ["user_id", "click_id", "purchase_id", "click_us", "purchase_us"],
     ["purchase_value"]),
    ("streaming_click_attribution_outer",
     ["user_id", "click_id", "purchase_id", "click_us", "purchase_us"],
     ["purchase_value"]),
    ("streaming_cluster_ingest", ["vec_id", "cluster", "dist2"], []),
    ("streaming_dedup_events", ["event_type", "n_events"], ["total_value"]),
    ("streaming_dedup_gate",
     ["doc_id", "n_candidates", "best_match_id", "is_near_dup"],
     ["best_est_jaccard"]),
    ("streaming_drift_triggers",
     ["view_name", "column_name", "is_current_key", "n_early", "n_late",
      "usage_status", "trigger_action"], []),
    ("streaming_incremental_stats",
     ["n_partitions", "n_rows", "exact_distinct_user_id",
      "exact_distinct_event_type", "user_id_gate_ok", "event_type_gate_ok"],
     []),
    ("streaming_interactive_share",
     ["window_start", "is_interactive", "query_count"], []),
    ("streaming_jsonl_ingest", ["lang", "n_docs", "total_chars"], []),
    ("streaming_multimodal_ingest",
     ["fmt", "n_assets", "sum_width", "sum_height"], ["avg_intensity"]),
    ("streaming_phash_ingest", ["hamming", "n_pairs"], []),
    ("streaming_pii_scrub",
     ["lang", "n_docs", "total_emails", "total_urls", "total_phones"], []),
    ("streaming_sessionize",
     ["user_id", "session_start", "session_end", "n_events"],
     ["session_value"]),
    ("streaming_similarity_ingest",
     ["query_id", "vec_id", "rank"], ["cosine"]),
    ("streaming_stateful_user_totals",
     ["user_id", "n_events"], ["total_value"]),
    ("streaming_static_enrichment",
     ["c_mktsegment", "event_type", "n_events"], ["total_value"]),
    ("streaming_warc_ingest",
     ["status", "n_records", "total_body_bytes"], ["avg_body_bytes"]),
    ("streaming_window_rollup",
     ["window_start", "window_end", "query_count", "total_exec_ms",
      "max_exec_ms", "total_input_bytes"], []),
]


@register("streaming_digest", oracle=_digest_sql(_STREAMING))
def streaming_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds ALL nine streaming queries (r5 — previously five): the
    stateless PII scrub, complete-mode tumbling-day rollup,
    interactive-share windows, stream-static broadcast enrichment,
    append-mode session windows, plus the four determinized in r5 — the
    stream-stream interval join (single-batch drain), watermark dedup of
    a doubled feed (unique-key fixture), the applyInPandasWithState
    running totals (final-state extraction, slicing-invariant), and the
    foreachBatch sketch store (exact fields hash-checked, HLL estimates
    gated ±2 % vs exact). All are real availableNow Structured Streaming
    drains (queries/streaming_q.py), so the entire streaming layer now
    carries driver-checked rows."""
    return _digest_df(spark, sf_dir, _STREAMING)
