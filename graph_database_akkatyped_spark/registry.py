"""Central query registry.

Each operator module exposes ``QUERIES: dict[str, (spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL twin; omitted
key -> driver records a weaker rows-only check). This module aggregates
them for ``__spark_entry__.py``.

The returned dicts are ordered by ``_SWEEP_ORDER``: the driver's
correctness sweep walks keys in registry order and has a bounded budget
(round 1 stopped at key #50), so keys it has never green-lit come
FIRST, cheapest first, and already-proven keys re-run last. Keys not in
the list (newly added operators) sort before everything — they are by
definition unchecked.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = (
    "graph_database_akkatyped_spark.sources.parquet",
    "graph_database_akkatyped_spark.operators.relational",
    "graph_database_akkatyped_spark.operators.graph_build",
    "graph_database_akkatyped_spark.operators.algos",
    "graph_database_akkatyped_spark.operators.llm",
    "graph_database_akkatyped_spark.operators.curation",
    "graph_database_akkatyped_spark.operators.graph_extras",
    "graph_database_akkatyped_spark.operators.relational_extras",
    "graph_database_akkatyped_spark.operators.sampling",
    "graph_database_akkatyped_spark.operators.behavior",
    "graph_database_akkatyped_spark.operators.layout",
    "graph_database_akkatyped_spark.operators.motif",
    "graph_database_akkatyped_spark.operators.centrality",
    "graph_database_akkatyped_spark.functions.scalar",
    "graph_database_akkatyped_spark.functions.udfs",
    "graph_database_akkatyped_spark.streaming.windows",
    "graph_database_akkatyped_spark.streaming.stateful",
    "graph_database_akkatyped_spark.streaming.sinks",
)

_SWEEP_ORDER = (
    # driver-sweep priority, rotated for ROUND 11. The driver checks
    # the first ~50 keys per round. Block 1 layout:
    # a) the round-11 NEW key (journal_compact_replay — journal
    #    compaction + replay-equivalence audit) and the 3 keys whose
    #    implementation AND oracle round 11 rewrote
    #    (scale-aware IVF cell count: m = ceil(sqrt(n)/L) sub-cells
    #    per label via deterministic strided seeds + one Lloyd step;
    #    semantic_clusters / simsearch_greedy_graph consume the new
    #    knn graph);
    # b) the full stale-evidence tail per round-10 VERDICT #3: the
    #    r01 key (table_profile), the 22 r02 keys, the 10 r03 keys
    #    (the 11th, multimodal_decode_stub, was renamed — the current
    #    multimodal_decode key has r07 evidence);
    # c) the 16 r04 keys — after this round no key's latest driver
    #    evidence should predate r04 (the ~50-key budget may stop
    #    inside block c; those keys stay at the front next round).
    # RULE (unchanged): any NEW key must be added to block 1
    # explicitly — an unranked key sorts first (rank -1), which is
    # correct for new keys but must be a deliberate listing so
    # test_registry keeps the set exact.
    "journal_compact_replay", "knn_graph_build", "semantic_clusters",
    "simsearch_greedy_graph",
    "table_profile", "agg_filtered", "corpus_training_manifest",
    "dedup_materialize", "edge_jaccard", "events_anomaly_hours", "fn_regexp",
    "funnel_conversion", "graph_activity_timeline", "graph_summary_stats",
    "journal_intervals", "pagerank_personalized", "rfm_segmentation",
    "simsearch_hybrid_rrf", "sink_orc_roundtrip", "sink_partitioned_pruned",
    "sssp_pred_tree", "sssp_user_weighted", "stream_minhash_signature",
    "stream_stream_join", "timeseries_gapfill", "timeseries_multires_rollup",
    "window_distribution", "clustering_coefficient", "dedup_clusters",
    "embedding_quantize", "fn_bitwise", "fn_conditional", "fn_explode",
    "fn_hash", "fn_string_rewrite", "stream_static_join", "text_chunk_sliding",
    "community_modularity", "corpus_sample_mixture", "embedding_kmeans_lloyd",
    "events_pattern_match", "incremental_agg_merge", "langid_confusion",
    "quality_gopher_rules", "revenue_pareto", "sample_stratified",
    "sink_compacted", "skew_profile", "snapshot_diff",
    "stream_stateful_minmax", "stream_stateful_topk", "stream_stateful_ttl",
    "zorder_layout", "simsearch_lsh", "simsearch_recall_lsh",
    "agg_approx_percentile", "dedup_containment_smallside", "k_truss_edges",
    "link_predict_jaccard", "link_predict_resource_alloc",
    "corpus_mix_weights", "text_lang_stats", "curation_filter_report",
    "pii_redact", "text_repetition", "dedup_exact", "simsearch_topk",
    "text_tfidf", "text_ngrams", "text_wordcount", "text_sentiment_lexicon",
    "simsearch_pairs_label", "udf_python", "udf_pandas", "udaf_applyinpandas",
    "udtf_python", "udf_mapinarrow", "multimodal_enrich", "fn_map",
    "text_token_count", "text_quality_score", "text_normalize",
    "text_fingerprint", "doc_length_histogram", "text_langid_ngram",
    "sample_hash", "split_train_test", "sessionize_events", "build_user_graph",
    "dedup_near_minhash", "agg_approx_distinct", "agg_sketch_epoch_merge",
    "agg_sketch_intersection", "text_minhash_signature", "udaf_cogrouped_asof",
    "stream_topk_types", "bipartite_copurchase", "sql_recursive_reachability",
    "decontam_ngram_overlap", "retention_cohorts", "simsearch_ivf",
    "dedup_embedding_cosine", "dedup_incremental", "corpus_source_overlap",
    "anonymize_t_closeness", "dedup_edit_distance", "anonymize_l_diversity",
    "text_vocab_stats", "join_lateral_topn", "orders_croston_demand",
    "fn_hash_native", "stream_stateful_count", "zorder_layout_ranged",
    "timeseries_holt_backtest", "anonymize_dp_counts", "sink_bucketed_join",
    "graph_anf_accuracy", "graph_effective_diameter", "fn_string", "fn_date",
    "fn_math", "fn_array", "fn_json", "stream_tumbling", "stream_sliding",
    "stream_session", "stream_dedup", "stream_watermark_late",
    "source_event_stream", "sssp_weighted", "label_propagation", "path_exists",
    "triangle_count", "skyline_pareto", "anonymize_k_anonymity",
    "text_readability", "corpus_dsir_weights", "timeseries_holt",
    "recommend_item_cosine", "text_keyword_rake", "multimodal_video_scenecut",
    "funnel_time_to_convert", "graph_neighborhood_anf",
    "anonymize_pseudonymize", "join_spatial_grid", "data_quality_fk_audit",
    "graph_rich_club", "embedding_norm_audit", "text_bpe_fertility",
    "skyline_grouped", "orders_backlog_aging", "stream_holt_state",
    "text_bpe_encode", "entity_resolve_blocked", "join_bloom_prefilter",
    "stream_entity_resolve", "graph_temporal_reachability",
    "timeseries_downsample_lttb", "embedding_outlier_mahalanobis",
    "timeseries_autocorr", "timeseries_anomaly_mad", "text_bpe_merge",
    "multimodal_audio_energy", "corpus_curriculum_order",
    "stream_backfill_merge", "set_union", "set_intersect", "set_except",
    "pivot_segment", "unpivot_melt", "subquery_in", "subquery_scalar",
    "flagship", "agg_hash", "agg_moments", "agg_percentiles",
    "join_salted_skew", "dedup_lines", "dedup_lines_boilerplate",
    "graph_mst_boruvka", "graph_greedy_coloring", "graph_mis_luby",
    "simsearch_ivf_partitioned", "stream_sink_idempotent", "stream_scd2",
    "stream_ivf_assign", "stream_graph_degree", "stream_graph_pagerank",
    "simsearch_ivf_rebalance", "simsearch_recall_rebalance",
    "simsearch_ivfadc", "simsearch_recall_ivfadc",
    "timeseries_changepoint_cusum", "dedup_simhash", "multimodal_decode",
    "scan_parquet", "scan_pruned", "sink_parquet", "sink_csv_roundtrip",
    "sink_json_roundtrip", "filter_project", "build_vertices", "build_edges",
    "vertex_lookup", "neighbors_out", "degree_out", "degree_in",
    "degree_distribution", "join_inner_hash", "join_broadcast", "join_left",
    "join_full", "join_semi", "join_anti", "join_theta_range",
    "join_cross_small", "join_asof_nearest", "agg_distinct", "agg_minmax_by",
    "agg_mode", "agg_listagg", "grouping_rollup", "grouping_cube",
    "grouping_sets", "window_rank", "window_running", "window_lead_lag",
    "window_range_frame", "window_first_last", "window_ntile",
    "sort_limit_topk", "events_markov_transitions", "timeseries_ohlc",
    "events_burst_zscore", "timeseries_ewma", "dedup_containment",
    "text_collocation_lift", "stream_stream_left_join", "simsearch_mmr",
    "quality_bigram_logprob", "pack_lpt_shards", "dedup_semantic_recall",
    "multimodal_phash_dedup", "text_zipf_fit", "embedding_matryoshka_recall",
    "basket_association_rules", "simsearch_binary_hamming",
    "agg_weighted_median", "timeseries_seasonal_profile", "gnn_sample_fanout",
    "simsearch_range", "decontam_semantic", "text_bm25_topk",
    "quality_hashed_linear", "text_chunk_cdc", "join_asof_forward",
    "dedup_banding_recall", "corpus_pipeline_funnel", "graph_node2vec_walks",
    "community_louvain_multi", "simsearch_ivf_append", "cc_incremental",
    "merge_scd2", "timeseries_interpolate", "sketch_countmin_heavy",
    "simsearch_ivf_filtered", "simsearch_recall_filtered", "dedup_semantic",
    "community_louvain_l1", "build_user_graph_capped", "dedup_keep_best",
    "corpus_token_budget_sample", "triangle_count_approx", "dedup_paragraph",
    "betweenness_sampled", "corpus_dedup_report", "simsearch_filtered_topk",
    "motif_find_cosupplied", "multimodal_frame_sample", "merge_cdc_upsert",
    "degree_assortativity", "graph_reciprocity", "tombstone_cascade",
    "embedding_pca_power", "bfs_levels", "khop_neighbors",
    "scc_strongly_connected", "kcore_decompose", "graph_random_walks",
    "pack_sequences", "topo_longest_path", "path_shortest_bidirectional",
    "graph_eccentricity", "connected_components", "pagerank_fixed",
    "mutual_neighbors", "motif_triangle_sql", "simsearch_pq",
    "simsearch_recall_pq", "quality_unigram_logprob", "dedup_ngram_jaccard",
    "simsearch_recall", "join_interval_bucketed", "katz_centrality",
    "stream_sampled_ingest", "motif_find_nonmutual", "hits_hubs_authorities",
    "harmonic_closeness", "simsearch_hard_negatives", "stream_cdc_snapshot",
    "dedup_substring_shingle",
)


def collect() -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for name in _MODULES:
        try:
            mod = import_module(name)
        except ModuleNotFoundError:
            continue
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in queries:
                raise ValueError(f"duplicate query_key {key!r} in {name}")
            queries[key] = fn
        for key, sql in getattr(mod, "ORACLES", {}).items():
            if key in oracles:
                raise ValueError(f"duplicate oracle key {key!r} in {name}")
            oracles[key] = sql
    rank = {k: i for i, k in enumerate(_SWEEP_ORDER)}
    ordered = sorted(queries, key=lambda k: (rank.get(k, -1), k))
    return (
        {k: queries[k] for k in ordered},
        {k: oracles[k] for k in ordered if k in oracles},
    )
