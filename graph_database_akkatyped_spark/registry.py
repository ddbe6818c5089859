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
    "graph_database_akkatyped_spark.operators.layout",
    "graph_database_akkatyped_spark.operators.motif",
    "graph_database_akkatyped_spark.operators.centrality",
    "graph_database_akkatyped_spark.functions.scalar",
    "graph_database_akkatyped_spark.functions.udfs",
    "graph_database_akkatyped_spark.streaming.windows",
    "graph_database_akkatyped_spark.streaming.stateful",
)

# driver-sweep priority, rotated for round 4. The driver checks the
# first ~50 keys per round (r01-r03 each stopped at exactly 50).
# Block 1 (21 keys): everything with no green driver row yet — the 8
# never-sampled keys, the 2 r03 canonicalizer-red keys (fn_map,
# multimodal_enrich — serialization fixed), and the 11 keys added this
# round — ascending sf0.1 cost. Block 2: the 147 already-driver-green
# keys, cheapest first. RULE until the sweep closes: any NEW key must
# be appended explicitly at the END of block 2 — an unranked key sorts
# first (rank -1) and would displace a never-checked key from the
# 50-key budget.
_SWEEP_ORDER = (
    "scc_strongly_connected", "sample_stratified", "stream_stateful_ttl",
    "mutual_neighbors", "multimodal_enrich", "motif_triangle_sql",
    "incremental_agg_merge", "fn_map", "simsearch_pq",
    "simsearch_recall_pq", "quality_unigram_logprob", "sink_compacted",
    "dedup_near_minhash", "corpus_sample_mixture", "skew_profile",
    "stream_stateful_minmax", "dedup_ngram_jaccard", "zorder_layout",
    "simsearch_recall_lsh", "simsearch_recall", "graph_random_walks",
    # -- block 1b: keys added after the r04 rotation, still unchecked
    "join_interval_bucketed", "katz_centrality",
    "agg_sketch_epoch_merge", "stream_sampled_ingest",
    "zorder_layout_ranged",
    "motif_find_cosupplied", "motif_find_nonmutual",
    "graph_eccentricity", "hits_hubs_authorities", "harmonic_closeness",
    "merge_cdc_upsert", "simsearch_hard_negatives",
    "multimodal_frame_sample", "path_shortest_bidirectional",
    "stream_cdc_snapshot", "degree_assortativity",
    "dedup_substring_shingle", "tombstone_cascade", "snapshot_diff",
    "embedding_pca_power", "embedding_kmeans_lloyd",
    "events_pattern_match", "community_modularity",
    "graph_reciprocity", "revenue_pareto", "stream_stateful_topk",
    "langid_confusion", "quality_gopher_rules", "k_truss_edges",
    # -- block 2: driver-green in r01-r03, cheapest first
    "dedup_clusters", "kcore_decompose", "pagerank_personalized",
    "pagerank_fixed", "label_propagation", "khop_neighbors",
    "topo_longest_path", "connected_components", "sssp_weighted",
    "bfs_levels", "stream_minhash_signature", "sssp_user_weighted",
    "sink_csv_roundtrip", "stream_stream_join", "fn_explode",
    "fn_conditional", "fn_bitwise", "fn_hash", "fn_hash_native",
    "fn_string_rewrite", "text_token_count", "sink_orc_roundtrip",
    "fn_regexp", "scan_parquet", "embedding_quantize", "triangle_count",
    "sink_parquet", "source_event_stream", "sink_partitioned_pruned",
    "fn_string", "sink_json_roundtrip", "fn_date", "sort_limit_topk",
    "vertex_lookup", "text_quality_score", "fn_array", "filter_project",
    "window_distribution", "fn_math", "text_chunk_sliding",
    "stream_watermark_late", "scan_pruned", "join_cross_small",
    "build_vertices", "text_lang_stats", "text_fingerprint", "join_anti",
    "join_full", "join_inner_hash", "doc_length_histogram",
    "window_lead_lag", "join_left", "dedup_exact", "stream_static_join",
    "fn_json", "window_rank", "window_first_last", "subquery_scalar",
    "subquery_in", "pii_redact", "graph_summary_stats", "window_ntile",
    "stream_dedup", "journal_intervals", "text_normalize",
    "dedup_materialize", "unpivot_melt", "text_wordcount",
    "join_asof_nearest", "window_running", "window_range_frame",
    "corpus_training_manifest", "edge_jaccard", "events_anomaly_hours",
    "timeseries_multires_rollup", "clustering_coefficient", "set_union",
    "path_exists", "text_repetition", "grouping_rollup",
    "corpus_mix_weights", "sample_hash", "stream_session",
    "curation_filter_report", "dedup_simhash", "grouping_sets",
    "stream_stateful_count", "join_broadcast", "timeseries_gapfill",
    "stream_sliding", "grouping_cube", "split_train_test",
    "join_theta_range", "udf_mapinarrow", "graph_activity_timeline",
    "agg_filtered", "agg_minmax_by", "simsearch_topk",
    "agg_approx_percentile", "rfm_segmentation", "multimodal_decode_stub",
    "set_except", "sessionize_events", "text_ngrams", "udf_python",
    "neighbors_out", "pivot_segment", "join_semi", "sssp_pred_tree",
    "degree_out", "build_user_graph", "flagship", "udf_pandas",
    "degree_in", "udaf_applyinpandas", "funnel_conversion", "udtf_python",
    "decontam_ngram_overlap", "agg_mode", "agg_listagg", "table_profile",
    "retention_cohorts", "join_salted_skew", "simsearch_ivf", "text_tfidf",
    "agg_moments", "agg_percentiles", "set_intersect",
    "dedup_embedding_cosine", "text_langid_ngram", "agg_hash",
    "agg_distinct", "dedup_incremental", "simsearch_hybrid_rrf",
    "simsearch_lsh", "degree_distribution", "build_edges",
    "pack_sequences", "text_minhash_signature", "udaf_cogrouped_asof",
    "text_sentiment_lexicon", "stream_topk_types", "simsearch_pairs_label",
    "bipartite_copurchase", "stream_tumbling",
    "sql_recursive_reachability", "agg_approx_distinct",
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
