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
    "graph_database_akkatyped_spark.functions.scalar",
    "graph_database_akkatyped_spark.functions.udfs",
    "graph_database_akkatyped_spark.streaming.windows",
    "graph_database_akkatyped_spark.streaming.stateful",
)

# driver-sweep priority. Block 1: keys with no CORRECTNESS_r01 row
# (ascending sf0.1 cost per BENCH_r01). Block 2: keys already proven in
# round 1, cheapest first, the slow trio last.
_SWEEP_ORDER = (
    # -- block 1: never driver-checked (round 1 sweep truncated at #50)
    "label_propagation", "khop_neighbors", "sssp_user_weighted",
    "kcore_decompose", "pagerank_fixed", "stream_stream_join",
    "stream_watermark_late", "path_exists", "split_train_test",
    "sssp_weighted", "text_lang_stats", "text_token_count",
    "stream_stateful_count", "dedup_clusters", "stream_static_join",
    "multimodal_enrich", "text_chunk_sliding", "text_quality_score",
    "text_wordcount", "source_event_stream", "multimodal_decode_stub",
    "stream_sliding", "stream_tumbling", "udf_python", "pack_sequences",
    "simsearch_ivf", "simsearch_topk", "text_fingerprint",
    "stream_session", "stream_dedup", "udf_pandas", "simsearch_lsh",
    "text_sentiment_lexicon", "agg_approx_percentile", "bfs_levels",
    "build_user_graph", "clustering_coefficient", "connected_components",
    "dedup_exact", "dedup_near_minhash", "dedup_simhash", "fn_array",
    "fn_bitwise", "fn_conditional", "fn_date", "fn_explode", "fn_hash",
    "fn_hash_native", "fn_json", "fn_map", "fn_math", "fn_string",
    "fn_string_rewrite", "udf_mapinarrow", "text_tfidf",
    "text_langid_ngram", "udaf_applyinpandas", "dedup_embedding_cosine",
    "udtf_python", "text_ngrams", "simsearch_pairs_label",
    "dedup_ngram_jaccard", "motif_triangle_sql", "triangle_count",
    "mutual_neighbors", "udaf_cogrouped_asof",
    # -- block 2: green in CORRECTNESS_r01, cheapest first
    "scan_parquet", "sink_parquet", "sink_csv_roundtrip",
    "sink_json_roundtrip", "sort_limit_topk", "join_cross_small",
    "scan_pruned", "set_union", "join_full", "subquery_in",
    "vertex_lookup", "join_semi", "unpivot_melt", "join_inner_hash",
    "set_except", "set_intersect", "subquery_scalar",
    "join_asof_nearest", "join_left", "window_first_last",
    "window_lead_lag", "window_rank", "window_ntile", "neighbors_out",
    "pivot_segment", "window_running", "window_range_frame",
    "join_theta_range", "agg_approx_distinct", "agg_distinct",
    "agg_hash", "agg_listagg", "agg_minmax_by", "agg_mode",
    "agg_moments", "agg_percentiles", "build_edges", "build_vertices",
    "degree_distribution", "degree_in", "degree_out", "filter_project",
    "flagship", "grouping_cube", "grouping_rollup", "grouping_sets",
    "join_anti", "join_broadcast", "table_profile", "join_salted_skew",
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
