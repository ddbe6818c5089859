"""Property pins for the late round-6 keys (beyond the oracle parity
every SQL-hash key already gets in test_oracle_parity): structural
invariants that hold at ANY scale, checked at sf0.001/sf0.01.

- link_predict_resource_alloc: candidates are non-edges; the integer
  score respects its per-term bound (each common neighbor contributes
  at most 1e6/1 = 1e6, so ra_e6 <= cn * 1e6); top-k per x.
- gnn_sample_fanout: output is bounded by seeds*f1*(1+f2) regardless
  of graph degree (THE scale guarantee of fan-out sampling); hop-1
  sources are seeds; hop-2 sources are sampled hop-1 destinations;
  per-parent fan-out caps hold exactly; re-running yields the
  identical sample (hash determinism).
- simsearch_range: every returned pair clears the radius; the range
  result contains every top-k hit whose cosine clears the same radius
  (range search never misses what top-k found).
- decontam_semantic: one row per eval-split vector, contaminated
  <=> n_train_near > 0, max_cos present iff contaminated, and every
  reported max_cos clears the threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.curation import (
    _DECONTAM_SEM_COS,
    _VEC_BUCKET,
    decontam_semantic,
)
from graph_database_akkatyped_spark.operators.graph_build import (
    build_user_graph_capped,
)
from graph_database_akkatyped_spark.operators.graph_extras import (
    _GNN_F1,
    _GNN_F2,
    _GNN_SEEDS,
    _LP_TOPK,
    gnn_sample_fanout,
    link_predict_resource_alloc,
)
from graph_database_akkatyped_spark.operators.llm import (
    _RANGE_COS,
    simsearch_range,
    simsearch_topk,
)
from graph_database_akkatyped_spark.catalog import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_link_predict_ra_invariants(spark):
    out = link_predict_resource_alloc(spark, SF_ORACLE)
    rows = out.collect()
    assert rows, "fixture graph should produce candidates"
    for r in rows:
        assert r.ra_e6 <= r.cn * 1_000_000
        assert r.ra_e6 >= 1  # every common neighbor has deg >= 1 -> term >= 1e6/deg >= 1
        assert 1 <= r.rnk <= _LP_TOPK
        assert abs(r.ra - r.ra_e6 / 1e6) < 1e-12
    # candidates must be NON-edges of the capped graph
    ce = build_user_graph_capped(spark, SF_ORACLE).select("a", "b")
    overlap = out.join(
        ce, (out["x"] == ce["a"]) & (out["y"] == ce["b"]), "inner"
    ).count()
    assert overlap == 0
    # per-x candidate count respects top-k
    per_x = out.groupBy("x").count().agg(F.max("count")).first()[0]
    assert per_x <= _LP_TOPK


def test_gnn_sample_fanout_bounds_and_determinism(spark):
    out = gnn_sample_fanout(spark, SF_ORACLE).collect()
    assert len(out) <= _GNN_SEEDS * _GNN_F1 * (1 + _GNN_F2)
    hop1 = [r for r in out if r.hop == 1]
    hop2 = [r for r in out if r.hop == 2]
    assert hop1, "seeds must have neighbors on the fixture graph"
    # hop-1 edges start at their seed; hop-2 edges start at a sampled
    # hop-1 destination of the SAME seed
    h1_dst = {(r.seed, r.dst) for r in hop1}
    for r in hop1:
        assert r.src == r.seed
    for r in hop2:
        assert (r.seed, r.src) in h1_dst
    # per-parent caps hold exactly
    from collections import Counter

    c1 = Counter(r.seed for r in hop1)
    assert max(c1.values()) <= _GNN_F1
    c2 = Counter((r.seed, r.src) for r in hop2)
    if c2:
        assert max(c2.values()) <= _GNN_F2
    # deterministic: a second run samples the identical tree
    again = gnn_sample_fanout(spark, SF_ORACLE).collect()
    key = lambda r: (r.seed, r.hop, r.src, r.dst)
    assert sorted(map(key, out)) == sorted(map(key, again))


def test_simsearch_range_contains_topk_hits_above_radius(spark):
    rng = simsearch_range(spark, SF_ORACLE)
    assert rng.where(F.col("cos") < _RANGE_COS).count() == 0
    topk_above = (
        simsearch_topk(spark, SF_ORACLE)
        .where(F.col("cos") >= _RANGE_COS)
        .select("q_id", "vec_id")
    )
    missed = topk_above.join(
        rng.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_anti"
    ).count()
    assert missed == 0


def test_decontam_semantic_row_shape(spark):
    out = decontam_semantic(spark, SF_ORACLE)
    n_eval = (
        load_table(spark, SF_ORACLE, "embeddings")
        .where(F.expr(_VEC_BUCKET) >= 8)
        .count()
    )
    rows = out.collect()
    assert len(rows) == n_eval
    assert len({r.vec_id for r in rows}) == n_eval
    assert any(r.contaminated for r in rows), "calibrated tau should fire"
    for r in rows:
        assert r.contaminated == (r.n_train_near > 0)
        assert (r.max_cos is not None) == r.contaminated
        if r.max_cos is not None:
            assert r.max_cos >= _DECONTAM_SEM_COS


def test_mst_boruvka_matches_kruskal(spark):
    """The distributed Borůvka forest must equal the unique maximum
    spanning forest under the strict order (weight DESC, a, b) — which
    a serial Kruskal union-find computes directly."""
    edges = build_user_graph_capped(spark, SF_ORACLE).collect()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    expected = set()
    for r in sorted(edges, key=lambda r: (-r.weight, r.a, r.b)):
        ra, rb = find(r.a), find(r.b)
        if ra != rb:
            parent[ra] = rb
            expected.add((r.a, r.b, r.weight))

    from graph_database_akkatyped_spark.operators.graph_extras import (
        graph_mst_boruvka,
    )

    got = {
        (r.a, r.b, r.weight)
        for r in graph_mst_boruvka(spark, SF_ORACLE).collect()
    }
    assert got == expected
    # forest size sanity: |V| - #components
    verts = {r.a for r in edges} | {r.b for r in edges}
    roots = {find(v) for v in verts}
    assert len(got) == len(verts) - len(roots)


def test_bm25_invariants(spark):
    from graph_database_akkatyped_spark.operators.llm import (
        _BM25_NQ,
        _BM25_TOPK,
        text_bm25_topk,
    )

    rows = text_bm25_topk(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.q_doc < _BM25_NQ
        assert r.doc_id != r.q_doc
        assert 1 <= r.rnk <= _BM25_TOPK
        assert r.n_terms >= 1
        # idf > 0 by the +1 inside the log, so every matched term
        # contributes positively
        assert r.score_e8 > 0
        assert abs(r.score - r.score_e8 / 1e8) < 1e-12


def test_quality_hashed_linear_is_exact_integer(spark):
    from graph_database_akkatyped_spark.operators.curation import (
        quality_hashed_linear,
    )

    rows = quality_hashed_linear(spark, SF_ORACLE).collect()
    docs = load_table(spark, SF_ORACLE, "documents").count()
    assert len(rows) == docs  # every doc scored (weights cover all buckets)
    for r in rows:
        assert r.keep == (r.score_int > 0)
        # |score| <= n_toks * max|w| = n_toks * 10
        assert abs(r.score_int) <= r.n_toks * 10


def test_text_chunk_cdc_properties(spark):
    """Chunks tile the token sequence exactly, and chunking is
    INSERT-ROBUST: after prepending tokens to a document, all chunks
    strictly after the first boundary following the edit are identical
    (fixed-stride chunking shifts every chunk instead)."""
    from graph_database_akkatyped_spark.operators.llm import (
        text_chunk_cdc_frame,
    )

    base = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 50)
    )
    chunks = text_chunk_cdc_frame(base).collect()
    toks = {r.doc_id: r.text.split(" ") for r in base.collect()}
    bydoc: dict = {}
    for c in chunks:
        bydoc.setdefault(c.doc_id, []).append(c)
    assert set(bydoc) == set(toks)
    for d, cs in bydoc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        # exact tiling: starts/lengths cover 1..n with no gap/overlap
        pos = 1
        for c in cs:
            assert c.start == pos
            assert c.n_chunk_tokens >= 1
            pos += c.n_chunk_tokens
        assert pos == len(toks[d]) + 1
    # insert-robustness: prepend 5 tokens to each doc; the chunk-md5
    # multiset from the SECOND boundary onward must be preserved
    edited = base.select(
        "doc_id", F.concat(F.lit("xx yy zz ww vv "), F.col("text")).alias("text")
    )
    echunks = text_chunk_cdc_frame(edited).collect()
    ebydoc: dict = {}
    for c in echunks:
        ebydoc.setdefault(c.doc_id, []).append(c)
    resynced = 0
    for d, cs in bydoc.items():
        if len(cs) < 3:
            continue
        orig_tail = [c.chunk_md5 for c in cs[1:]]
        ecs = sorted(ebydoc[d], key=lambda c: c.chunk_idx)
        etails = [c.chunk_md5 for c in ecs]
        # the original tail (all chunks after the first boundary) must
        # appear as a contiguous suffix of the edited chunking
        if len(etails) >= len(orig_tail) and etails[-len(orig_tail):] == orig_tail:
            resynced += 1
    # the hash rule resynchronizes on the vast majority of docs (the
    # first chunk absorbs the edit; later chunks are unchanged)
    assert resynced >= 0.9 * sum(1 for cs in bydoc.values() if len(cs) >= 3)


def test_greedy_coloring_is_proper_and_deterministic(spark):
    from graph_database_akkatyped_spark.operators.graph_extras import (
        _COLOR_TOPK,
        graph_greedy_coloring,
    )

    out = graph_greedy_coloring(spark, SF_ORACLE).collect()
    color = {r.user_id: r.color for r in out}
    # rebuild the backbone exactly as the operator does
    ce = build_user_graph_capped(spark, SF_ORACLE)
    dsym = ce.select("a", "b", "weight").unionAll(
        ce.select(F.col("b").alias("a"), F.col("a").alias("b"), "weight")
    )
    from pyspark.sql import Window

    wtop = Window.partitionBy("a").orderBy(F.col("weight").desc(), "b")
    backbone = (
        dsym.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") <= _COLOR_TOPK)
        .select("a", "b")
        .collect()
    )
    assert set(color) == {r.a for r in backbone} | {r.b for r in backbone}
    for r in backbone:
        assert color[r.a] != color[r.b], f"edge ({r.a},{r.b}) monochromatic"
    # true re-run (not a memo fetch): evict the cached frame first
    from graph_database_akkatyped_spark.caching import clear_frame_cache

    clear_frame_cache(SF_ORACLE)
    again = {
        r.user_id: r.color
        for r in graph_greedy_coloring(spark, SF_ORACLE).collect()
    }
    assert again == color


def test_knn_graph_and_semantic_clusters_structure(spark):
    from graph_database_akkatyped_spark.operators.llm import (
        _KNN_K,
        _SEMCLUSTER_COS,
        knn_graph_build,
        semantic_clusters,
    )

    edges = knn_graph_build(spark, SF_ORACLE).collect()
    n_vecs = load_table(spark, SF_ORACLE, "embeddings").count()
    from collections import Counter

    per_src = Counter(e.src for e in edges)
    assert len(per_src) == n_vecs  # every vector got neighbors
    assert max(per_src.values()) <= _KNN_K
    for e in edges:
        assert e.src != e.dst
        assert 1 <= e.rnk <= _KNN_K
        assert -1.0 <= e.cos <= 1.0
    clusters = semantic_clusters(spark, SF_ORACLE).collect()
    assert len(clusters) == n_vecs
    byc: dict = {}
    for r in clusters:
        byc.setdefault(r.cluster, []).append(r.vec_id)
    for cid, members in byc.items():
        assert cid == min(members)  # cluster id = min member id
        assert all(
            r.cluster_size == len(members)
            for r in clusters
            if r.cluster == cid
        )
    # every strong knn edge stays within one cluster (CC soundness)
    cl = {r.vec_id: r.cluster for r in clusters}
    for e in edges:
        if e.cos >= _SEMCLUSTER_COS:
            assert cl[e.src] == cl[e.dst]


def test_node2vec_walk_continuity(spark):
    """Every walk starts at its seed and every hop is either a
    backbone edge or a dangling hold; the corpus is re-run-identical
    (pure function of the graph)."""
    from pyspark.sql import Window

    from graph_database_akkatyped_spark.operators.graph_extras import (
        _N2V_STEPS,
        _N2V_TOPK,
        _N2V_WALKS,
        graph_node2vec_walks,
    )
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph_capped,
    )

    rows = graph_node2vec_walks(spark, SF_ORACLE).collect()
    ce = build_user_graph_capped(spark, SF_ORACLE)
    dsym = ce.select("a", "b", "weight").unionAll(
        ce.select(F.col("b").alias("a"), F.col("a").alias("b"), "weight")
    )
    wtop = Window.partitionBy("a").orderBy(F.col("weight").desc(), "b")
    backbone = (
        dsym.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") <= _N2V_TOPK)
        .select("a", "b")
        .collect()
    )
    edges = {(r.a, r.b) for r in backbone} | {(r.b, r.a) for r in backbone}
    verts = {a for a, _ in edges}
    walks: dict = {}
    for r in rows:
        walks.setdefault((r.seed, r.walk_no), {})[r.step] = r.node
    assert len(walks) == len(verts) * _N2V_WALKS
    for (seed, _w), path in walks.items():
        assert len(path) == _N2V_STEPS + 1
        assert path[0] == seed
        for k in range(1, _N2V_STEPS + 1):
            a, b = path[k - 1], path[k]
            assert a == b or (a, b) in edges, f"bad hop {a}->{b}"


def test_new_keys_run_at_smoke_scale(spark):
    from graph_database_akkatyped_spark.operators.curation import (
        corpus_pipeline_funnel,
        quality_hashed_linear,
    )
    from graph_database_akkatyped_spark.operators.graph_extras import (
        graph_greedy_coloring,
        graph_mst_boruvka,
    )
    from graph_database_akkatyped_spark.operators.llm import (
        dedup_banding_recall,
        text_bm25_topk,
        text_chunk_cdc,
    )
    from graph_database_akkatyped_spark.operators.relational import (
        join_asof_forward,
    )

    for fn in (
        link_predict_resource_alloc,
        gnn_sample_fanout,
        simsearch_range,
        decontam_semantic,
        text_bm25_topk,
        graph_mst_boruvka,
        quality_hashed_linear,
        text_chunk_cdc,
        graph_greedy_coloring,
        join_asof_forward,
        dedup_banding_recall,
        corpus_pipeline_funnel,
    ):
        fn(spark, SF_SMOKE).collect()  # must run clean on tiny fixtures


def test_mis_luby_is_independent_and_maximal(spark):
    from graph_database_akkatyped_spark.operators.algos import (
        _canonical_edges,
    )
    from graph_database_akkatyped_spark.operators.graph_build import (
        user_vertices,
    )
    from graph_database_akkatyped_spark.operators.graph_extras import (
        graph_mis_luby,
    )

    mis = {r.user_id for r in graph_mis_luby(spark, SF_ORACLE).collect()}
    assert mis
    edges = [(r.a, r.b) for r in _canonical_edges(spark, SF_ORACLE).collect()]
    # independence: no strong edge joins two MIS members
    for a, b in edges:
        assert not (a in mis and b in mis), f"edge ({a},{b}) inside MIS"
    # maximality: every non-member has a MIS neighbor (else it could join)
    nbr: dict = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    verts = {r.id for r in user_vertices(spark, SF_ORACLE).collect()}
    for v in verts - mis:
        assert nbr.get(v, set()) & mis, f"vertex {v} could join the MIS"
    # isolated vertices (no strong edge) are always members
    for v in verts - set(nbr):
        assert v in mis


def test_collocation_lift_planted_phrase(spark, tmp_path):
    """text_collocation_lift on a planted corpus: 'new york' always
    co-occurs (each token appears ONLY in the phrase), filler tokens
    pair freely — the phrase must rank first and its lift must equal
    the closed-form N_uni^2 / (n_big * c_pair) exactly (all factors
    stay well under 2^53)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_database_akkatyped_spark.operators.llm import (
        text_collocation_lift,
    )

    filler = ["alpha", "beta", "gamma", "delta"]
    docs = []
    for i in range(12):
        words = [filler[(i + j) % 4] for j in range(10)]
        words[3:3] = ["new", "york"]  # one phrase occurrence per doc
        docs.append((i, " ".join(words)))
    d = tmp_path / "colloc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    out = text_collocation_lift(spark, str(d)).collect()
    assert out, "planted corpus must yield collocations"
    top = out[0]
    assert (top.ta, top.tb) == ("new", "york")
    assert top.rnk == 1
    n_uni = 12 * 12          # 12 docs x 12 tokens
    n_big = 12 * 11          # 12 docs x 11 bigrams
    c_pair = 12
    expect = (float(c_pair) * n_uni) * n_uni / ((float(n_big) * c_pair) * c_pair)
    assert top.c_ab == c_pair
    assert top.lift == expect


def test_zipf_fit_exact_recompute(spark):
    """text_zipf_fit equals an independent Python least-squares over
    the same floored-log points (exact integer sums -> one IEEE
    division), and the fit is sane: negative slope, r2 in (0, 1]."""
    import math

    from graph_database_akkatyped_spark.operators.llm import (
        _ZIPF_HEAD,
        text_zipf_fit,
    )

    row = text_zipf_fit(spark, SF_ORACLE).first()
    docs = load_table(spark, SF_ORACLE, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    vocab = sorted(
        ((r.tok, r.n) for r in toks.groupBy("tok").agg(
            F.count(F.lit(1)).alias("n")).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:_ZIPF_HEAD]
    pts = [
        (
            math.floor(math.log(float(i + 1)) * 1e6),
            math.floor(math.log(float(c)) * 1e6),
        )
        for i, (_, c) in enumerate(vocab)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num, den, dyy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert row.n == n
    assert row.slope == float(num) / float(den)
    assert row.slope < 0
    assert 0 < row.r2 <= 1
    assert row.r2 == (float(num) * float(num)) / (float(den) * float(dyy))


def test_basket_rules_exact_recompute(spark):
    """basket_association_rules: the reported measures equal an
    independent Python recompute from raw basket counts (single IEEE
    divisions of exact integers), ranks are 1..k by lift, and every
    rule clears the support floor."""
    from graph_database_akkatyped_spark.operators.relational_extras import (
        _BASKET_MIN_PAIR,
        basket_association_rules,
    )

    out = basket_association_rules(spark, SF_ORACLE).collect()
    assert out
    li = load_table(spark, SF_ORACLE, "lineitem")
    baskets = {(r.l_orderkey, r.l_partkey) for r in li.select("l_orderkey", "l_partkey").distinct().collect()}
    orders: dict = {}
    item: dict = {}
    for o, p in baskets:
        orders.setdefault(o, set()).add(p)
        item[p] = item.get(p, 0) + 1
    n_orders = len(orders)
    pair: dict = {}
    for parts in orders.values():
        sp = sorted(parts)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                pair[(sp[i], sp[j])] = pair.get((sp[i], sp[j]), 0) + 1
    for k, r in enumerate(sorted(out, key=lambda x: x.rnk)):
        assert r.rnk == k + 1
        c_ab = pair[(r.a, r.b)]
        assert c_ab >= _BASKET_MIN_PAIR
        assert r.c_ab == c_ab
        assert r.support == float(c_ab) / float(n_orders)
        assert r.conf_a_b == float(c_ab) / float(item[r.a])
        assert r.conf_b_a == float(c_ab) / float(item[r.b])
        assert r.lift == (float(c_ab) * float(n_orders)) / (
            float(item[r.a]) * float(item[r.b])
        )


def test_weighted_median_exact_recompute(spark):
    """agg_weighted_median equals an independent Python recompute: the
    smallest price whose cumulative quantity reaches half the part's
    total (ties in price broken by order/line key)."""
    from graph_database_akkatyped_spark.operators.relational_extras import (
        agg_weighted_median,
    )

    out = {
        r.l_partkey: (r.weighted_median_price, r.total_qty)
        for r in agg_weighted_median(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    ).collect()
    groups: dict = {}
    for r in li:
        groups.setdefault(r.l_partkey, []).append(r)
    assert set(out) == set(groups)
    for pk, rows in groups.items():
        rows.sort(key=lambda r: (r.l_extendedprice, r.l_orderkey, r.l_linenumber))
        tot = sum(int(r.l_quantity) for r in rows)
        cum = 0
        for r in rows:
            cum += int(r.l_quantity)
            if 2 * cum >= tot:
                assert out[pk] == (float(r.l_extendedprice), tot), pk
                break
