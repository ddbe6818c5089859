"""HITS / harmonic-centrality unit tests on tiny hand-built graphs,
plus partition invariance of the raw hits_frame (the registered key
memoizes its full result, so the registry-level invariance check would
be vacuous — drive the frame builder directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.centrality import (
    _HITS_ITERS,
    _HITS_UNIT,
    hits_frame,
)

_EDGES = [(0, 1), (0, 2), (3, 1)]
_N = 4


def _reference_hits(iters: int = _HITS_ITERS) -> tuple[dict, dict]:
    """Exact integer reference of the max-normalized alternating power
    iteration (same arithmetic as the Spark/DuckDB versions)."""
    hub = {v: _HITS_UNIT for v in range(_N)}
    auth = {}
    for _ in range(iters):
        raw = {v: sum(hub[s] for s, d in _EDGES if d == v) for v in range(_N)}
        m = max(max(raw.values()), 1)
        auth = {v: raw[v] * _HITS_UNIT // m for v in range(_N)}
        raw = {v: sum(auth[d] for s, d in _EDGES if s == v) for v in range(_N)}
        m = max(max(raw.values()), 1)
        hub = {v: raw[v] * _HITS_UNIT // m for v in range(_N)}
    return hub, auth


def _run_hits(spark):
    verts = spark.createDataFrame([(i,) for i in range(_N)], "id long")
    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    rows = hits_frame(verts, edges).collect()
    return (
        {r["id"]: r["hub"] for r in rows},
        {r["id"]: r["auth"] for r in rows},
    )


def test_hits_matches_integer_reference(spark):
    hub, auth = _run_hits(spark)
    ref_hub, ref_auth = _reference_hits()
    assert hub == ref_hub
    assert auth == ref_auth
    # structure: 0 is the dominant hub (points at both authorities),
    # 1 the dominant authority (pointed at twice); sinks have hub 0,
    # sources have auth 0
    assert hub[0] == _HITS_UNIT and auth[1] == _HITS_UNIT
    assert hub[1] == hub[2] == 0
    assert auth[0] == auth[3] == 0
    assert 0 < hub[3] < hub[0] and 0 < auth[2] < auth[1]


def test_hits_partition_invariance(spark):
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _run_hits(spark)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _run_hits(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b


def test_hits_isolated_vertex_scores_zero(spark):
    verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    rows = {r["id"]: r for r in hits_frame(verts, edges).collect()}
    assert rows[4]["hub"] == 0 and rows[4]["auth"] == 0
    assert len(rows) == 5


def test_bidirectional_dist_exact_and_unreachable(spark):
    from graph_database_akkatyped_spark.operators.graph_extras import (
        bidirectional_dist_frame,
    )

    # path 0-1-2-3-4-5 (symmetric), plus isolated pair 10-11
    chain = [(i, i + 1) for i in range(5)] + [(10, 11)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "a long, b long"
    )
    seed = lambda v: spark.createDataFrame([(v,)], "id long")  # noqa: E731
    # dist(0,5) = 5 needs half>=3 on one side: half=3 finds it exactly
    r = bidirectional_dist_frame(edges, seed(0), seed(5), half=3).collect()[0]
    assert (r["dist"], r["n_meet"]) == (5, 2)  # midpoints 2 and 3
    # beyond 2*half: reported unreachable (-1)
    r = bidirectional_dist_frame(edges, seed(0), seed(5), half=2).collect()[0]
    assert (r["dist"], r["n_meet"]) == (-1, 0)
    # genuinely disconnected
    r = bidirectional_dist_frame(edges, seed(0), seed(10), half=3).collect()[0]
    assert (r["dist"], r["n_meet"]) == (-1, 0)


def test_betweenness_sampled_path_graph(spark, tmp_path):
    """Fixed-point Brandes on an engineered path graph 1-2-3-4 (events
    co-occurrence slots (1,2), (2,3), (3,4)). Seeds = 3 smallest ids
    {1,2,3}; hand-computed directed-pair deltas sum to
    bc = {1: 0, 2: 3.0, 3: 2.0, 4: 0} in whole units."""
    import datetime as dt

    import duckdb

    from graph_database_akkatyped_spark.caching import clear_frame_cache
    from graph_database_akkatyped_spark.operators.centrality import (
        _betweenness_sql,
        betweenness_sampled,
    )

    rows = []
    slots = [(1, 2), (2, 3), (3, 4)]
    for h, (u, v) in enumerate(slots):
        for i, u_id in enumerate((u, v)):
            rows.append(
                (
                    h * 10 + i,
                    dt.datetime(2024, 1, 1, h, 5),
                    u_id,
                    "x",
                    1.0,
                    "{}",
                )
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    clear_frame_cache()  # drop memoized msbfs/uedges from other sf_dirs
    try:
        out = betweenness_sampled(spark, str(tmp_path)).toPandas()
    finally:
        clear_frame_cache()
    got = dict(zip(out.user_id, out.bc_e6))
    assert got == {1: 0, 2: 3_000_000, 3: 2_000_000, 4: 0}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    oracle = dict(
        con.execute(
            f"SELECT user_id, bc_e6 FROM ({_betweenness_sql()})"
        ).fetchall()
    )
    assert oracle == got


def test_betweenness_frame_partition_invariance(spark):
    """Fixed-point deltas are integer sums — bit-identical at any
    shuffle parallelism (the registered key memoizes its full result,
    so registry-level invariance would be vacuous; drive the frame)."""
    from graph_database_akkatyped_spark.operators.centrality import (
        betweenness_frame,
    )

    # two seeds over a 5-cycle: every vertex reachable, sigma > 1 arises
    edges = [(i, (i + 1) % 5) for i in range(5)]
    sym = edges + [(b, a) for a, b in edges]
    edf = spark.createDataFrame(sym, "a long, b long")
    rows = []
    for seed in (0, 1):
        dist = {seed: 0}
        frontier = [seed]
        while frontier:
            nxt = []
            for u in frontier:
                for a, b in sym:
                    if a == u and b not in dist:
                        dist[b] = dist[u] + 1
                        nxt.append(b)
            frontier = nxt
        rows += [(seed, v, l) for v, l in dist.items()]
    vdf = spark.createDataFrame(rows, "seed long, id long, level int")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, betweenness_frame(vdf, edf).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, betweenness_frame(vdf, edf).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b
    assert len(a) == 5 and all(d >= 0 for _, d in a)


def _modularity(labels: dict, sym_edges: list) -> float:
    """Newman modularity over directed-symmetric edge count m:
    Q = sum_c [e_c/m - (D_c/m)^2]."""
    m = len(sym_edges)
    e_c: dict = {}
    d_c: dict = {}
    for a, b in sym_edges:
        d_c[labels[a]] = d_c.get(labels[a], 0) + 1
        if labels[a] == labels[b]:
            e_c[labels[a]] = e_c.get(labels[a], 0) + 1
    return sum(
        e_c.get(c, 0) / m - (d / m) ** 2 for c, d in d_c.items()
    )


def test_louvain_beats_lpa_modularity(spark):
    """The reason Louvain exists: its one-level pass must score at
    least LPA's modularity on the fixture graph (it climbs Q directly;
    LPA optimizes nothing). Also pins structural invariants: every
    vertex labeled, communities are vertex ids, count bounded by n."""
    from graph_database_akkatyped_spark.operators.algos import (
        label_propagation,
    )
    from graph_database_akkatyped_spark.operators.centrality import (
        community_louvain_l1,
    )
    from graph_database_akkatyped_spark.operators.graph_build import (
        user_edges_sym,
        user_vertices,
    )

    sf = "/root/testdata/sf0.001"
    sym = [
        (r["a"], r["b"]) for r in user_edges_sym(spark, sf).collect()
    ]
    verts = {r["id"] for r in user_vertices(spark, sf).collect()}
    louv = {
        r["user_id"]: r["community"]
        for r in community_louvain_l1(spark, sf).collect()
    }
    lpa = {
        r["user_id"]: r["label"]
        for r in label_propagation(spark, sf).collect()
    }
    assert set(louv) == verts
    assert set(louv.values()) <= verts
    q_louv = _modularity(louv, sym)
    q_lpa = _modularity(lpa, sym)
    assert q_louv >= q_lpa - 1e-12, (q_louv, q_lpa)
    assert len(set(louv.values())) <= len(verts)


def test_louvain_deterministic_across_partitioning(spark):
    from graph_database_akkatyped_spark.operators.centrality import (
        community_louvain_l1,
    )

    sf = "/root/testdata/sf0.001"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, community_louvain_l1(spark, sf).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, community_louvain_l1(spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert a == b and len(a) > 0


def test_louvain_multi_improves_on_l1(spark):
    """The reason the second level exists: after contraction a whole
    community can move where no single vertex move was positive, so
    multi-level modularity must be >= level-1's (the level-2 sweeps
    start from the level-1 partition and every accepted move has
    strictly positive gain). Also pins that multi only ever MERGES
    level-1 communities (labels refine), and partition-count
    determinism of the full two-level pipeline."""
    from graph_database_akkatyped_spark.operators.centrality import (
        community_louvain_l1,
        community_louvain_multi,
    )
    from graph_database_akkatyped_spark.operators.graph_build import (
        user_edges_sym,
    )

    sf = "/root/testdata/sf0.001"
    sym = [(r["a"], r["b"]) for r in user_edges_sym(spark, sf).collect()]
    l1 = {
        r["user_id"]: r["community"]
        for r in community_louvain_l1(spark, sf).collect()
    }
    mu = {
        r["user_id"]: r["community"]
        for r in community_louvain_multi(spark, sf).collect()
    }
    assert set(mu) == set(l1)
    q1, qm = _modularity(l1, sym), _modularity(mu, sym)
    assert qm >= q1 - 1e-12, (qm, q1)
    # refinement: two vertices sharing a level-1 community never split
    groups: dict = {}
    for v, c in l1.items():
        groups.setdefault(c, set()).add(mu[v])
    assert all(len(s) == 1 for s in groups.values()), "multi split an l1 community"
    assert len(set(mu.values())) <= len(set(l1.values()))


def test_louvain_multi_deterministic_across_partitioning(spark):
    from graph_database_akkatyped_spark.operators.centrality import (
        community_louvain_multi,
    )

    sf = "/root/testdata/sf0.001"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, community_louvain_multi(spark, sf).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, community_louvain_multi(spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert a == b and len(a) > 0
