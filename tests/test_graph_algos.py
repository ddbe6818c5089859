"""Algorithm unit tests on tiny hand-built graphs with known answers
(SURVEY.md §5.3): diamond BFS, two triangles, weighted path SSSP."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.pregel import pregel


def _sym(edges):
    return edges + [(b, a, w) for a, b, w in edges]


def test_pregel_sssp_weighted_path(spark):
    # path 0 -1-> 1 -2-> 2 -3-> 3 -4-> 4, plus shortcut 0 -9-> 3
    edges = spark.createDataFrame(
        _sym([(0, 1, 1), (1, 2, 2), (2, 3, 3), (3, 4, 4), (0, 3, 9)]),
        "src long, dst long, weight long",
    )
    verts = spark.createDataFrame(
        [(i,) for i in range(5)], "id long"
    ).select("id", F.when(F.col("id") == 0, F.lit(0).cast("long")).alias("state"))
    res = pregel(
        verts,
        edges,
        msg=F.col("src_state") + F.col("weight"),
        agg=F.min("msg"),
        vprog=F.least(F.col("state"), F.col("agg_msg")),
        max_iter=10,
    )
    dists = {r["id"]: r["state"] for r in res.vertices.collect()}
    assert dists == {0: 0, 1: 1, 2: 3, 3: 6, 4: 10}
    assert res.converged


def test_pregel_cc_two_components(spark):
    # two disjoint triangles {0,1,2} and {10,11,12}
    tri1 = [(0, 1, 1), (1, 2, 1), (0, 2, 1)]
    tri2 = [(10, 11, 1), (11, 12, 1), (10, 12, 1)]
    edges = spark.createDataFrame(
        _sym(tri1 + tri2), "src long, dst long, weight long"
    )
    verts = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 10, 11, 12)], "id long"
    ).select("id", F.col("id").alias("state"))
    res = pregel(
        verts,
        edges,
        msg=F.col("src_state"),
        agg=F.min("msg"),
        vprog=F.least(F.col("state"), F.col("agg_msg")),
        max_iter=20,
    )
    comp = {r["id"]: r["state"] for r in res.vertices.collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_kcore_peels_pendant(spark):
    # triangle {0,1,2} is a 2-core; pendant 3-0 must be peeled
    from graph_database_akkatyped_spark.operators.algos import kcore_frame

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (0, 3), (3, 0)],
        "a long, b long",
    )
    core = {r["id"]: r["degree"] for r in kcore_frame(edges, k=2).collect()}
    assert core == {0: 2, 1: 2, 2: 2}


def test_pregel_bfs_diamond(spark):
    # diamond: 0 -> 1,2 -> 3 ; unweighted levels via min-propagation
    edges = spark.createDataFrame(
        _sym([(0, 1, 1), (0, 2, 1), (1, 3, 1), (2, 3, 1)]),
        "src long, dst long, weight long",
    )
    verts = spark.createDataFrame([(i,) for i in range(4)], "id long").select(
        "id", F.when(F.col("id") == 0, F.lit(0).cast("long")).alias("state")
    )
    res = pregel(
        verts,
        edges,
        msg=F.col("src_state") + 1,
        agg=F.min("msg"),
        vprog=F.least(F.col("state"), F.col("agg_msg")),
        max_iter=10,
    )
    lvl = {r["id"]: r["state"] for r in res.vertices.collect()}
    assert lvl == {0: 0, 1: 1, 2: 1, 3: 2}


def test_truss_keeps_clique_and_peels_cascade(spark):
    """4-truss ground truths: a 4-clique survives whole (every edge in
    2 triangles); two triangles sharing one edge cascade to empty —
    the shared edge has support 2 only until its neighbors peel."""
    from graph_database_akkatyped_spark.operators.algos import truss_frame

    def edges(pairs):
        return spark.createDataFrame(sorted(pairs), "a long, b long")

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    kept = truss_frame(edges(clique)).collect()
    assert sorted((r["a"], r["b"]) for r in kept) == sorted(clique)

    bowtie = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]  # T(0,1,2)+T(1,2,3)
    assert truss_frame(edges(bowtie)).count() == 0

    # clique + pendant cascade together: clique stays, cascade dies
    both = clique + [(10, 11), (10, 12), (11, 12), (11, 13), (12, 13)]
    kept = truss_frame(edges(both)).collect()
    assert sorted((r["a"], r["b"]) for r in kept) == sorted(clique)


def test_truss_fixpoint_at_exactly_max_rounds(spark):
    """A cascade that shrinks for exactly max_rounds rounds must still
    converge: detecting the fixpoint costs one extra no-change round,
    which may not be charged against the shrink budget (the unrolled
    SQL oracle's e{max_rounds} IS the correct fixpoint here)."""
    from graph_database_akkatyped_spark.operators.algos import truss_frame

    # bowtie peels in exactly 2 shrinking rounds (support-1 edges die
    # in round 1, the stranded shared edge in round 2)
    bowtie = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], "a long, b long"
    )
    assert truss_frame(bowtie, max_rounds=2).count() == 0


def test_hot_slot_cap_bounds_pair_blowup(spark):
    """One (event_type, hour) slot with 10^4 users: the uncapped pair
    join would emit k(k-1)/2 ~ 5*10^7 rows from this single slot (the
    100 TB launch-spike failure mode); the capped path completes
    instantly with a constant-bounded output and picks exactly the
    highest-activity users (ties -> smaller id)."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        _SLOT_CAP,
        slot_capped_users,
    )

    n = 10_000
    base = spark.range(n).select(
        F.col("id").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("hour"),
    )
    # users 0..31 get a second event -> they must win the cap rank
    e = base.unionAll(base.where(F.col("user_id") < _SLOT_CAP))

    top = slot_capped_users(e)
    assert sorted(r["user_id"] for r in top.collect()) == list(
        range(_SLOT_CAP)
    )

    uncapped_pairs = n * (n - 1) // 2  # what the unguarded join emits
    a = top.select(F.col("user_id").alias("a"), "event_type", "hour")
    b = top.select(F.col("user_id").alias("b"), "event_type", "hour")
    got = (
        a.join(b, ["event_type", "hour"]).where(F.col("a") < F.col("b")).count()
    )
    assert got == _SLOT_CAP * (_SLOT_CAP - 1) // 2
    assert got < uncapped_pairs // 100_000


def test_capped_user_graph_is_subgraph(spark):
    """On real fixtures the capped graph is a subgraph of the uncapped
    one with pointwise-bounded weights (capped shared-slot counts can
    only drop) — the invariant that makes the capped variant a safe
    production substitute."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph,
        build_user_graph_capped,
    )

    sf = "/root/testdata/sf0.001"
    full = build_user_graph(spark, sf)
    capped = build_user_graph_capped(spark, sf)
    joined = capped.alias("c").join(
        full.alias("f"), ["a", "b"], "left"
    )
    n_capped = capped.count()
    assert n_capped > 0
    # every capped edge exists uncapped, with weight <= uncapped weight
    ok = joined.where(
        F.col("f.weight").isNotNull()
        & (F.col("c.weight") <= F.col("f.weight"))
    ).count()
    assert ok == n_capped


def test_triangle_family_under_hub_skew(spark):
    """Power-law stress for the triangle family: one 1000-degree hub
    owns ~all wedges (C(1000,2) ~ 5e5 at this size; the shape AQE's
    skew handling must absorb at 100 TB). Hub 0 -> leaves 1..H plus a
    leaf ring gives exact analytic ground truths: H triangles
    (0,i,i+1), every hub edge closes exactly 2, every ring edge exactly
    1 — and the 4-truss cascades to empty (ring support 1 peels first,
    stranding the hub edges)."""
    from graph_database_akkatyped_spark.operators.algos import (
        _tri_enumerate,
        _tri_support_ok,
        truss_frame,
    )

    H = 1000
    hub = [(0, i) for i in range(1, H + 1)]
    ring = [(i, i + 1) for i in range(1, H)] + [(1, H)]
    ce = spark.createDataFrame(sorted(hub + ring), "a long, b long")

    # the exact join shape _triangles uses (canonical x<y<z)
    e1 = ce.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = ce.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = ce.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
    assert tri.count() == H  # (0,i,i+1) for the ring + the wrap

    # per-edge common-neighbor counts (mutual_neighbors/edge_jaccard
    # plan): hub edges close 2 triangles, ring edges 1
    pairs = (
        tri.select(F.col("x").alias("p"), F.col("y").alias("q"))
        .unionAll(tri.select(F.col("x").alias("p"), F.col("z").alias("q")))
        .unionAll(tri.select(F.col("y").alias("p"), F.col("z").alias("q")))
    )
    common = pairs.groupBy("p", "q").agg(F.count(F.lit(1)).alias("n"))
    by_kind = {
        r["is_hub"]: (r["lo"], r["hi"])
        for r in common.groupBy((F.col("p") == 0).alias("is_hub"))
        .agg(F.min("n").alias("lo"), F.max("n").alias("hi"))
        .collect()
    }
    assert by_kind[True] == (2, 2)
    assert by_kind[False] == (1, 1)

    # truss peeling under the same skew: ring edges (support 1) die in
    # round 1, the stranded hub star follows — exact empty fixpoint
    one_round = ce.join(
        _tri_support_ok(_tri_enumerate(ce)), ["a", "b"], "left_semi"
    )
    assert one_round.where(F.col("a") != 0).count() == 0
    assert truss_frame(ce).count() == 0


def test_triangle_count_approx_deterministic_and_close(spark):
    """DOULION-style sampled count: deterministic across invocations
    (md5 gate, not rand()) and within sampling error of the exact
    count on the sf0.01 fixture."""
    from graph_database_akkatyped_spark.operators.algos import (
        triangle_count,
        triangle_count_approx,
    )

    sf = "/root/testdata/sf0.01"
    a = triangle_count_approx(spark, sf).first()
    b = triangle_count_approx(spark, sf).first()
    assert tuple(a) == tuple(b)  # deterministic, unlike rand() sampling
    exact = triangle_count(spark, sf).first()["n_triangles"]
    assert a["n_triangles_est"] == a["n_triangles_sampled"] * 64
    # q=1/4 edge sampling at ~1.4k triangles: generous 35% error bound
    assert abs(a["n_triangles_est"] - exact) / exact < 0.35


def test_directed_edges_cap_is_subset(spark):
    """user_directed_edges(cap=...) must be a subset of the uncapped
    succession graph — same guard contract as user_edges_sym."""
    from graph_database_akkatyped_spark.operators.graph_extras import (
        user_directed_edges,
    )

    sf = "/root/testdata/sf0.001"
    full = user_directed_edges(spark, sf)
    capped = user_directed_edges(spark, sf, cap=8)
    n_capped = capped.count()
    assert n_capped > 0
    assert capped.join(full, ["src", "dst"], "left_semi").count() == n_capped
    assert n_capped <= full.count()


def test_cc_incremental_merges_and_new_vertices(spark, tmp_path):
    """The contracted-merge path must be EXACT: a delta batch that (a)
    bridges two base components and (b) introduces a brand-new vertex
    must produce the same labels as batch CC on the full graph. Base:
    slot A = {1, 2}, slot B = {3, 4} (two components, anchors 1 and
    3). Delta (event_id % 20 == 0): user 2 appears in slot B (merges
    the components -> everyone labeled 1) and new user 9 shares fresh
    slot C with base user 4."""
    import datetime

    from graph_database_akkatyped_spark.operators.algos import (
        cc_incremental,
        connected_components,
    )

    def ev(eid, hour, uid, etype):
        return (
            eid,
            datetime.datetime(2024, 1, 1, hour, 0, 0),
            uid,
            etype,
            1.0,
            "{}",
        )

    rows = [
        # base (event_id % 20 != 0)
        ev(1, 0, 1, "a"), ev(2, 0, 2, "a"),      # slot A: {1,2}
        ev(3, 1, 3, "a"), ev(4, 1, 4, "a"),      # slot B: {3,4}
        ev(5, 2, 4, "c"),                        # slot C: base user 4
        # delta (event_id % 20 == 0)
        ev(20, 1, 2, "a"),                       # user 2 -> slot B
        ev(40, 2, 9, "c"),                       # NEW user 9 -> slot C
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")

    inc = sorted(map(tuple, cc_incremental(spark, sf).collect()))
    batch = sorted(map(tuple, connected_components(spark, sf).collect()))
    assert inc == batch
    labels = dict(inc)
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 9: 1}


def test_cc_incremental_contracted_graph_is_small(spark):
    """The incremental claim quantified on the fixture: the second CC
    runs on #base-components + #new-vertices nodes, far fewer than
    the full vertex set (otherwise the key is a rebuild in disguise)."""
    from graph_database_akkatyped_spark.catalog import load_table
    from graph_database_akkatyped_spark.operators.algos import (
        _CC_DELTA_MOD,
        cc_frame,
    )
    from graph_database_akkatyped_spark.operators.graph_build import (
        user_edges_sym,
        user_vertices,
    )

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "events")
    base_users = (
        e.where((F.col("event_id") % _CC_DELTA_MOD) != 0)
        .select("user_id")
        .distinct()
    )
    n_full = user_vertices(spark, sf).count()
    base_verts = base_users.select(F.col("user_id").alias("id"))
    # components of the base graph (delta events excluded)
    base_ev = e.where((F.col("event_id") % _CC_DELTA_MOD) != 0).select(
        F.col("user_id"),
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
    )
    a = base_ev.select(F.col("user_id").alias("a"), "event_type", "hour")
    b = base_ev.select(F.col("user_id").alias("b"), "event_type", "hour")
    base_edges = (
        a.join(b, ["event_type", "hour"])
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    n_comp = (
        cc_frame(base_verts, base_edges)
        .select("component")
        .distinct()
        .count()
    )
    n_new = n_full - base_users.count()
    assert n_comp + n_new < n_full / 3, (n_comp, n_new, n_full)


def test_link_predict_jaccard_invariants(spark):
    """Link-prediction invariants on the fixture: no predicted pair is
    an existing capped-graph edge, every pair has >= 1 common
    neighbor, jacc_e6 is the floor of 1e6*jaccard, at most _LP_TOPK
    rows per x, and the rank ordering follows (jacc_e6 desc, cn desc,
    y asc)."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph_capped,
    )
    from graph_database_akkatyped_spark.operators.graph_extras import (
        _LP_TOPK,
        link_predict_jaccard,
    )

    sf = "/root/testdata/sf0.01"
    rows = link_predict_jaccard(spark, sf).collect()
    assert rows
    edges = {
        (r["a"], r["b"])
        for r in build_user_graph_capped(spark, sf).collect()
    }
    per_x: dict = {}
    for r in rows:
        assert (r["x"], r["y"]) not in edges
        assert r["x"] < r["y"] and r["cn"] >= 1
        denom = r["d_x"] + r["d_y"] - r["cn"]
        assert r["jacc_e6"] == (r["cn"] * 1_000_000) // denom
        assert abs(r["jaccard"] - r["cn"] / denom) < 1e-15
        per_x.setdefault(r["x"], []).append(r)
    for x, lst in per_x.items():
        assert len(lst) <= _LP_TOPK
        lst.sort(key=lambda r: r["rnk"])
        keys = [(-r["jacc_e6"], -r["cn"], r["y"]) for r in lst]
        assert keys == sorted(keys), x


def test_cc_twophase_matches_union_find(spark):
    """cc_twophase_frame == a python union-find on a random graph AND
    closes a high-diameter path — the case O(diameter) kernels
    (cc_frame, pointer doubling) cannot afford, which is exactly why
    the Borůvka contraction uses this kernel."""
    import random

    from pyspark.sql import functions as F

    from graph_database_akkatyped_spark.operators.graph_extras import (
        cc_twophase_frame,
    )

    random.seed(11)
    n, m = 400, 320
    edges = [(random.randrange(n), random.randrange(n)) for _ in range(m)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_members: dict = {}
    for v in range(n):
        comp_members.setdefault(find(v), []).append(v)
    canon = {}
    for vs in comp_members.values():
        mn = min(vs)
        for v in vs:
            canon[v] = mn

    e = spark.createDataFrame(edges, "a long, b long")
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    verts = spark.range(n).select(F.col("id"))
    got = {
        r["id"]: r["component"]
        for r in cc_twophase_frame(verts, sym).collect()
    }
    assert got == canon

    # shuffled-id path: one component, labeled by its min id
    perm = list(range(300))
    random.shuffle(perm)
    pe = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(299)], "a long, b long"
    )
    psym = pe.unionByName(
        pe.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    plab = cc_twophase_frame(spark.range(300).select("id"), psym)
    assert plab.select("component").distinct().count() == 1
    assert plab.agg(F.min("component")).collect()[0][0] == 0


def test_truss_incremental_matches_recompute_peel(spark):
    """Round-10 refactor lock: truss_frame's INCREMENTAL peel
    (triangles enumerated once, shrunk by three anti-joins per round)
    must reach the exact fixpoint of the recompute-from-scratch peel —
    the formulation the unrolled SQL oracle mirrors — on topologies
    spanning dense-survivor, full-cascade-to-empty, and sparse-empty
    regimes. Graphs are deterministic (md5 gate over ordered pairs),
    so a divergence is a logic bug, never flakiness."""
    import hashlib

    from graph_database_akkatyped_spark.caching import cut
    from graph_database_akkatyped_spark.operators.algos import (
        _tri_enumerate,
        _tri_support_ok,
        truss_frame,
    )

    def recompute_truss(edges, max_rounds=64):
        e = edges.transform(cut)
        prev = e.count()
        for _ in range(max_rounds + 1):
            ok = _tri_support_ok(_tri_enumerate(e))
            e = e.join(ok, ["a", "b"], "left_semi").transform(cut)
            n = e.count()
            if n == prev:
                return e
            prev = n
        raise AssertionError("no fixpoint")

    def gate(a, b, pct):
        h = hashlib.md5(f"{a}_{b}".encode()).hexdigest()
        return int(h[:8], 16) % 100 < pct

    for n_v, pct in ((40, 35), (60, 12), (80, 5)):
        edges = [
            (a, b)
            for a in range(n_v)
            for b in range(a + 1, n_v)
            if gate(a, b, pct)
        ]
        ce = spark.createDataFrame(edges, "a long, b long")
        got = truss_frame(ce).collect()
        want = recompute_truss(ce).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), (
            n_v,
            pct,
            len(got),
            len(want),
        )
