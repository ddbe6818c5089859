"""Graph-algorithm extensions beyond SURVEY.md §2-C.

Personalized PageRank (seeded restart), DAG longest-path layering,
per-edge neighborhood Jaccard similarity, and a bounded bipartite
projection (customer co-purchase via shared parts).

Determinism discipline matches operators.algos: integer µ-unit
arithmetic for rank masses, canonical (a<b) edges, exact-decimal
weights for rankings — every key hash-matches its unrolled-SQL DuckDB
oracle.

Scale notes: PPR runs on the Pregel kernel (checkpointed lineage,
shuffle-key reuse); longest-path joins only the frontier-carrying edge
list per round; edge Jaccard is bounded by the triangle count (same
plan family as triangle_count); the bipartite projection caps the
per-part fan-out at top-3 customers, so output is ≤ 3 pairs per part —
linear, never |customers-per-part|² (the classic projection blow-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from graph_database_akkatyped_spark.caching import (
    cut,
    memoized_checkpoint as _memoized,
    release_cut,
    _unpersist_ids,
)
from graph_database_akkatyped_spark.catalog import load_table
from graph_database_akkatyped_spark.operators.algos import (
    _BASE,
    _SEED_SQL,
    _TRI_BASE,
    _UNIT,
    _canonical_edges,
    _edge_common_counts,
    bfs_frame,
)
from graph_database_akkatyped_spark.operators.graph_build import (
    NATION_EDGES_CTE,
    USER_EDGES_CTE,
    nation_edges,
    user_edges_sym,
    user_vertices,
)
from graph_database_akkatyped_spark.operators.pregel import pregel

_PPR_ITERS = 5


def ppr_frame(
    verts: DataFrame, edges_sym: DataFrame, seed_id: int, iters: int
) -> DataFrame:
    """Personalized PageRank: random walk with restart to a single seed,
    damping 0.85, fixed supersteps, INTEGER µ-units (exact integer
    arithmetic -> bit-reproducible across partitionings and engines).
    Only the seed receives the 0.15 restart mass each step."""
    v = verts.select(
        "id",
        F.when(F.col("id") == seed_id, F.lit(_UNIT))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("state"),
    )
    deg = edges_sym.groupBy(F.col("a").alias("src")).agg(
        F.count(F.lit(1)).alias("weight")
    )
    # cut once: same per-superstep deg-recompute fix as pagerank_frame
    e = cut(
        edges_sym.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).join(deg, "src")
    )
    res = pregel(
        v,
        e,
        msg=F.expr("src_state div weight"),
        agg=F.sum("msg"),
        vprog=F.expr(
            f"CAST(CASE WHEN id = {seed_id} THEN {_BASE} ELSE 0 END "
            f"+ (85 * coalesce(agg_msg, 0)) div 100 AS LONG)"
        ),
        max_iter=iters,
        check_convergence=False,
    )
    return res.vertices.select(
        "id",
        F.col("state").alias("rank_e12"),
        (F.col("state").cast("double") / F.lit(1e12)).alias("rank"),
    )


def pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPR from the min user id over the user graph (reference analog:
    'related vertices' ranked from a query vertex). The seed fetch is
    the one sanctioned scalar driver action (same as BFS seeds)."""
    from graph_database_akkatyped_spark.operators.algos import _uedges_memo

    events = load_table(spark, sf_dir, "events")
    seed = events.agg(F.min("user_id")).first()[0]
    return ppr_frame(
        user_vertices(spark, sf_dir),
        _uedges_memo(spark, sf_dir),
        seed,
        _PPR_ITERS,
    ).select(F.col("id").alias("user_id"), "rank_e12", "rank")


def _ppr_sql(iters: int = _PPR_ITERS) -> str:
    ctes = [
        USER_EDGES_CTE.strip(),
        "deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM uedges GROUP BY a)",
        f"seed AS (SELECT {_SEED_SQL} AS s)",
        f"r0 AS (SELECT v, CAST(CASE WHEN v = (SELECT s FROM seed) "
        f"THEN {_UNIT} ELSE 0 END AS BIGINT) AS r FROM verts)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"m{i} AS (SELECT u.b AS v, CAST(SUM(r{i-1}.r // deg.d) AS BIGINT) AS s "
            f"FROM uedges u JOIN deg ON deg.a = u.a "
            f"JOIN r{i-1} ON r{i-1}.v = u.a GROUP BY u.b)"
        )
        ctes.append(
            f"r{i} AS (SELECT verts.v, CAST("
            f"CASE WHEN verts.v = (SELECT s FROM seed) THEN {_BASE} ELSE 0 END "
            f"+ (85 * COALESCE(m{i}.s, 0)) // 100 "
            f"AS BIGINT) AS r FROM verts LEFT JOIN m{i} ON m{i}.v = verts.v)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS user_id, r AS rank_e12, CAST(r AS DOUBLE) / 1e12 AS rank "
        f"FROM r{iters}"
    )


_TOPO_ROUNDS = 6


def topo_longest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-path layer per vertex in the canonical strong-edge DAG
    (a<b orients every edge low->high, so the graph is acyclic by
    construction — the standard trick for dependency-layering a
    symmetric graph). Fixed ≤6-edge horizon on both engines.

    Per round only (edges ⋈ current-layer) is joined — no all-pairs
    path enumeration; layers are localCheckpoint-ed (flat lineage).
    """
    ce = _canonical_edges(spark, sf_dir)
    verts = (
        ce.select(F.col("a").alias("id"))
        .unionAll(ce.select(F.col("b").alias("id")))
        .distinct()
    )
    d = verts.withColumn("depth", F.lit(0).cast("long"))
    for _ in range(_TOPO_ROUNDS):
        msgs = (
            ce.join(d.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.max(F.col("depth") + 1).alias("m"))
        )
        d = (
            d.join(msgs, "id", "left")
            .select(
                "id",
                F.greatest("depth", F.coalesce("m", F.lit(0))).alias("depth"),
            )
            .transform(cut)
        )
    return d.select(F.col("id").alias("user_id"), "depth")


_TOPO_SQL = (
    _TRI_BASE.replace("WITH ce AS", "WITH RECURSIVE ce AS")
    + f"""
, dverts AS (SELECT DISTINCT v FROM (
    SELECT a AS v FROM ce UNION ALL SELECT b AS v FROM ce)),
paths(v, len) AS (
  SELECT v, CAST(0 AS BIGINT) FROM dverts
  UNION
  SELECT e.b, p.len + 1
  FROM paths p JOIN ce e ON e.a = p.v
  WHERE p.len < {_TOPO_ROUNDS}
)
SELECT v AS user_id, max(len) AS depth FROM paths GROUP BY v
"""
)


def edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard similarity per strong edge (x<y):
    |N(x)∩N(y)| / |N(x)∪N(y) \\ {x,y}| — the standard link-prediction /
    edge-strength score.

    Common-neighbor counts come from the shared canonical a<b<c
    triangle frame (``algos._edge_common_counts`` — intermediates
    bounded by the triangle count, as in ``mutual_neighbors``); degrees
    are one groupBy over the symmetric edge view. Integers throughout,
    one rounded division at the end.
    """
    ce = _canonical_edges(spark, sf_dir)
    common = _edge_common_counts(spark, sf_dir)
    deg = (
        ce.select(F.col("a").alias("v"))
        .unionAll(ce.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    denom = F.col("deg_a") + F.col("deg_b") - 2 - F.col("n_common")
    return (
        ce.join(
            common, (ce["a"] == common["p"]) & (ce["b"] == common["q"]), "left"
        )
        .withColumn("n_common", F.coalesce("n_common", F.lit(0).cast("long")))
        .join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("x"),
            F.col("b").alias("y"),
            "n_common",
            F.when(denom > 0, F.round(F.col("n_common") / denom, 6))
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


_EDGE_JACCARD_SQL = (
    _TRI_BASE.replace("WITH ce AS", "WITH ce AS MATERIALIZED")
    + """
, tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1 JOIN ce e2 ON e2.a = e1.b JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
),
pc AS (
  SELECT p, q, count(*) AS n_common FROM (
    SELECT x AS p, y AS q FROM tri
    UNION ALL SELECT x AS p, z AS q FROM tri
    UNION ALL SELECT y AS p, z AS q FROM tri
  ) GROUP BY p, q
),
deg AS (
  SELECT v, count(*) AS deg FROM (
    SELECT a AS v FROM ce UNION ALL SELECT b AS v FROM ce
  ) GROUP BY v
)
SELECT ce.a AS x, ce.b AS y,
       CAST(COALESCE(pc.n_common, 0) AS BIGINT) AS n_common,
       CASE WHEN da.deg + db.deg - 2 - COALESCE(pc.n_common, 0) > 0
            THEN round(CAST(COALESCE(pc.n_common, 0) AS DOUBLE)
                       / (da.deg + db.deg - 2 - COALESCE(pc.n_common, 0)), 6)
            ELSE 0.0 END AS jaccard
FROM ce
LEFT JOIN pc ON pc.p = ce.a AND pc.q = ce.b
JOIN deg da ON da.v = ce.a
JOIN deg db ON db.v = ce.b
"""
)


_PROJ_TOPK = 3


def bipartite_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded bipartite projection: customer–customer co-purchase
    edges via shared parts, keeping only each part's top-3 customers by
    exact-decimal quantity (ties -> smaller custkey).

    The cap is the scale story: an uncapped projection is quadratic in
    customers-per-part (a hot part at 100 TB links millions of customer
    pairs); top-k per part bounds output at k(k-1)/2 pairs per part and
    the rank is a single window over the part-customer aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pc = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_partkey", "o_custkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("qty"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("qty"), F.asc("o_custkey")
    )
    top = pc.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= _PROJ_TOPK
    )
    t1 = top.select(
        F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("c1")
    )
    t2 = top.select(
        F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("c2")
    )
    return (
        t1.join(t2, "pk")
        .where(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n_shared_parts"))
    )


_BIPARTITE_SQL = f"""
WITH pc AS (
  SELECT l_partkey, o_custkey,
         sum(CAST(l_quantity AS DECIMAL(30,2))) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey, o_custkey
),
top AS (
  SELECT l_partkey, o_custkey FROM pc
  QUALIFY row_number() OVER (
    PARTITION BY l_partkey ORDER BY qty DESC, o_custkey ASC) <= {_PROJ_TOPK}
)
SELECT t1.o_custkey AS c1, t2.o_custkey AS c2, count(*) AS n_shared_parts
FROM top t1 JOIN top t2
  ON t1.l_partkey = t2.l_partkey AND t1.o_custkey < t2.o_custkey
GROUP BY t1.o_custkey, t2.o_custkey
"""


def sssp_pred_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSSP with predecessor tree — the reference's traversal that
    returns the PATH, not just the distance [R ask-pattern reply]:
    after distance relaxation converges, each vertex's parent is the
    min-id predecessor lying on a shortest path (dist[src] + w ==
    dist[dst]). The parent recovery is one extra edge⋈dist⋈dist join —
    no per-path backtracking loop; the full tree materializes at once
    and any path is read off by following parents."""
    from graph_database_akkatyped_spark.operators.algos import sssp_weighted

    dist = sssp_weighted(spark, sf_dir).select(
        F.col("n_nationkey").alias("v"), "dist"
    )
    edges = nation_edges(spark, sf_dir).select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        "weight",
    )
    ds = dist.select(F.col("v").alias("src"), F.col("dist").alias("d_src"))
    dd = dist.select(F.col("v").alias("dst"), F.col("dist").alias("d_dst"))
    pred = (
        edges.join(ds, "src")
        .join(dd, "dst")
        .where(F.col("d_src") + F.col("weight") == F.col("d_dst"))
        .groupBy(F.col("dst").alias("v"))
        .agg(F.min("src").alias("pred"))
    )
    return dist.join(pred, "v", "left").select(
        F.col("v").alias("n_nationkey"), "dist", "pred"
    )


_PRED_TREE_SQL = f"""
WITH RECURSIVE {NATION_EDGES_CTE},
paths(v, d) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, p.d + e.w
  FROM paths p JOIN nedges e ON e.src = p.v
  WHERE p.d + e.w <= 25
),
dist AS (SELECT CAST(v AS BIGINT) AS v, min(d) AS dist FROM paths GROUP BY v),
pred AS (
  SELECT CAST(e.dst AS BIGINT) AS v, min(CAST(e.src AS BIGINT)) AS pred
  FROM nedges e
  JOIN dist ds ON ds.v = e.src
  JOIN dist dd ON dd.v = e.dst
  WHERE ds.dist + e.w = dd.dist
  GROUP BY e.dst
)
SELECT d.v AS n_nationkey, d.dist, p.pred
FROM dist d LEFT JOIN pred p ON p.v = d.v
"""


def graph_activity_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal graph evolution: per hour — event volume, active users,
    FIRST-SEEN users, and the cumulative vertex count (how the user
    graph grows over the journal [R journal replay]). First-seen is a
    groupBy(min), the cumulative sum is a window over the tiny hourly
    rollup (thousands of rows however large the journal)."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", "ts")
    hourly = ev.groupBy(hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_active"),
    )
    first_seen = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .groupBy(F.date_trunc("hour", "first_ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hourly.join(first_seen, "hr", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0).cast("long")))
        .withColumn("cum_users", F.sum("n_new").over(w))
    )


_ACTIVITY_TIMELINE_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_active
  FROM events GROUP BY 1
),
first_seen AS (
  SELECT date_trunc('hour', first_ts) AS hr, count(*) AS n_new
  FROM (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_ts
        FROM events GROUP BY user_id)
  GROUP BY 1
)
SELECT h.hr, h.n_events, h.n_active,
       COALESCE(f.n_new, 0) AS n_new,
       CAST(sum(COALESCE(f.n_new, 0)) OVER (
         ORDER BY h.hr ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM hourly h LEFT JOIN first_seen f ON f.hr = h.hr
"""


# ------------------------------------------- deterministic random walks

_WALKS_PER_SEED = 3
_WALK_STEPS = 4


def _walk_hash(step: int) -> str:
    """48-bit integer hash of (seed, walk_no, step) — the per-hop
    pseudo-random draw, identical in Spark and DuckDB."""
    return (
        f"CAST(conv(substring(md5(concat(CAST(seed AS STRING), '_', "
        f"CAST(walk_no AS STRING), '_', CAST({step} AS STRING))), 1, 12), "
        f"16, 10) AS BIGINT)"
    )


def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec-style walk sampling over the user graph: from every
    vertex, ``_WALKS_PER_SEED`` independent walks of ``_WALK_STEPS``
    steps. The next hop indexes the current vertex's SORTED neighbor
    array at ``hash(seed, walk_no, step) mod degree`` — the adjacency-
    array (alias-table) sampling layout: a deterministic stand-in for
    the uniform draw, so the sampled corpus is bit-reproducible
    (re-running a failed executor cannot produce different walks, and
    the DuckDB oracle hash-matches). Dangling vertices stay in place
    (lazy self-loop), keeping one row per (seed, walk, step).

    Scale shape: adjacency arrays are built ONCE (one groupBy over the
    edge list, memoized/materialized); each step is then one join of
    |walks| rows against the adjacency table + one O(1) array index —
    per-step cost O(#walks), NOT O(#walks x degree) as the naive
    per-candidate-argmin formulation costs (measured 4.6 s -> 1 s at
    sf0.1, and degree can be 10^5 on a real social graph). Here the
    adjacency side broadcasts; at 100 TB co-partition walks and
    adjacency on the vertex key instead and the shuffle reuses one
    partitioning across all L steps.
    """
    verts = user_vertices(spark, sf_dir)
    # neighbor arrays, sorted for a canonical index order; built from
    # the events self-join once and memoized across invocations
    adj = _memoized(
        spark,
        "uadj",
        sf_dir,
        lambda: user_edges_sym(spark, sf_dir)
        .groupBy(F.col("a").alias("cur"))
        .agg(F.array_sort(F.collect_list("b")).alias("nbrs")),
    )
    state = verts.select(F.col("id").alias("seed")).crossJoin(
        spark.range(_WALKS_PER_SEED).select(
            F.col("id").cast("int").alias("walk_no")
        )
    ).withColumn("cur", F.col("seed"))
    steps = [
        state.select(
            "seed", "walk_no", F.lit(0).alias("step"),
            F.col("cur").alias("node"),
        )
    ]
    for k in range(1, _WALK_STEPS + 1):
        pick = F.expr(
            f"element_at(nbrs, CAST({_walk_hash(k)} % size(nbrs) AS INT) + 1)"
        )
        # eager cut per step: without it, unioning the L step frames
        # re-evaluates every prefix of the walk chain (1+2+..+L joins)
        state = (
            state.join(F.broadcast(adj), "cur", "left")
            .select(
                "seed",
                "walk_no",
                F.coalesce(pick, F.col("cur")).alias("cur"),
            )
            .transform(cut)
        )
        steps.append(
            state.select(
                "seed", "walk_no", F.lit(k).alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _walks_sql() -> str:
    ctes = [USER_EDGES_CTE.strip().rstrip(",")]
    ctes.append(
        "adj AS (SELECT a AS cur, list_sort(list(b)) AS nbrs "
        "FROM uedges GROUP BY a)"
    )
    walks_vals = ", ".join(f"({i})" for i in range(_WALKS_PER_SEED))
    ctes.append(
        f"w0 AS (SELECT v AS seed, CAST(t.w AS INT) AS walk_no, v AS cur "
        f"FROM verts, (VALUES {walks_vals}) t(w))"
    )
    for k in range(1, _WALK_STEPS + 1):
        h = (
            f"CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || '_' || "
            f"CAST(walk_no AS VARCHAR) || '_' || CAST({k} AS VARCHAR)), "
            f"1, 12) AS BIGINT)"
        )
        ctes.append(
            f"w{k} AS (SELECT seed, walk_no, "
            f"COALESCE(nbrs[CAST({h} % len(nbrs) AS INT) + 1], cur) AS cur "
            f"FROM w{k - 1} LEFT JOIN adj USING (cur))"
        )
    selects = [
        f"SELECT seed, walk_no, CAST({k} AS INT) AS step, cur AS node FROM w{k}"
        for k in range(_WALK_STEPS + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


# -------------------------------------- strongly connected components

_SCC_GATE_PCT = 5
_SCC_ROUNDS = 10

DIRECTED_EDGES_CTE = f"""
dedges AS (
  SELECT src, dst FROM (
    SELECT DISTINCT e1.user_id AS src, e2.user_id AS dst
    FROM events e1 JOIN events e2
      ON e1.event_type = e2.event_type
     AND date_trunc('hour', CAST(e2.ts AS TIMESTAMP))
         = date_trunc('hour', CAST(e1.ts AS TIMESTAMP)) + INTERVAL 1 HOUR
     AND e1.user_id <> e2.user_id
  )
  WHERE CAST('0x' || substr(md5(CAST(src AS VARCHAR) || '_'
          || CAST(dst AS VARCHAR)), 1, 8) AS BIGINT) % 100 < {_SCC_GATE_PCT}
),
verts AS (SELECT DISTINCT user_id AS v FROM events)
"""


def user_directed_edges(
    spark: SparkSession, sf_dir: str, cap: int | None = None
) -> DataFrame:
    """Directed succession graph: ``src -> dst`` when dst repeats src's
    event type in the NEXT hour, thinned to a deterministic
    {_SCC_GATE_PCT}% by an md5 gate on the (src, dst) pair — temporal
    direction gives real asymmetry (cycles exist but edges don't pair
    up), and the hash gate keeps the graph sparse enough that its SCC
    structure is non-trivial. Equi-join on the (event_type, hour) slot
    key, never a theta join.

    ``cap`` applies the per-slot membership guard
    (graph_build.slot_capped_users) before the succession join — the
    hot-slot k² protection for cluster runs; default None preserves
    the exact semantics the registered SCC/HITS/walk oracles pin."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        slot_capped_users,
    )

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("hour")
    )
    if cap is not None:
        e = slot_capped_users(e, cap)
    a = e.select(F.col("user_id").alias("src"), "event_type", "hour")
    b = e.select(
        F.col("user_id").alias("dst"),
        "event_type",
        (F.col("hour") - F.expr("INTERVAL 1 HOUR")).alias("hour"),
    )
    gate = (
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(src AS STRING), '_', "
            "CAST(dst AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        )
        % 100
        < _SCC_GATE_PCT
    )
    return (
        a.join(b, ["event_type", "hour"])
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .where(gate)
    )


# ------------------------------------------- temporal reachability

_TEMPORAL_HOPS = 6       # earliest arrival over paths of <= 6 edges
_TEMPORAL_SEED_MOD = 300  # seeds: user_id % 300 == 0 (~V/300, scales)
_TEMPORAL_EPOCH = "1990-01-01 00:00:00"  # seeds active before all data


def graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-arrival TEMPORAL reachability (time-respecting paths):
    from a deterministic seed set, which users does influence reach
    within ``_TEMPORAL_HOPS`` contact hops, and when — where a contact
    edge (src -> dst at time t) is usable only if t >= the arrival
    time at src. This is the contagion / information-diffusion query a
    static reachability (sql_recursive_reachability) cannot express:
    paths must be monotone in time, so A->B->C counts only if B's
    contact with C happens AFTER B was reached.

    Kernel: Bellman-Ford rounds on the min-arrival label — round r
    holds the earliest arrival over paths of <= r edges. Extending
    only from the per-vertex MIN is lossless (an earlier arrival can
    use every edge a later one can, since t >= arrival only gets
    easier), which is what makes the label a scalar instead of a path
    set. Each round is one equi-join on src + one grouped min — O(E)
    per hop, lineage cut per round. The oracle replays the same hop
    bound as a recursive CTE over (v, t, hop) states (UNION-deduped),
    min-folded at the end — set-semantics equality with the BF labels
    is exactly the dominance argument above.

    Timed edges reuse the succession-contact construction of
    ``user_directed_edges`` (same md5 sparsity gate) but KEEP the
    contact hour as the edge timestamp instead of collapsing it."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("hour")
    )
    a = ev.select(F.col("user_id").alias("src"), "event_type", "hour")
    b = ev.select(
        F.col("user_id").alias("dst"),
        "event_type",
        (F.col("hour") - F.expr("INTERVAL 1 HOUR")).alias("hour"),
        F.col("hour").alias("t"),
    )
    gate = (
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(src AS STRING), '_', "
            "CAST(dst AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        )
        % 100
        < _SCC_GATE_PCT
    )
    edges = cut(
        a.join(b, ["event_type", "hour"])
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "t")
        .distinct()
        .where(gate)
    )
    arr = (
        ev.select("user_id")
        .distinct()
        .where(F.col("user_id") % _TEMPORAL_SEED_MOD == 0)
        .select(
            F.col("user_id").alias("v"),
            F.lit(_TEMPORAL_EPOCH).cast("timestamp").alias("arrival"),
        )
    )
    for _ in range(_TEMPORAL_HOPS):
        msgs = (
            edges.join(
                arr.select(F.col("v").alias("src"), "arrival"), "src"
            )
            .where(F.col("t") >= F.col("arrival"))
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("t").alias("arrival"))
        )
        prev = arr
        arr = cut(
            arr.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("arrival").alias("arrival"))
        )
        # guide §5 (VERDICT r11 #4): the new arrival cut consumed the
        # previous hop's generation — free it (hop 1's prev is the lazy
        # seed projection: no blocks, no-op)
        release_cut(prev)
    return arr.where(F.col("v") % _TEMPORAL_SEED_MOD != 0).select(
        F.col("v").alias("user_id"), F.col("arrival").alias("earliest_ts")
    )


_TEMPORAL_REACH_SQL = f"""
WITH RECURSIVE tedges AS MATERIALIZED (
  SELECT src, dst, t FROM (
    SELECT DISTINCT e1.user_id AS src, e2.user_id AS dst,
           date_trunc('hour', CAST(e2.ts AS TIMESTAMP)) AS t
    FROM events e1 JOIN events e2
      ON e1.event_type = e2.event_type
     AND date_trunc('hour', CAST(e2.ts AS TIMESTAMP))
         = date_trunc('hour', CAST(e1.ts AS TIMESTAMP)) + INTERVAL 1 HOUR
     AND e1.user_id <> e2.user_id
  )
  WHERE CAST('0x' || substr(md5(CAST(src AS VARCHAR) || '_'
          || CAST(dst AS VARCHAR)), 1, 8) AS BIGINT) % 100 < {_SCC_GATE_PCT}
),
reach(v, t, hop) AS (
  SELECT DISTINCT user_id, TIMESTAMP '{_TEMPORAL_EPOCH}', 0 FROM events
  WHERE user_id % {_TEMPORAL_SEED_MOD} = 0
  UNION
  SELECT e.dst, e.t, r.hop + 1
  FROM reach r JOIN tedges e ON e.src = r.v AND e.t >= r.t
  WHERE r.hop < {_TEMPORAL_HOPS}
)
SELECT v AS user_id, min(t) AS earliest_ts
FROM reach WHERE v % {_TEMPORAL_SEED_MOD} <> 0 GROUP BY v
"""


def scc_frame(
    verts: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Strongly connected components by the distributed coloring
    algorithm (Orzan; the same family GraphX's SCC uses):

    1. forward max-id propagation to fixpoint -> ``color(v)`` = the
       largest id that reaches v. Every non-empty color class contains
       its root (the vertex whose id equals the color).
    2. backward reachability from each root restricted to its color
       class -> exactly SCC(root), for ALL roots in parallel.
    3. peel the assigned SCCs off and repeat on the remainder.

    Each phase is a monotone Pregel max-propagation (frontier-pruned,
    lineage-checkpointed); one outer round resolves one "layer" of
    SCCs, and layers shrink geometrically on real graphs. No transitive
    closure, no O(V²) state — per-round cost is O(E) joins, which is
    the only SCC shape that survives 100 TB. Output: one row per
    vertex with ``scc_id`` = min member id (engine-neutral label) and
    the component size.
    """
    # cut the edge build ONCE: pregel re-evaluates its edge input every
    # superstep, and an un-materialized events self-join would re-run
    # per superstep (measured 3.6 s/superstep -> 0.1 s after the cut)
    remaining_v = verts.select("id").transform(cut)
    remaining_e = edges.select("src", "dst").transform(cut)
    assigned = None  # (id, root)

    def _absorb(members: DataFrame):
        nonlocal assigned, remaining_v, remaining_e
        assigned = (
            members if assigned is None else assigned.unionByName(members)
        )
        prev_v, prev_e = remaining_v, remaining_e
        remaining_v = remaining_v.join(
            members.select("id"), "id", "left_anti"
        ).transform(cut)
        rm = members.select(F.col("id").alias("gone"))
        remaining_e = (
            remaining_e.join(rm, remaining_e["src"] == rm["gone"], "left_anti")
            .join(rm, remaining_e["dst"] == rm["gone"], "left_anti")
            .transform(cut)
        )
        # guide §5 (VERDICT r11 #4): the peeled-graph cuts superseded
        # the previous generation — free it (remaining_e is O(E), THE
        # frame whose O(rounds) accumulation would hurt at scale).
        # ``members`` cuts stay: ``assigned`` references every one of
        # them until the caller materializes the returned labeling.
        release_cut(prev_v, prev_e)

    for _ in range(_SCC_ROUNDS):
        if remaining_v.limit(1).count() == 0:
            break
        # TRIM to fixpoint: a vertex with no in-edge or no out-edge in
        # the remaining graph is a singleton SCC. Peeling these without
        # Pregel kills DAG tails and chains — the worst case for
        # peel-based coloring (a directed chain with descending ids
        # needs O(n) coloring rounds but trims away immediately).
        for _ in range(30):
            has_out = remaining_e.select(F.col("src").alias("id")).distinct()
            has_in = remaining_e.select(F.col("dst").alias("id")).distinct()
            core = has_out.join(has_in, "id").transform(cut)
            singles = remaining_v.join(core, "id", "left_anti")
            if singles.limit(1).count() == 0:
                release_cut(core)
                break
            _absorb(
                singles.select("id", F.col("id").alias("root"))
                .transform(cut)
            )
            release_cut(core)  # consumed by the members cut in _absorb
        if remaining_v.limit(1).count() == 0:
            break
        # 1. forward coloring: color = max id reaching v. MUST reach
        # its fixpoint: every propagated id certifies a real path, so
        # partial colors still certify reachability — but an absorbed
        # set built from them can be a strict SUBSET of SCC(root),
        # and peeling a partial SCC severs the remaining members'
        # cycles, silently fragmenting the component (the cc_frame
        # sparse-rehearsal bug class). Loud beats wrong.
        colors_res = pregel(
            remaining_v.select("id", F.col("id").alias("state")),
            remaining_e,
            msg=F.col("src_state"),
            agg=F.max("msg"),
            vprog=F.expr("greatest(state, coalesce(agg_msg, state))"),
            max_iter=max_iter,
            frontier_only=True,
        )
        if not colors_res.converged:
            raise RuntimeError(
                f"scc_frame: forward coloring unconverged within "
                f"max_iter={max_iter} supersteps (path longer than the "
                "cap in the remaining graph) — raise max_iter"
            )
        colors = colors_res.vertices.select(
            "id", F.col("state").alias("color")
        )
        # 2. backward mark inside each color class, from every root at
        # once: message-edges are the original edges reversed and
        # restricted to endpoints of the same color
        ce = (
            remaining_e.join(
                colors.select(
                    F.col("id").alias("src"), F.col("color").alias("c_src")
                ),
                "src",
            )
            .join(
                colors.select(
                    F.col("id").alias("dst"), F.col("color").alias("c_dst")
                ),
                "dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
        )
        rev = ce.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).transform(cut)
        marks_res = pregel(
            colors.select(
                "id",
                (F.col("id") == F.col("color")).cast("long").alias("state"),
            ),
            rev,
            msg=F.col("src_state"),
            agg=F.max("msg"),
            vprog=F.expr("greatest(state, coalesce(agg_msg, state))"),
            max_iter=max_iter,
            frontier_only=True,
        )
        if not marks_res.converged:  # see forward coloring above
            raise RuntimeError(
                f"scc_frame: backward marking unconverged within "
                f"max_iter={max_iter} supersteps — raise max_iter"
            )
        marks = marks_res.vertices
        members = (
            marks.where(F.col("state") == 1)
            .join(colors, "id")
            .select("id", F.col("color").alias("root"))
            .transform(cut)
        )
        _absorb(members)
        # the members cut consumed this round's coloring, marking and
        # reversed-edge frames (pregel's final generations + our rev
        # cut) — free them before the next peel (guide §5)
        release_cut(rev)
        _unpersist_ids(
            remaining_v.sparkSession,
            set(colors_res.block_ids) | set(marks_res.block_ids),
        )
    if remaining_v.limit(1).count() != 0:
        # loud failure beats silently dropping vertices: the oracle
        # (and any consumer) expects a TOTAL partition of the graph
        raise RuntimeError(
            f"scc_frame: vertices unassigned after {_SCC_ROUNDS} peeling "
            "rounds — raise _SCC_ROUNDS for this graph (deep SCC-chain "
            "topology)"
        )
    # relabel roots to min-member ids and attach sizes
    labels = assigned.groupBy("root").agg(F.min("id").alias("scc_id"))
    sized = (
        assigned.join(labels, "root")
        .groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("scc_size"))
    )
    return (
        assigned.join(labels, "root")
        .join(sized, "scc_id")
        .select("id", "scc_id", "scc_size")
    )


def scc_strongly_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC decomposition of the directed user-succession graph — the
    graph-DB query behind "find feedback loops / mutually-reachable
    clusters". Oracle: DuckDB recursive transitive closure + mutual-
    reachability min-id (exact; viable at oracle scale only — the
    Spark side never materializes closure pairs). Memoized per
    (session, sf_dir) like the triangle frame: repeated invocations in
    a long-lived session reuse one checkpointed result instead of
    stacking new blocks."""
    edges = _memoized(
        spark, "dedges", sf_dir, lambda: user_directed_edges(spark, sf_dir)
    )
    return _memoized(
        spark,
        "scc",
        sf_dir,
        lambda: scc_frame(user_vertices(spark, sf_dir), edges).select(
            F.col("id").alias("user_id"), "scc_id", "scc_size"
        ),
    )


_SCC_SQL = f"""
WITH RECURSIVE {DIRECTED_EDGES_CTE.strip()},
reach(s, d) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.s, e.dst FROM reach r JOIN dedges e ON e.src = r.d
),
scc AS (
  SELECT r1.s AS v, min(r1.d) AS scc_id
  FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s
  GROUP BY r1.s
)
SELECT v AS user_id, scc_id,
       CAST(count(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
FROM scc
"""


# ------------------------------------------- eccentricity / diameter

_ECC_SEEDS = 3
_ECC_MAX_LEVEL = 20


def msbfs_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS distance frame ``(seed, id, level)`` from the
    ``_ECC_SEEDS`` smallest-id vertices over the symmetric user graph.

    One keyed BFS runs all seeds together: the frontier carries
    (seed, vertex), so K seeds cost one traversal with K-wide state
    instead of K sequential passes — at 100 TB the per-superstep join
    dominates, and this amortizes it across all seeds. Memoized per
    (session, sf_dir): eccentricity/diameter and harmonic/closeness
    centrality both aggregate this frame, paying for the traversal
    once."""

    def _build() -> DataFrame:
        edges = _memoized(
            spark, "uedges_sym", sf_dir, lambda: user_edges_sym(spark, sf_dir)
        )
        verts = user_vertices(spark, sf_dir)
        seeds = [
            r[0] for r in verts.orderBy("id").limit(_ECC_SEEDS).collect()
        ]
        seed_df = spark.createDataFrame([(s,) for s in seeds], "seed bigint")
        visited = (
            seed_df.select("seed", F.col("seed").alias("id"))
            .withColumn("level", F.lit(0))
            .transform(cut)
        )
        frontier = visited.select("seed", "id")
        for lvl in range(1, _ECC_MAX_LEVEL + 1):
            nxt = (
                edges.join(frontier.withColumnRenamed("id", "a"), "a")
                .select("seed", F.col("b").alias("id"))
                .distinct()
                .join(visited, ["seed", "id"], "left_anti")
                .withColumn("level", F.lit(lvl))
                .transform(cut)
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt).transform(cut)
            frontier = nxt.select("seed", "id")
        return visited

    return _memoized(spark, "msbfs", sf_dir, _build)


def graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eccentricity of the ``_ECC_SEEDS`` smallest-id vertices (max BFS
    level from each) + the diameter lower bound they witness — the
    standard sampled-BFS diameter estimate (exact diameter is all-pairs
    and off the table at scale; eccentricity of a few seeds is K
    frontier-BFS passes over the shared :func:`msbfs_frame`)."""
    visited = msbfs_frame(spark, sf_dir)
    ecc = visited.groupBy("seed").agg(
        F.max("level").alias("eccentricity"),
        F.count(F.lit(1)).alias("n_reached"),
    )
    w = Window.partitionBy()
    return ecc.select(
        F.col("seed").alias("seed_id"),
        "eccentricity",
        "n_reached",
        F.max("eccentricity").over(w).alias("diameter_lb"),
    )


_ECC_SQL = f"""
WITH RECURSIVE {USER_EDGES_CTE.strip().rstrip(",")},
seeds AS (SELECT v AS seed FROM verts ORDER BY v LIMIT {_ECC_SEEDS}),
bfs(seed, id, lvl) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION
  SELECT bfs.seed, e.b, bfs.lvl + 1
  FROM bfs JOIN uedges e ON e.a = bfs.id
  WHERE bfs.lvl < {_ECC_MAX_LEVEL}
),
lv AS (SELECT seed, id, min(lvl) AS lvl FROM bfs GROUP BY seed, id),
ecc AS (
  SELECT seed, CAST(max(lvl) AS INT) AS eccentricity,
         count(*) AS n_reached
  FROM lv GROUP BY seed
)
SELECT seed AS seed_id, eccentricity, n_reached,
       CAST(max(eccentricity) OVER () AS INT) AS diameter_lb
FROM ecc
"""


# ------------------------------------- bidirectional point-to-point path

_BIDIR_HALF = 4  # per-side BFS radius -> exact for dist <= 8


def path_shortest_bidirectional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-to-point shortest distance min-user -> max-user by
    BIDIRECTIONAL BFS: one ``_BIDIR_HALF``-level ball around each
    endpoint, met in the middle — ``dist = min(d_fwd(v) + d_bwd(v))``
    over the ball intersection, exact for any distance ≤ 2·HALF (a
    shortest path of length d has a midpoint within ⌈d/2⌉ of both
    ends; the triangle inequality bounds the other direction).

    This is THE scale trick for point queries: two radius-r balls
    explore ~2·b^r vertices vs b^(2r) for one radius-2r ball — at 100
    TB the difference between a subsecond lookup and a full traversal.
    Single row: (src_id, dst_id, dist, n_meet); dist = -1 means
    "farther than 2·HALF or disconnected", n_meet = # distinct midpoint
    vertices lying on a shortest path. No driver-side collect — seeds
    are 1-row aggregate frames fed straight to the frontier BFS."""
    edges = _memoized(
        spark, "uedges_sym", sf_dir, lambda: user_edges_sym(spark, sf_dir)
    )
    events = load_table(spark, sf_dir, "events")
    cnt = bidirectional_dist_frame(
        edges,
        events.agg(F.min("user_id").alias("id")),
        events.agg(F.max("user_id").alias("id")),
    )
    ends = events.agg(
        F.min("user_id").alias("src_id"), F.max("user_id").alias("dst_id")
    )
    return ends.crossJoin(F.broadcast(cnt)).select(
        "src_id", "dst_id", "dist", "n_meet"
    )


def bidirectional_dist_frame(
    edges_sym: DataFrame,
    src_seed: DataFrame,
    dst_seed: DataFrame,
    half: int = _BIDIR_HALF,
) -> DataFrame:
    """1-row (dist, n_meet) via two half-radius BFS balls met in the
    middle; dist = -1 when the balls never intersect (distance >
    2·half or disconnected)."""
    fwd = bfs_frame(edges_sym, src_seed, half)
    bwd = bfs_frame(edges_sym, dst_seed, half)
    meet = fwd.join(
        bwd.withColumnRenamed("level", "blevel"), "id"
    ).select((F.col("level") + F.col("blevel")).cast("long").alias("d"))
    dmin = meet.agg(F.min("d").alias("dist")).alias("dm")
    return (
        dmin.join(
            meet.alias("m"), F.col("dm.dist") == F.col("m.d"), "left"
        )
        .groupBy("dist")
        .agg(F.count(F.col("m.d")).alias("n_meet"))
        .select(
            F.coalesce(F.col("dist"), F.lit(-1)).cast("long").alias("dist"),
            "n_meet",
        )
    )


_BIDIR_SQL = f"""
WITH RECURSIVE {USER_EDGES_CTE.strip().rstrip(",")},
f(id, lvl) AS (
  SELECT (SELECT min(user_id) FROM events), 0
  UNION
  SELECT e.b, f.lvl + 1 FROM f JOIN uedges e ON e.a = f.id
  WHERE f.lvl < {_BIDIR_HALF}
),
b(id, lvl) AS (
  SELECT (SELECT max(user_id) FROM events), 0
  UNION
  SELECT e.b, b.lvl + 1 FROM b JOIN uedges e ON e.a = b.id
  WHERE b.lvl < {_BIDIR_HALF}
),
fl AS (SELECT id, min(lvl) AS lf FROM f GROUP BY id),
bl AS (SELECT id, min(lvl) AS lb FROM b GROUP BY id),
meet AS (SELECT fl.lf + bl.lb AS d FROM fl JOIN bl ON bl.id = fl.id),
dmin AS (SELECT min(d) AS dist FROM meet)
SELECT (SELECT min(user_id) FROM events) AS src_id,
       (SELECT max(user_id) FROM events) AS dst_id,
       CAST(COALESCE(dist, -1) AS BIGINT) AS dist,
       CAST(COALESCE((SELECT count(*) FROM meet WHERE meet.d = dmin.dist), 0)
            AS BIGINT) AS n_meet
FROM dmin
"""


# ------------------------------------------------------ Katz centrality

_KATZ_ITERS = 5


def katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality on the directed succession graph: x ← 1 + α·Aᵀx
    with α = 0.1, ``_KATZ_ITERS`` supersteps — counts attenuated
    in-paths of every length, the classic "influence" ranking a graph
    DB serves next to PageRank. Integer µ-unit arithmetic (UNIT=1e12,
    α as ``div 10``) keeps every iterate exact: bit-reproducible across
    partitionings and hash-identical to the unrolled-SQL oracle.
    Per-superstep cost is one message join on the edge list (the same
    monotone-free recompute family as PageRank: every vertex sends
    every round, so ``frontier_only`` does not apply)."""
    verts = user_vertices(spark, sf_dir)
    edges = _memoized(
        spark,
        "dedges",
        sf_dir,
        lambda: user_directed_edges(spark, sf_dir),
    )
    v = verts.select("id", F.lit(_UNIT).cast("long").alias("state"))
    res = pregel(
        v,
        edges,
        msg=F.col("src_state"),
        agg=F.sum("msg"),
        vprog=F.expr(
            f"CAST({_UNIT} + coalesce(agg_msg, 0) div 10 AS LONG)"
        ),
        max_iter=_KATZ_ITERS,
        check_convergence=False,
    )
    return res.vertices.select(
        F.col("id").alias("user_id"),
        F.col("state").alias("katz_e12"),
        (F.col("state").cast("double") / F.lit(1e12)).alias("katz"),
    )


def _katz_sql(iters: int = _KATZ_ITERS) -> str:
    ctes = [DIRECTED_EDGES_CTE.strip().rstrip(","), (
        f"k0 AS (SELECT v AS id, CAST({_UNIT} AS BIGINT) AS state FROM verts)"
    )]
    for i in range(1, iters + 1):
        ctes.append(
            f"k{i} AS (SELECT v.id, CAST({_UNIT} + "
            f"COALESCE(SUM(p.state), 0) // 10 AS BIGINT) AS state "
            f"FROM k{i - 1} v "
            f"LEFT JOIN dedges e ON e.dst = v.id "
            f"LEFT JOIN k{i - 1} p ON p.id = e.src "
            f"GROUP BY v.id)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id AS user_id, state AS "
        f"katz_e12, CAST(state AS DOUBLE) / 1e12 AS katz FROM k{iters}"
    )


# ------------------------------------------------------ link prediction

_LP_TOPK = 3


def link_predict_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over NON-adjacent pairs: for every candidate
    pair (x < y) with at least one common neighbor but no edge, score
    by neighborhood Jaccard cn / (d_x + d_y − cn), common-neighbor
    count, and preferential attachment d_x·d_y, keeping the top
    ``_LP_TOPK`` candidates per x. The complement of ``edge_jaccard``
    (which scores pairs that ARE edges): this is the "who should be
    connected next" query a recommender runs.

    Runs on the slot-CAPPED user graph deliberately: candidate
    generation is one wedge join (pairs sharing a neighbor), whose
    output is Σ deg² — near-quadratic on an uncapped power-law graph
    (the docstring warning in ``mutual_neighbors``), but ≤ n·cap²
    (linear in n) once the slot cap bounds degree. That is the only
    honest 100 TB shape for all-pairs candidate generation; the
    ranking itself is exact on the capped graph. Ordering uses the
    integer-scaled jacc_e6 key (floor of 1e6·Jaccard) so the window
    rank never compares engine-computed doubles.

    MEMOIZED (like SCC/HITS/MST): the wedge join's real output is
    Σ_z deg(z)² — the slot cap bounds each slot's contribution, and
    the 10x scale row measures the whole key linear (disjoint slots),
    but at sf0.1 that is still a one-time build; repeat consumers and
    the bench's timed run pay a memo fetch while the true cost stays
    visible in tools/round6b_scale_check.py (which clears the frame
    cache). Round 12: this key scores the COUNT-ONLY wedge
    (:func:`_lp_candidates_cn` — same pair set and cn values, no d_z
    join, (x, y)-only wedge rows); a production job scoring both
    predictors in one session should score the shared
    :func:`_lp_candidates` frame instead (see both docstrings)."""
    return _memoized(
        spark, "link_predict_jaccard", sf_dir,
        lambda: _link_predict_jaccard_build(spark, sf_dir),
    )


def _lp_edges_deg(spark: SparkSession, sf_dir: str):
    """Shared prelude for both link predictors: the memoized capped
    edge list, its symmetric closure, and per-vertex degrees."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph_capped,
    )

    ce = build_user_graph_capped(spark, sf_dir).select("a", "b")
    sym = ce.unionAll(
        ce.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    return ce, sym, deg


def _lp_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE shared wedge DEFINITION for BOTH link predictors (round-8
    VERDICT #5): the Σ deg² wedge join enumerates the same (x, y, z)
    wedges whether the scorer is Jaccard or Resource-Allocation, so
    the candidate frame — non-adjacent pairs with common-neighbor
    count AND the degree-weighted RA sum — has a single definition
    both predictors score.

    Deliberately LAZY (no checkpoint of its own): each predictor's
    FINAL result is already memoized, and the bench's cold protocol
    clears the cache before every key in isolation, so a candidate
    memo adds a full extra materialization per cold key (+11 s on
    jaccard at sf0.1 when tried) that the per-key-isolated protocol
    can never amortize. A production job scoring BOTH predictors in
    one pass should wrap this frame in `memoized_checkpoint` (or
    persist it) — then the pair pays the wedge once; with per-key
    memoized results, a warm session gets the same sharing via the
    result memos.

    Tried and REJECTED (round 9): generating the per-z neighbor pairs
    from a sorted adjacency array (collect_list -> nested
    transform/slice/flatten -> explode) to halve the generated rows
    and skip the d_z join — measured 166-235 s vs 27-34 s for this
    join formulation at sf0.1. The nested array-of-struct expressions
    allocate deg²/2 structs per row OUTSIDE whole-stage codegen and
    serialize each high-degree z into one task; the shuffle hash join
    + filter stays codegen'd and spreads candidates across partitions.
    Keep the join.

    Round 10 (VERDICT #5, the remaining cold-tail lever — MEASURED, a
    wash locally, kept for the cluster shape): the degree lookup is
    pre-attached to the m-row edge side BEFORE the wedge join
    (``1000000 div d_z`` computed once per (z, neighbor) edge, riding
    the wedge join's payload) instead of the old post-wedge
    ``join(dz, "z")``. Same-session cold A/B at sf0.1: new 27.6-29.9 s
    vs old 28.1-29.1 s, identical rows — no local gain because the
    |V|-row dz frame BROADCASTS at fixture scale, so the old post-wedge
    join never shuffled the wedge stream here. Kept anyway: on a
    billion-vertex graph dz exceeds the broadcast threshold and the
    post-wedge formulation becomes a Σ deg²-row shuffle join, which the
    pre-attach removes by construction. On orientation (the other
    suggested lever, a NEGATIVE result by the same argument as
    truss round 8): common-neighbor counting must MATERIALIZE every
    wedge — the candidate multiset IS Σ_z C(deg_z, 2) rows — so
    degree-ordering the enumeration cannot shrink the output the way
    it shrinks triangle-existence checks; the only saving would be the
    pre-filter half of the join emit, which `x < y` already discards
    inside codegen before the groupBy shuffle. Cold wall stays ~28 s
    at sf0.1: it is the wedge-output floor plus the groupBy, not a
    removable join."""
    ce, sym, deg = _lp_edges_deg(spark, sf_dir)
    s1 = sym.select(F.col("a").alias("x"), F.col("b").alias("z"))
    dz = deg.select(F.col("v").alias("z"), F.col("deg").alias("d_z"))
    # INT, not BIGINT (guide §2.3 — narrower types through the hot
    # stream): 1e6 div d_z <= 1e6 provably fits; every wedge row
    # carries it, and sum(int) still aggregates to the BIGINT ra_e6
    # the output declares.
    s2 = (
        sym.select(F.col("a").alias("y"), F.col("b").alias("z"))
        .join(dz, "z")
        .select(
            "y", "z", F.expr("int(1000000 div d_z)").alias("inv_z_e6")
        )
    )
    cn = (
        s1.join(s2, "z")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("inv_z_e6").alias("ra_e6"),
        )
    )
    return cn.join(
        ce, (cn["x"] == ce["a"]) & (cn["y"] == ce["b"]), "left_anti"
    )


def _lp_candidates_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-only wedge for the JACCARD predictor (round-12, VERDICT
    r11 #5 — guide §2.3, shuffle/stream fewer bytes): the same wedge
    enumeration and the same candidate pair set as
    :func:`_lp_candidates`, minus the d_z lookup join and the
    inv_z_e6 payload that only the Resource-Allocation scorer reads.
    The Jaccard key's wedge rows are exactly (x, y) — nothing wider
    ever rides the Σ deg² stream — and the d_z join (|E| rows; a real
    shuffle join once dz outgrows the broadcast threshold on a
    billion-vertex graph) disappears from this key's plan entirely.
    Measured same-session at sf0.1: the wedge+groupBy stage 28.9 s →
    22.7 s noop-sink (1.28×); the pair set and every cn value are
    identical by construction (same join, same filter, same groupBy —
    only the unused payload column is gone).

    ``_lp_candidates`` stays THE shared frame for a production job
    scoring BOTH predictors in one session (wrap it in
    ``memoized_checkpoint`` and feed both scorers — the round-9
    sharing note there still applies verbatim); this specialization
    exists because the bench's cold protocol isolates keys, so the
    Jaccard key otherwise pays a d_z join and an 8-byte-per-wedge-row
    payload for a column it provably never consumes."""
    ce, sym, _ = _lp_edges_deg(spark, sf_dir)
    s1 = sym.select(F.col("a").alias("x"), F.col("b").alias("z"))
    s2 = sym.select(F.col("a").alias("y"), F.col("b").alias("z"))
    cn = (
        s1.join(s2, "z")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return cn.join(
        ce, (cn["x"] == ce["a"]) & (cn["y"] == ce["b"]), "left_anti"
    )


def _link_predict_jaccard_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, deg = _lp_edges_deg(spark, sf_dir)
    cand = _lp_candidates_cn(spark, sf_dir)
    dx = deg.select(F.col("v").alias("x"), F.col("deg").alias("d_x"))
    dy = deg.select(F.col("v").alias("y"), F.col("deg").alias("d_y"))
    scored = (
        cand.join(dx, "x")
        .join(dy, "y")
        .select(
            "x",
            "y",
            "cn",
            "d_x",
            "d_y",
            F.expr(
                "CAST(cn * 1000000 div (d_x + d_y - cn) AS BIGINT)"
            ).alias("jacc_e6"),
            (
                F.col("cn").cast("double")
                / (F.col("d_x") + F.col("d_y") - F.col("cn")).cast("double")
            ).alias("jaccard"),
            (F.col("d_x") * F.col("d_y")).alias("pref_attach"),
        )
    )
    w = Window.partitionBy("x").orderBy(
        F.col("jacc_e6").desc(), F.col("cn").desc(), "y"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _LP_TOPK)
    )


# Shared oracle prelude: the slot-capped canonical edge set (ce), its
# symmetric closure (sym), and per-vertex degrees (deg) — the DuckDB
# twin of build_user_graph_capped + the sym/deg steps both link
# predictors start from.
_LP_PRELUDE = """su AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, user_id,
         count(*) AS n_ev
  FROM events
  GROUP BY event_type, date_trunc('hour', ts), user_id
),
top AS (
  SELECT event_type, hr, user_id FROM su
  QUALIFY row_number() OVER (
    PARTITION BY event_type, hr
    ORDER BY n_ev DESC, user_id ASC) <= 32
),
ce AS MATERIALIZED (
  SELECT DISTINCT t1.user_id AS a, t2.user_id AS b
  FROM top t1 JOIN top t2
    ON t1.event_type = t2.event_type AND t1.hr = t2.hr
   AND t1.user_id < t2.user_id
),
sym AS MATERIALIZED (
  SELECT a, b FROM ce UNION ALL SELECT b AS a, a AS b FROM ce
),
deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY a)"""


_LINK_PREDICT_SQL = f"""
WITH {_LP_PRELUDE},
cn AS (
  SELECT s1.a AS x, s2.a AS y, CAST(count(*) AS BIGINT) AS cn
  FROM sym s1 JOIN sym s2 ON s1.b = s2.b AND s1.a < s2.a
  GROUP BY s1.a, s2.a
),
cand AS (
  SELECT cn.* FROM cn
  WHERE NOT EXISTS (SELECT 1 FROM ce WHERE ce.a = cn.x AND ce.b = cn.y)
),
scored AS (
  SELECT c.x, c.y, c.cn, dx.deg AS d_x, dy.deg AS d_y,
         CAST(c.cn * 1000000 // (dx.deg + dy.deg - c.cn) AS BIGINT)
           AS jacc_e6,
         CAST(c.cn AS DOUBLE) / (dx.deg + dy.deg - c.cn) AS jaccard,
         CAST(dx.deg * dy.deg AS BIGINT) AS pref_attach
  FROM cand c JOIN deg dx ON dx.v = c.x JOIN deg dy ON dy.v = c.y
)
SELECT x, y, cn, d_x, d_y, jacc_e6, jaccard, pref_attach,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY x ORDER BY jacc_e6 DESC, cn DESC, y) AS rnk
  FROM scored
) WHERE rnk <= {_LP_TOPK}
"""


def link_predict_resource_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction (Zhou–Lü–Zhang 2009):
    score a non-adjacent pair (x, y) by Σ_{{z ∈ CN(x,y)}} 1/deg(z) —
    common neighbors weighted INVERSELY by their degree, so a hub
    shared with everyone contributes almost nothing while a rare
    mutual contact dominates. Same family as Adamic–Adar (1/ln deg)
    and consistently at least as accurate in the link-prediction
    literature; chosen over AA here because 1/deg is RATIONAL — the
    per-neighbor term floors to an exact integer (1e6 div deg_z) in
    both engines, whereas 1/ln(deg) would put a libm call into the
    ranking key and doubles from different log implementations can
    disagree in the last ulp. Complements ``link_predict_jaccard``
    (which scores by neighborhood overlap ratio and cannot
    distinguish WHICH neighbors are shared).

    Same 100 TB shape as the Jaccard key: candidate generation is the
    one wedge join on the slot-CAPPED graph (≤ n·cap² pairs, linear in
    n); the only addition is carrying the wedge midpoint z to a
    degree lookup BEFORE the (x, y) group-by, so the score is one
    extra broadcast-sized join on the densest column, no new shuffle
    key. Top-``_LP_TOPK`` per x, ranked by the exact integer score.
    MEMOIZED for the same reason as the jaccard twin, and since round
    9 both predictors consume the SHARED :func:`_lp_candidates` wedge
    frame — one wedge build per (session, sf_dir) covers the pair
    (scale tools clear the cache)."""
    return _memoized(
        spark, "link_predict_ra", sf_dir,
        lambda: _link_predict_ra_build(spark, sf_dir),
    )


def _link_predict_ra_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = _lp_candidates(spark, sf_dir)
    w = Window.partitionBy("x").orderBy(
        F.col("ra_e6").desc(), F.col("cn").desc(), "y"
    )
    return (
        cand.withColumn("ra", F.col("ra_e6").cast("double") / F.lit(1e6))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _LP_TOPK)
        .select("x", "y", "cn", "ra_e6", "ra", "rnk")
    )


_LINK_PREDICT_RA_SQL = f"""
WITH {_LP_PRELUDE},
cnz AS (
  SELECT s1.a AS x, s2.a AS y, s1.b AS z
  FROM sym s1 JOIN sym s2 ON s1.b = s2.b AND s1.a < s2.a
),
cn AS (
  SELECT c.x, c.y, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(1000000 // d.deg) AS BIGINT) AS ra_e6
  FROM cnz c JOIN deg d ON d.v = c.z
  GROUP BY c.x, c.y
),
cand AS (
  SELECT cn.* FROM cn
  WHERE NOT EXISTS (SELECT 1 FROM ce WHERE ce.a = cn.x AND ce.b = cn.y)
)
SELECT x, y, cn, ra_e6, CAST(ra_e6 AS DOUBLE) / 1e6 AS ra,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY x ORDER BY ra_e6 DESC, cn DESC, y) AS rnk
  FROM cand
) WHERE rnk <= {_LP_TOPK}
"""


# --------------------------------------------------- Borůvka spanning forest

_MST_MAX_ROUNDS = 24  # components at least halve per round -> 2^24 verts
                      # (in practice star merges shrink ~4-5x/round —
                      # the 1M rehearsal used ~9; early exit makes the
                      # headroom free)


def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM-weight spanning forest of the slot-capped co-occurrence
    graph via distributed Borůvka — THE parallel MST algorithm (each
    round every component picks its best incident edge, picked edges
    merge components, rounds = O(log V)). On a similarity-weighted
    graph the max spanning forest is the single-linkage clustering
    backbone (cutting its k−1 weakest edges = k-cluster single-link),
    so this is the clustering-adjacent kernel, not a routing one.

    Uniqueness/determinism: edges are ordered by the strict total
    order (weight DESC, a ASC, b ASC) — equivalent to perturbing ties
    into distinct weights — so the spanning forest is UNIQUE and both
    Borůvka (per-component best pick) and Kruskal (global scan in that
    order) produce the same edge set; tests/test_round6c.py pins this
    against a Python union-find Kruskal on the collected sf0.01 graph.

    Scale shape: per round, ONE equi-join pair labels every edge with
    its endpoints' components (shuffle on the vertex key the rounds
    reuse), one per-component window picks the best cross edge, and
    the contraction runs :func:`cc_frame` (Pregel min-label) on the
    COMPONENT graph — ≤ one edge per component, so the contraction
    input at round r is ≤ V/2^r rows: geometrically shrinking, never
    the full edge list. No driver-side state beyond the per-round
    empty-check; the result is memoized like the other multi-round
    kernels (betweenness/SCC/HITS).

    SQL oracle: the strict order makes the forest unique, so
    ``_mst_sql()`` replays the rounds in DuckDB — unrolled Borůvka
    with the per-round contraction CC unrolled as min-label
    propagation steps (bounds documented at the generator); value
    determinism is additionally pinned by the Kruskal cross-check in
    tests/test_round6c.py."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph_capped,
    )

    return _memoized(
        spark,
        "mst_boruvka",
        sf_dir,
        lambda: mst_boruvka_frame(cut(build_user_graph_capped(spark, sf_dir))),
    )




def cc_twophase_frame(verts: DataFrame, edges_sym: DataFrame,
                      max_iter: int = 60,
                      residual: list | None = None) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014) — the canonical shuffle-native CC whose
    round count is O(log² n) REGARDLESS of graph diameter. This is
    the kernel for high-diameter graphs (spanning trees, long chains
    of contracted super-vertices) where min-label propagation
    (cc_frame) pays O(diameter) supersteps and even pointer doubling
    measured 92 rounds on a 20k-vertex spanning tree (a doubling
    kernel was tried and deleted in round 8 — this one dominates it);
    this kernel closes the same tree in a handful of rounds.

    Per round, each phase is one groupBy + one join over the CURRENT
    edge set (which only shrinks after dedup): large-star points every
    neighbor v > u at u's local min; small-star points the v ≤ u
    neighbors there. At the fixed point the edge set is a union of
    stars rooted at component minima, read off as the final labeling.
    Convergence is detected by edge-set equality (two anti-joins), so
    termination is exact, not probabilistic. Returns (id, component);
    isolated vertices label themselves.

    Round-12 (guide §5, VERDICT r11 #4 — persisted-block footprint per
    superstep): each round's superseded cut generations (the large-star
    edge set once the small-star cut is materialized, the previous
    round's edge set once the convergence check has read it) are
    released immediately, so executor storage holds O(1) generations
    instead of O(rounds) — the same discipline pregel.py already
    applies. The FINAL edge set backs the returned lazy labeling and
    cannot be released here; a caller that fully consumes the result
    (e.g. into its own cut) may pass ``residual``, a list this
    function appends that final frame to, and release it afterwards."""
    e = cut(
        edges_sym.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    for _ in range(max_iter):
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # large-star: (v, m) for v > u; never a self-loop (m <= u < v)
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
        )
        e1 = cut(
            large.where(F.col("u") != F.col("v"))
            .select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .distinct()
        )
        sym1 = e1.select("u", "v").unionByName(
            e1.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins1 = sym1.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # small-star: (v, m) for v <= u, plus (u, m) to keep u attached
        small = (
            sym1.join(mins1, "u")
            .where(F.col("v") <= F.col("u"))
            .select(F.col("m").alias("u"), F.col("v"))
            .unionByName(mins1.select(F.col("m").alias("u"), F.col("u").alias("v")))
        )
        e2 = cut(
            small.where(F.col("u") != F.col("v"))
            .select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .distinct()
        )
        unchanged = (
            e2.join(e, ["u", "v"], "left_anti").limit(1).count() == 0
            and e.join(e2, ["u", "v"], "left_anti").limit(1).count() == 0
        )
        # e1 died when e2 materialized; the old e died with the check
        # above (nothing downstream reads either — e2 was cut FROM
        # them, and a cut is a materialized copy)
        release_cut(e1, e)
        e = e2
        if unchanged:
            break
    else:
        # the star read-off below is only correct AT the fixed point;
        # reading a mid-contraction edge set would return wrong labels
        # that look like an answer (same discipline as truss/kcore/scc)
        raise RuntimeError(
            f"cc_twophase_frame: no fixpoint within {max_iter} rounds — "
            "raise max_iter (O(log^2 n) bound exceeded?)"
        )
    # fixed point: stars rooted at component minima
    if residual is not None:
        residual.append(e)
    root = (
        e.select(F.col("v").alias("id"), F.col("u").alias("component"))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return verts.join(root, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def mst_boruvka_frame(edges: DataFrame) -> DataFrame:
    """Frame-level Borůvka kernel over canonical weighted edges
    (a, b, weight) — extracted from :func:`graph_mst_boruvka` (the
    mis_frame pattern) so scale rehearsals can drive it on synthetic
    graphs. Returns (a, b, weight, round)."""

    comp = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("c"))
    )
    chosen: DataFrame | None = None
    completed = False
    for rnd in range(_MST_MAX_ROUNDS):
        ca = comp.select(F.col("v").alias("a"), F.col("c").alias("ca"))
        cb = comp.select(F.col("v").alias("b"), F.col("c").alias("cb"))
        xe = cut(
            edges.join(ca, "a")
            .join(cb, "b")
            .where(F.col("ca") != F.col("cb"))
        )
        if xe.limit(1).count() == 0:
            release_cut(xe)
            completed = True
            break
        cand = xe.select(
            F.col("ca").alias("comp"), F.col("cb").alias("oc"),
            "a", "b", "weight",
        ).unionByName(
            xe.select(
                F.col("cb").alias("comp"), F.col("ca").alias("oc"),
                "a", "b", "weight",
            )
        )
        w = Window.partitionBy("comp").orderBy(
            F.col("weight").desc(), "a", "b"
        )
        sel = cut(
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        # xe died when sel materialized (guide §5: the full labeled
        # edge set is the round's big frame — don't hold O(rounds) of
        # them). sel itself must LIVE: ``chosen`` below references
        # every round's sel lazily until the caller materializes the
        # returned forest (sel is ≤ one edge per component — tiny).
        release_cut(xe)
        picked = (
            sel.select("a", "b", "weight")
            .distinct()
            .withColumn("round", F.lit(rnd + 1))
        )
        chosen = picked if chosen is None else chosen.unionByName(picked)
        cverts = comp.select(F.col("c").alias("id")).distinct()
        cg_sym = sel.select(
            F.col("comp").alias("a"), F.col("oc").alias("b")
        ).unionByName(
            sel.select(F.col("oc").alias("a"), F.col("comp").alias("b"))
        )
        # two-phase CC, not min-label propagation: the contraction
        # graph is a pseudo-forest of best-edge picks whose components
        # can be long CHAINS of merged super-vertices — O(diameter)
        # kernels pay a superstep per hop there, two-phase closes any
        # chain in O(log²) rounds
        cc_residual: list = []
        relabel = cc_twophase_frame(
            cverts, cg_sym, residual=cc_residual
        ).select(
            F.col("id").alias("c"), F.col("component").alias("c_new")
        )
        prev_comp = comp
        comp = cut(
            comp.join(relabel, "c").select("v", F.col("c_new").alias("c"))
        )
        # the new comp cut consumed both the previous comp generation
        # and the contraction CC's final edge set — free them
        release_cut(prev_comp, *cc_residual)
    if not completed:
        # components at least halve per pick round, so the cap covers
        # 2^_MST_MAX_ROUNDS vertices; exiting the loop with cross-
        # component edges still present would return a partial forest
        # that LOOKS like a spanning forest (same silent-cap class as
        # cc_frame/kcore_frame — loud beats wrong)
        raise RuntimeError(
            f"mst_boruvka_frame: cross-component edges remain after "
            f"{_MST_MAX_ROUNDS} rounds — raise _MST_MAX_ROUNDS "
            "(graph has more than 2^rounds vertices?)"
        )
    release_cut(comp)  # the final labeling only fed the empty xe check
    if chosen is None:
        return edges.select("a", "b", "weight").limit(0).withColumn(
            "round", F.lit(0)
        )
    return chosen.select("a", "b", "weight", "round")


# ------------------------------------------------- node2vec biased walks

_N2V_STEPS = 6
_N2V_WALKS = 2   # walks per seed
_N2V_TOPK = 3    # backbone sparsification (same as coloring)
# p = 1, q = 0.5: returning to prev and staying near it weigh 1 ticket,
# exploring AWAY from prev weighs 1/q = 2 tickets (integer!) — the
# DFS-leaning node2vec regime, chosen because 1/q must be an integer
# for the exact ticket lottery below.


def _n2v_hash(step: int) -> str:
    return (
        f"CAST(conv(substring(md5(concat_ws(':', CAST(seed AS STRING), "
        f"CAST(walk_no AS STRING), CAST({step} AS STRING), "
        f"CAST(x AS STRING), CAST(tick AS STRING))), 1, 12), 16, 10) "
        f"AS BIGINT)"
    )


def _n2v_hash_sql(step: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' || "
        f"CAST(walk_no AS VARCHAR) || ':' || CAST({step} AS VARCHAR) || "
        f"':' || CAST(x AS VARCHAR) || ':' || CAST(tick AS VARCHAR)), "
        f"1, 12) AS BIGINT)"
    )


def graph_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec SECOND-ORDER biased walks (Grover–Leskovec) with an
    EXACT deterministic lottery: from state (prev t, cur v), each
    neighbor x of v gets an integer TICKET count — 1 if x == t
    (return, weight 1/p with p=1), 1 if x is adjacent to t (BFS-side,
    weight 1), 2 otherwise (exploration, weight 1/q with q=0.5) — and
    the next hop is the ticket with the maximum per-(walk, step,
    candidate, ticket) hash. By symmetry of iid hashes, P(pick x) =
    tickets(x)/Σtickets EXACTLY, so this is true weighted sampling
    whose outcome is a pure function of the graph — re-running a lost
    executor (or the DuckDB oracle) reproduces the same corpus
    bit-for-bit, which a seeded RNG across distributed workers cannot
    promise. First hop: prev = cur, so every neighbor is
    prev-adjacent and the draw is uniform — the node2vec convention.

    Runs on the top-``_N2V_TOPK`` backbone (same sparsification as
    the coloring key) because second-order bias NEEDS the
    per-candidate adjacency test against t — O(degree) per step, the
    documented cost the uniform-walk key's O(1) array index cannot
    pay; bounding degree makes each step |walks|·O(topk) rows with
    ≤ 2 tickets each. Walk corpus generation is the input stage of
    DeepWalk/node2vec embedding training. Dangling vertices hold
    position (lazy self-loop), one row per (seed, walk, step)."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph_capped,
    )

    ce = build_user_graph_capped(spark, sf_dir)
    dsym = ce.select("a", "b", "weight").unionAll(
        ce.select(F.col("b").alias("a"), F.col("a").alias("b"), "weight")
    )
    wtop = Window.partitionBy("a").orderBy(F.col("weight").desc(), "b")
    backbone = (
        dsym.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") <= _N2V_TOPK)
        .select("a", "b")
    )
    bsym = cut(
        backbone.unionAll(
            backbone.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    )
    eset = bsym.select(
        F.least("a", "b").alias("ex"), F.greatest("a", "b").alias("ey")
    ).distinct()
    state = (
        bsym.select(F.col("a").alias("seed"))
        .distinct()
        .crossJoin(
            spark.range(_N2V_WALKS).select(
                F.col("id").cast("int").alias("walk_no")
            )
        )
        .select(
            "seed", "walk_no",
            F.col("seed").alias("prev"), F.col("seed").alias("cur"),
        )
    )
    steps = [
        state.select(
            "seed", "walk_no", F.lit(0).alias("step"),
            F.col("cur").alias("node"),
        )
    ]
    for k in range(1, _N2V_STEPS + 1):
        cand = (
            state.join(
                bsym.select(F.col("a").alias("cur"), F.col("b").alias("x")),
                "cur",
                "left",
            )
            .join(
                eset.withColumn("adj", F.lit(1)),
                (F.least("prev", "x") == F.col("ex"))
                & (F.greatest("prev", "x") == F.col("ey")),
                "left",
            )
            .select(
                "seed", "walk_no", "prev", "cur", "x",
                F.when(F.col("x").isNull(), F.lit(1))
                .when(F.col("x") == F.col("prev"), F.lit(1))
                .when(F.col("adj").isNotNull(), F.lit(1))
                .otherwise(F.lit(2))
                .alias("tickets"),
            )
        )
        lottery = cand.select(
            "seed", "walk_no", "cur", "x",
            F.explode(F.expr("sequence(1, tickets)")).alias("tick"),
        ).withColumn("hkey", F.expr(_n2v_hash(k)))
        wpick = Window.partitionBy("seed", "walk_no").orderBy(
            F.col("hkey").desc(), F.col("x").asc_nulls_last()
        )
        state = cut(
            lottery.withColumn("rn", F.row_number().over(wpick))
            .where(F.col("rn") == 1)
            .select(
                "seed", "walk_no",
                F.col("cur").alias("prev"),
                F.coalesce("x", "cur").alias("cur"),
            )
        )
        steps.append(
            state.select(
                "seed", "walk_no", F.lit(k).alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _n2v_sql() -> str:
    walks_vals = ", ".join(f"({i})" for i in range(_N2V_WALKS))
    # _LP_PRELUDE's ce is the DISTINCT pair set; the backbone needs
    # edge WEIGHTS, so the capped slots are rebuilt here with a count
    ctes = [
        f"""cew AS MATERIALIZED (
  SELECT t1.user_id AS a, t2.user_id AS b, CAST(count(*) AS BIGINT) AS w
  FROM ({_TOP_SLOTS_SQL}) t1
  JOIN ({_TOP_SLOTS_SQL}) t2
    ON t1.event_type = t2.event_type AND t1.hr = t2.hr
   AND t1.user_id < t2.user_id
  GROUP BY 1, 2
),
dsym AS (
  SELECT a, b, w FROM cew UNION ALL SELECT b AS a, a AS b, w FROM cew
),
backbone AS (
  SELECT a, b FROM (
    SELECT a, b, row_number() OVER (
      PARTITION BY a ORDER BY w DESC, b) AS rn
    FROM dsym
  ) WHERE rn <= {_N2V_TOPK}
),
bsym AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM backbone UNION ALL SELECT b AS a, a AS b FROM backbone
  )
),
eset AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS ex, greatest(a, b) AS ey FROM bsym
),
w0 AS (
  SELECT seed, CAST(t.w AS INT) AS walk_no, seed AS prev, seed AS cur
  FROM (SELECT DISTINCT a AS seed FROM bsym) s, (VALUES {walks_vals}) t(w)
)"""
    ]
    for k in range(1, _N2V_STEPS + 1):
        ctes.append(f"""l{k} AS MATERIALIZED (
  SELECT seed, walk_no, cur, x,
         unnest(generate_series(1, tickets)) AS tick
  FROM (
    SELECT c.seed, c.walk_no, c.prev, c.cur, n.b AS x,
           CASE WHEN n.b IS NULL THEN 1
                WHEN n.b = c.prev THEN 1
                WHEN EXISTS (SELECT 1 FROM eset e
                             WHERE e.ex = least(c.prev, n.b)
                               AND e.ey = greatest(c.prev, n.b)) THEN 1
                ELSE 2 END AS tickets
    FROM w{k - 1} c LEFT JOIN bsym n ON n.a = c.cur
  )
),
w{k} AS MATERIALIZED (
  SELECT seed, walk_no, cur AS prev, COALESCE(x, cur) AS cur FROM (
    SELECT seed, walk_no, cur, x,
           row_number() OVER (
             PARTITION BY seed, walk_no
             ORDER BY {_n2v_hash_sql(k)} DESC, x ASC NULLS LAST) AS rn
    FROM l{k}
  ) WHERE rn = 1
)""")
    selects = [
        f"SELECT seed, walk_no, CAST({k} AS INT) AS step, cur AS node "
        f"FROM w{k}"
        for k in range(_N2V_STEPS + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


_TOP_SLOTS_SQL = """
  SELECT event_type, hr, user_id FROM (
    SELECT event_type, date_trunc('hour', ts) AS hr, user_id,
           count(*) AS n_ev
    FROM events
    GROUP BY event_type, date_trunc('hour', ts), user_id
  )
  QUALIFY row_number() OVER (
    PARTITION BY event_type, hr
    ORDER BY n_ev DESC, user_id ASC) <= 32
"""


# ----------------------------------------------------- greedy coloring

_JP_MAX_ROUNDS = 64


_COLOR_TOPK = 3  # backbone sparsification: keep each vertex's top-k edges


def graph_greedy_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jones–Plassmann greedy coloring of the TOP-``_COLOR_TOPK``
    co-occurrence backbone — the classic parallel symmetry-breaking
    kernel (conflict-free scheduling, register allocation, parallel
    sparse updates: same-color vertices can be processed
    simultaneously because no edge joins them). Each round, every
    still-uncolored vertex whose (md5-hash, id) priority beats all
    its uncolored neighbors' colors itself with the SMALLEST color
    unused by its already-colored neighborhood (the mex); the strict
    total order guarantees progress, and the coloring is a pure
    function of the graph (re-runs identical; pinned in tests).

    Why the backbone and not the full capped graph: the slot
    co-occurrence graph is a union of ≤32-cliques, and inside a
    k-clique ANY local-maximum rule colors exactly one vertex per
    round — JP degenerates to k sequential steps (measured: 64 rounds
    colored 87/150 vertices at sf0.01). That is not a plan bug, it is
    the algorithm's documented dense-graph failure mode; JP's O(log n)
    expected rounds hold for bounded-degree graphs, which is also the
    shape real schedulers color (sparsified conflict graphs). So the
    key sparsifies first — each vertex keeps its ``_COLOR_TOPK``
    strongest edges (weight DESC, b), symmetrized — and colors that.

    The mex needs no Python: sort the colored-neighbor color set and
    fold ``aggregate(arr, 0, (acc, c) -> IF(c = acc, acc + 1, acc))``
    — over a sorted distinct non-negative array this yields the first
    gap. Greedy mex also bounds color(v) ≤ deg(v), so ≤ Δ+1 colors.

    100 TB shape: per round one equi-join marks blocked vertices, one
    join + grouped collect_set gathers ≤ deg colored-neighbor colors,
    both shuffling on the same vertex key every round reuses; the
    uncolored set shrinks geometrically in expectation. SQL oracle:
    the fixed hash order makes the coloring a pure function of the
    graph, so ``_coloring_sql()`` replays the rounds in DuckDB
    (unrolled JP, set-SQL mex); the proper-coloring and determinism
    properties are additionally pinned in tests/test_round6c.py."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph_capped,
    )

    def build() -> DataFrame:
        ce = build_user_graph_capped(spark, sf_dir)
        dsym = ce.select("a", "b", "weight").unionAll(
            ce.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "weight"
            )
        )
        wtop = Window.partitionBy("a").orderBy(F.col("weight").desc(), "b")
        backbone = (
            dsym.withColumn("rn", F.row_number().over(wtop))
            .where(F.col("rn") <= _COLOR_TOPK)
            .select("a", "b")
        )
        sym = cut(
            backbone.unionAll(
                backbone.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).distinct()
        )
        prio = lambda c: F.conv(
            F.substring(F.md5(c.cast("string")), 1, 8), 16, 10
        ).cast("long")
        uncolored = (
            sym.select(F.col("a").alias("v")).distinct()
        )
        colors: DataFrame | None = None
        for _ in range(_JP_MAX_ROUNDS):
            if uncolored.limit(1).count() == 0:
                break
            ua = uncolored.select(F.col("v").alias("a"))
            ub = uncolored.select(F.col("v").alias("b"))
            und = sym.join(ua, "a").join(ub, "b")
            blocked = (
                und.where(
                    (prio(F.col("b")) > prio(F.col("a")))
                    | (
                        (prio(F.col("b")) == prio(F.col("a")))
                        & (F.col("b") > F.col("a"))
                    )
                )
                .select(F.col("a").alias("v"))
                .distinct()
            )
            ready = uncolored.join(blocked, "v", "left_anti")
            if colors is None:
                used = ready.select(
                    "v", F.lit(None).cast("long").alias("c")
                ).where(F.lit(False))
            else:
                used = (
                    sym.join(ready.select(F.col("v").alias("a")), "a")
                    .join(
                        colors.select(
                            F.col("v").alias("b"), F.col("color").alias("c")
                        ),
                        "b",
                    )
                    .select(F.col("a").alias("v"), "c")
                )
            mex = F.aggregate(
                F.sort_array(F.collect_set("c")),
                F.lit(0).cast("long"),
                lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
            )
            newly = cut(
                ready.join(
                    used.groupBy("v").agg(mex.alias("color")), "v", "left"
                ).select(
                    "v", F.coalesce("color", F.lit(0).cast("long")).alias("color")
                )
            )
            prev_colors = colors
            colors = newly if colors is None else cut(
                colors.unionByName(newly)
            )
            prev_uncolored = uncolored
            uncolored = cut(uncolored.join(newly, "v", "left_anti"))
            # guide §5 (VERDICT r11 #4): the new colors/uncolored cuts
            # consumed the previous generations and (for rounds > 1)
            # this round's newly — free them; round 1's newly IS
            # colors and must live
            if prev_colors is not None:
                release_cut(prev_colors)
                release_cut(newly)
            release_cut(prev_uncolored)
        if uncolored.limit(1).count() != 0:
            raise RuntimeError(
                "graph_greedy_coloring did not converge within "
                f"{_JP_MAX_ROUNDS} rounds — partial colorings are not "
                "returned (see docstring: sparsify more or raise the cap)"
            )
        return colors.select(F.col("v").alias("user_id"), "color")

    return _memoized(spark, "greedy_coloring", sf_dir, build)


# ------------------------------------------- GNN neighborhood sampling

_GNN_SEEDS = 10  # smallest vertex ids — deterministic seed batch
_GNN_F1 = 4      # hop-1 fan-out
_GNN_F2 = 3      # hop-2 fan-out


def _edge_hash(src, dst):
    """Deterministic per-edge sampling key: first 8 hex digits of
    md5("src:dst") as a BIGINT — the same engine-portable hash recipe
    as split_train_test's bucket (md5 prefix → integer), so the
    sampled neighbor CHOICE is a pure function of the edge, stable
    across runs, partitionings, and engines."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", src.cast("string"), dst.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def _sql_edge_hash(src: str, dst: str) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({src} AS VARCHAR) || ':' || "
        f"CAST({dst} AS VARCHAR)), 1, 8) AS BIGINT)"
    )


def gnn_sample_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style fan-out neighborhood sampling — the extraction
    step of every mini-batch GNN training pipeline: for each seed
    vertex take ≤ ``_GNN_F1`` hop-1 neighbors, then ≤ ``_GNN_F2``
    hop-2 neighbors of each sampled hop-1 vertex, emitting the sampled
    TREE edges (seed, hop, src, dst). Neighbor choice is rank-by-
    deterministic-hash (``_edge_hash``) within each parent — i.e.
    uniform-without-replacement sampling whose randomness is a pure
    function of the edge, so the same seed always draws the same
    neighborhood (reproducible batches, engine-portable oracle).

    100 TB shape: each hop is one equi-join of the (tiny, ≤ seeds·f1)
    frontier against the hash-partitioned adjacency followed by one
    window per parent — output is ≤ seeds·f1·(1+f2) rows regardless of
    graph degree, because the rank caps fan-out BEFORE the next join.
    The frontier side always broadcasts; the adjacency is never
    re-shuffled (both hops join on its ``a`` column). On the slot-
    capped user graph the per-parent window sorts ≤ cap rows. Seeds
    here = the ``_GNN_SEEDS`` smallest vertex ids (a deterministic
    stand-in for a training batch; production passes real batch ids)."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        build_user_graph_capped,
    )

    ce = build_user_graph_capped(spark, sf_dir).select("a", "b")
    sym = ce.unionAll(
        ce.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    seeds = (
        sym.select(F.col("a").alias("seed"))
        .distinct()
        .orderBy("seed")
        .limit(_GNN_SEEDS)
    )
    w1 = Window.partitionBy("seed").orderBy("hkey", "dst")
    hop1 = (
        sym.join(F.broadcast(seeds), sym["a"] == seeds["seed"])
        .select(
            "seed",
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            _edge_hash(F.col("a"), F.col("b")).alias("hkey"),
        )
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= _GNN_F1)
        .select("seed", "src", "dst")
    )
    frontier = hop1.select("seed", F.col("dst").alias("parent"))
    # hop-2 parent == src after the join (sym.a = frontier.parent)
    w2 = Window.partitionBy("seed", "src").orderBy("hkey", "dst")
    hop2 = (
        sym.join(F.broadcast(frontier), sym["a"] == frontier["parent"])
        .select(
            "seed",
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            _edge_hash(F.col("a"), F.col("b")).alias("hkey"),
        )
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= _GNN_F2)
        .select("seed", "src", "dst")
    )
    return (
        hop1.select("seed", F.lit(1).alias("hop"), "src", "dst")
        .unionAll(hop2.select("seed", F.lit(2).alias("hop"), "src", "dst"))
    )


_GNN_SAMPLE_SQL = f"""
WITH {_LP_PRELUDE},
seeds AS (
  SELECT DISTINCT a AS seed FROM sym ORDER BY seed LIMIT {_GNN_SEEDS}
),
hop1 AS MATERIALIZED (
  SELECT seed, src, dst FROM (
    SELECT s.seed, e.a AS src, e.b AS dst,
           row_number() OVER (
             PARTITION BY s.seed
             ORDER BY {_sql_edge_hash('e.a', 'e.b')}, e.b) AS rn
    FROM sym e JOIN seeds s ON e.a = s.seed
  ) WHERE rn <= {_GNN_F1}
),
hop2 AS (
  SELECT seed, src, dst FROM (
    SELECT f.seed, e.a AS src, e.b AS dst,
           row_number() OVER (
             PARTITION BY f.seed, f.dst
             ORDER BY {_sql_edge_hash('e.a', 'e.b')}, e.b) AS rn
    FROM sym e JOIN hop1 f ON e.a = f.dst
  ) WHERE rn <= {_GNN_F2}
)
SELECT seed, 1 AS hop, src, dst FROM hop1
UNION ALL
SELECT seed, 2 AS hop, src, dst FROM hop2
"""


# ------------------------------------------------ Luby maximal independent set

_MIS_ROUNDS = 8  # sf0.1 converges in 6; +2 margin (empty rounds are no-ops)


def _mis_prio(c, r: int):
    """Per-round 60-bit priority: md5("<id>:<round>") prefix as BIGINT —
    fresh symmetry-breaking randomness every round (true Luby), engine-
    portable byte-for-byte (same recipe as ``_edge_hash``)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", c.cast("string"), F.lit(str(r)))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def graph_mis_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set of the strong user graph via Luby's
    algorithm — THE textbook parallel symmetry-breaking kernel (the
    dual of ``graph_greedy_coloring``'s Jones–Plassmann: MIS members
    are a conflict-free batch that can be processed simultaneously).
    Each round every still-active vertex whose per-round (md5, id)
    priority beats ALL its active neighbors joins the set; winners and
    their neighborhoods deactivate. Vertices with no strong edge are
    trivially independent and win round 1.

    Unlike coloring, density HELPS here: a k-clique resolves in ONE
    round (its minimum wins, the rest deactivate), so the key runs on
    the full strong graph, no backbone sparsification — sf0.1's
    137k-edge graph converges in 6 rounds, and the active set shrinks
    geometrically in expectation on any graph (Luby 1986). Fixed
    ``_MIS_ROUNDS`` horizon keeps the oracle unrollable; a non-empty
    active set after the horizon raises rather than returning a
    non-maximal answer.

    100 TB shape: per round two equi-joins on the vertex key (blocked
    mark + neighborhood deactivation), both reusing the same shuffle
    partitioning; no per-vertex collect, no global sort. Independence
    and maximality are pinned in tests/test_round6c.py; the result is
    a pure function of the graph (deterministic hashes), SQL-hash
    checked against the unrolled-round DuckDB twin.
    """
    def build() -> DataFrame:
        ce = _canonical_edges(spark, sf_dir)
        sym = ce.unionByName(
            ce.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        verts = user_vertices(spark, sf_dir).select(F.col("id").alias("v"))
        return mis_frame(verts, sym, _MIS_ROUNDS).select(
            F.col("v").alias("user_id")
        )

    return _memoized(spark, "mis_luby", sf_dir, build)


def mis_frame(verts: DataFrame, sym: DataFrame, rounds: int) -> DataFrame:
    """Frame-level Luby kernel (see :func:`graph_mis_luby` for the
    algorithm and determinism notes): ``verts`` is one column ``v``,
    ``sym`` is a symmetric edge list (a, b). Raises if the active set
    survives the round horizon — partial (non-maximal) sets are never
    returned. Also the unit the 1M-vertex kernel rehearsal drives
    (tools/round6_kernel_rehearsal.py)."""
    active = verts
    mis: DataFrame | None = None
    for r in range(1, rounds + 1):
        ha, hb = _mis_prio(F.col("a"), r), _mis_prio(F.col("b"), r)
        und = (
            sym.join(active.select(F.col("v").alias("a")), "a")
            .join(active.select(F.col("v").alias("b")), "b")
        )
        blocked = (
            und.where((hb < ha) | ((hb == ha) & (F.col("b") < F.col("a"))))
            .select(F.col("a").alias("v"))
            .distinct()
        )
        winners = cut(active.join(blocked, "v", "left_anti"))
        prev_mis = mis
        mis = winners if mis is None else cut(mis.unionByName(winners))
        nbrs = (
            sym.join(winners.select(F.col("v").alias("a")), "a")
            .select(F.col("b").alias("v"))
            .distinct()
        )
        prev_active = active
        active = cut(
            active.join(
                winners.unionByName(nbrs).distinct(), "v", "left_anti"
            )
        )
        # guide §5 (VERDICT r11 #4): the new mis/active cuts consumed
        # the previous generations and this round's winners — free
        # them so executor storage stays O(1) generations. winners
        # survives round 1, where it IS mis; prev_active in round 1 is
        # the caller's verts frame (not our cut — release is a no-op
        # unless it happens to be cut-backed, in which case the caller
        # pattern [mis over a one-shot symmetric frame] never re-reads
        # it either).
        if prev_mis is not None:
            release_cut(prev_mis)
        if mis is not winners:
            release_cut(winners)
        if prev_active is not verts:
            release_cut(prev_active)
        if active.limit(1).count() == 0:
            break
    if active.limit(1).count() != 0:
        raise RuntimeError(
            f"Luby MIS did not converge within {rounds} rounds — "
            "partial (non-maximal) sets are not returned"
        )
    release_cut(active)  # empty by the check above; mis is the result
    return mis


def _sql_mis_prio(col: str, r: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR) || ':{r}'), 1, 15) "
        "AS BIGINT)"
    )


def _mis_sql(rounds: int = _MIS_ROUNDS) -> str:
    # per-round CTEs are each referenced 2-3x downstream — MATERIALIZED
    # or DuckDB re-inlines the chain exponentially (k-truss lesson)
    ctes = [
        "ssym AS MATERIALIZED (SELECT a, b FROM ce UNION ALL SELECT b, a FROM ce)",
        "act0 AS MATERIALIZED (SELECT DISTINCT user_id AS v FROM events)",
    ]
    for i in range(1, rounds + 1):
        ha, hb = _sql_mis_prio("e.a", i), _sql_mis_prio("e.b", i)
        ctes.append(
            f"blk{i} AS MATERIALIZED (SELECT DISTINCT e.a AS v FROM ssym e "
            f"JOIN act{i-1} x ON x.v = e.a JOIN act{i-1} y ON y.v = e.b "
            f"WHERE ({hb} < {ha}) OR ({hb} = {ha} AND e.b < e.a))"
        )
        ctes.append(
            f"win{i} AS MATERIALIZED (SELECT v FROM act{i-1} "
            f"WHERE v NOT IN (SELECT v FROM blk{i}))"
        )
        ctes.append(
            f"act{i} AS MATERIALIZED (SELECT v FROM act{i-1} "
            f"WHERE v NOT IN (SELECT v FROM win{i}) "
            f"AND v NOT IN (SELECT e.b FROM ssym e "
            f"JOIN win{i} w ON w.v = e.a))"
        )
    final = " UNION ALL ".join(f"SELECT v FROM win{i}" for i in range(1, rounds + 1))
    # exhaustion sentinel (same class as the MST/JP guards below):
    # vertices still active after all rounds surface as negative ids
    # (-1 - v), so a too-short Luby unroll is self-describing
    return (
        _TRI_BASE.replace("WITH ce AS", "WITH ce AS MATERIALIZED")
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT v AS user_id FROM ({final}"
        + f"\nUNION ALL SELECT -1 - v AS v FROM act{rounds})"
    )


# -------------------- unrolled oracles: Borůvka MST / JP coloring

# Weighted capped edge set — the DuckDB twin of build_user_graph_capped
# KEEPING the weight column (the _LP_PRELUDE drops it).
_WCE_PRELUDE = """su AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, user_id,
         count(*) AS n_ev
  FROM events
  GROUP BY event_type, date_trunc('hour', ts), user_id
),
top AS (
  SELECT event_type, hr, user_id FROM su
  QUALIFY row_number() OVER (
    PARTITION BY event_type, hr
    ORDER BY n_ev DESC, user_id ASC) <= 32
),
wce AS MATERIALIZED (
  SELECT t1.user_id AS a, t2.user_id AS b,
         CAST(count(*) AS BIGINT) AS weight
  FROM top t1 JOIN top t2
    ON t1.event_type = t2.event_type AND t1.hr = t2.hr
   AND t1.user_id < t2.user_id
  GROUP BY t1.user_id, t2.user_id
)"""

# Unroll bounds, sized to the fixtures with margin: Borůvka terminates
# in 3 (sf0.01) / 4 (sf0.1) rounds, and every per-round contraction
# graph has min-node eccentricity <= 7 (measured by a python replica);
# JP colors the backbone in 9 (sf0.01) / 12 (sf0.1) rounds.
#
# EXHAUSTION GUARD: on data needing more rounds than the unroll, a
# partial oracle answer would look exactly like a Spark bug. Each
# unrolled oracle therefore appends SENTINEL rows when its fixed point
# was NOT reached — negative round / color / user_id values that can
# never occur in a real answer — so a parity mismatch caused by an
# exhausted unroll is self-describing: bump the bound, don't debug the
# Spark kernel. The sentinel branches are empty whenever the unroll
# converged, so they cost nothing on conforming data.
_MST_ORACLE_ROUNDS = 6
_MST_ORACLE_PROP = 10
_JP_ORACLE_ROUNDS = 16


def _mst_sql(
    rounds: int = _MST_ORACLE_ROUNDS, prop: int = _MST_ORACLE_PROP
) -> str:
    """Unrolled-Borůvka DuckDB twin of :func:`graph_mst_boruvka`: the
    strict (weight DESC, a, b) order makes the max spanning forest
    unique, so replaying the exact per-round best-pick + min-label
    contraction reproduces the edge set AND the round column. The
    within-round contraction CC (Spark: cc_frame Pregel) unrolls as
    ``prop`` min-label propagation steps — enough iff every contraction
    component's min node reaches all members within ``prop`` hops
    (measured <= 7 on the fixtures; extra steps are no-ops)."""
    ctes = [
        """comp0 AS MATERIALIZED (
  SELECT v, v AS c FROM (
    SELECT a AS v FROM wce UNION SELECT b AS v FROM wce))"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""xe{r} AS MATERIALIZED (
  SELECT e.a, e.b, e.weight, ca.c AS ca, cb.c AS cb
  FROM wce e
  JOIN comp{r - 1} ca ON ca.v = e.a
  JOIN comp{r - 1} cb ON cb.v = e.b
  WHERE ca.c <> cb.c)"""
        )
        ctes.append(
            f"""sel{r} AS MATERIALIZED (
  SELECT comp, oc, a, b, weight FROM (
    SELECT comp, oc, a, b, weight, row_number() OVER (
      PARTITION BY comp ORDER BY weight DESC, a, b) AS rn
    FROM (
      SELECT ca AS comp, cb AS oc, a, b, weight FROM xe{r}
      UNION ALL
      SELECT cb AS comp, ca AS oc, a, b, weight FROM xe{r}))
  WHERE rn = 1)"""
        )
        ctes.append(
            f"""picked{r} AS MATERIALIZED (
  SELECT DISTINCT a, b, weight, {r} AS "round" FROM sel{r})"""
        )
        ctes.append(
            f"""cg{r} AS MATERIALIZED (
  SELECT comp AS x, oc AS y FROM sel{r}
  UNION ALL SELECT oc AS x, comp AS y FROM sel{r})"""
        )
        ctes.append(
            f"lab{r}_0 AS MATERIALIZED "
            f"(SELECT DISTINCT c AS node, c AS lab FROM comp{r - 1})"
        )
        for k in range(1, prop + 1):
            ctes.append(
                f"""lab{r}_{k} AS MATERIALIZED (
  SELECT node, min(lab) AS lab FROM (
    SELECT node, lab FROM lab{r}_{k - 1}
    UNION ALL
    SELECT g.x AS node, l.lab
    FROM cg{r} g JOIN lab{r}_{k - 1} l ON l.node = g.y)
  GROUP BY node)"""
            )
        ctes.append(
            f"""comp{r} AS MATERIALIZED (
  SELECT cm.v, l.lab AS c
  FROM comp{r - 1} cm JOIN lab{r}_{prop} l ON l.node = cm.c)"""
        )
    final = " UNION ALL ".join(
        f'SELECT a, b, weight, "round" FROM picked{r}'
        for r in range(1, rounds + 1)
    )
    # exhaustion sentinels (see the bound comment above): round = -1
    # rows are cross-component edges surviving ALL rounds (Borůvka
    # unroll too short); round = -r rows mean round r's min-label
    # propagation had not reached its fixed point after ``prop`` steps
    # (monotone map: one no-op step == converged, so the last-step
    # diff is a sound and complete check)
    guards = [
        f"""SELECT e.a, e.b, e.weight, -1 AS "round"
  FROM wce e
  JOIN comp{rounds} ca ON ca.v = e.a
  JOIN comp{rounds} cb ON cb.v = e.b
  WHERE ca.c <> cb.c"""
    ]
    for r in range(1, rounds + 1):
        guards.append(
            f"""SELECT l.node AS a, CAST(-1 AS BIGINT) AS b,
         CAST(-1 AS BIGINT) AS weight, {-r} AS "round"
  FROM lab{r}_{prop} l
  JOIN lab{r}_{prop - 1} p ON p.node = l.node
  WHERE p.lab <> l.lab"""
        )
    return (
        "WITH " + _WCE_PRELUDE + ",\n" + ",\n".join(ctes)
        + f'\nSELECT a, b, weight, "round" FROM ({final}'
        + "".join("\nUNION ALL\n" + g for g in guards)
        + ")"
    )


def _coloring_sql(rounds: int = _JP_ORACLE_ROUNDS) -> str:
    """Unrolled Jones–Plassmann DuckDB twin of
    :func:`graph_greedy_coloring`: a fixed hash order makes greedy
    coloring a pure function of the graph, so replaying the rounds —
    local-maximum ready set, mex over already-colored neighbors —
    reproduces the exact color assignment. The mex is set-SQL: the
    smallest k in 0..|used| not present among the used colors."""
    ctes = [
        f"""dsym AS (
  SELECT a, b, weight FROM wce
  UNION ALL SELECT b AS a, a AS b, weight FROM wce),
bb AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT a, b, row_number() OVER (
      PARTITION BY a ORDER BY weight DESC, b) AS rn
    FROM dsym) WHERE rn <= {_COLOR_TOPK}),
gsym AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM bb UNION ALL SELECT b AS a, a AS b FROM bb)),
pr AS MATERIALIZED (
  SELECT a AS v,
         CAST('0x' || substr(md5(CAST(a AS VARCHAR)), 1, 8) AS BIGINT) AS p
  FROM (SELECT DISTINCT a FROM gsym)),
unc0 AS MATERIALIZED (SELECT v FROM pr),
col0 AS MATERIALIZED (
  SELECT v, CAST(NULL AS BIGINT) AS color FROM pr WHERE FALSE)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""blocked{r} AS MATERIALIZED (
  SELECT DISTINCT s.a AS v
  FROM gsym s
  JOIN unc{r - 1} ua ON ua.v = s.a
  JOIN unc{r - 1} ub ON ub.v = s.b
  JOIN pr pa ON pa.v = s.a
  JOIN pr pb ON pb.v = s.b
  WHERE pb.p > pa.p OR (pb.p = pa.p AND s.b > s.a)),
ready{r} AS MATERIALIZED (
  SELECT v FROM unc{r - 1} u
  WHERE NOT EXISTS (SELECT 1 FROM blocked{r} b WHERE b.v = u.v)),
used{r} AS MATERIALIZED (
  SELECT DISTINCT s.a AS v, c.color AS c
  FROM gsym s
  JOIN ready{r} rd ON rd.v = s.a
  JOIN col{r - 1} c ON c.v = s.b),
cand{r} AS MATERIALIZED (
  SELECT rd.v, unnest(range(0, coalesce(u.nu, 0) + 1)) AS k
  FROM ready{r} rd
  LEFT JOIN (SELECT v, count(*) AS nu FROM used{r} GROUP BY v) u
    ON u.v = rd.v),
mex{r} AS MATERIALIZED (
  SELECT c.v, CAST(min(c.k) AS BIGINT) AS color
  FROM cand{r} c
  WHERE NOT EXISTS
    (SELECT 1 FROM used{r} u WHERE u.v = c.v AND u.c = c.k)
  GROUP BY c.v),
col{r} AS MATERIALIZED (
  SELECT v, color FROM col{r - 1}
  UNION ALL SELECT v, color FROM mex{r}),
unc{r} AS MATERIALIZED (
  SELECT v FROM unc{r - 1} u
  WHERE NOT EXISTS (SELECT 1 FROM mex{r} m WHERE m.v = u.v))"""
        )
    # exhaustion sentinel: still-uncolored vertices after all rounds
    # surface as color = -1 rows (real colors are >= 0), so a too-short
    # JP unroll reads as "bump _JP_ORACLE_ROUNDS", not as a Spark bug
    return (
        "WITH " + _WCE_PRELUDE + ",\n" + ",\n".join(ctes)
        + f"\nSELECT v AS user_id, color FROM col{rounds}"
        + f"\nUNION ALL SELECT v AS user_id, CAST(-1 AS BIGINT) AS color"
        + f" FROM unc{rounds}"
    )


_ANF_M = 8  # Flajolet-Martin sketches per vertex
_ANF_K = 2  # neighborhood radius
# est(r̄) = 2^(r_sum/8) / 0.77351 in ppm, split as 2^(r_sum div 8) ·
# C[r_sum % 8] with C_f = round(1e6 · 2^(f/8) / 0.77351) — pure
# integers, no pow() at query time on either engine
_ANF_C = tuple(
    round(1_000_000 * 2 ** (f / _ANF_M) / 0.77351) for f in range(_ANF_M)
)


def graph_neighborhood_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF — the Approximate Neighborhood Function (Palmer, Gibbons &
    Faloutsos, KDD 2002): per-vertex estimated |{u : dist(u,v) ≤ K}|
    via ``_ANF_M`` Flajolet–Martin bitmask sketches OR-propagated
    ``_ANF_K`` rounds along edges. THE scalable answer to
    "how big is every vertex's k-hop neighborhood": exact k-hop
    (``khop_neighbors``) materializes frontier sets that explode on
    dense graphs, while ANF carries a constant 8×64 bits per vertex —
    O(K·|E|) with bit_or as the only aggregate, the shape that
    survives a 100 TB edge list.

    Fully deterministic: the FM bit for (v, sketch m) is the number of
    trailing zeros of the first 60 md5 bits of ``v|m`` (engine-portable
    hash family); propagation is bitwise OR (order-free!); R = index
    of the lowest ZERO bit via the ``(~mask) & (mask+1)`` power-of-two
    trick + bit_count; and the 2^(r̄) estimate is decomposed into a
    shift and an integer constant table (``_ANF_C``) so no pow() is
    evaluated at query time. The oracle replays both rounds as
    unrolled bit_or CTEs.

    Output per vertex: r_sum (Σ_m R_m, exact integer) and est_ppm
    (neighborhood-size estimate ×1e6, exact integer). The result frame
    is memoized per (session, sf_dir) — the accuracy twin and any
    downstream consumer fetch the same checkpointed sketch table
    instead of re-propagating (the scc/hits discipline)."""
    def build() -> DataFrame:
        verts = user_vertices(spark, sf_dir)
        edges = _memoized(
            spark, "uedges_sym", sf_dir,
            lambda: user_edges_sym(spark, sf_dir),
        )
        return anf_frame(verts, edges)

    return _memoized(spark, "anf", sf_dir, build).select(
        F.col("v").alias("user_id"), "r_sum", "est_ppm"
    )


def anf_frame(verts: DataFrame, edges_sym: DataFrame) -> DataFrame:
    """ANF kernel on an arbitrary graph: ``verts``: (id),
    ``edges_sym``: (a, b) symmetric. Returns (v, r_sum, est_ppm).
    See :func:`graph_neighborhood_anf` for the full contract; the 1M
    rehearsal (tools/round8c_kernel_rehearsal.py) drives this frame
    directly."""
    edges = edges_sym
    sketches = verts.select(
        F.col("id").alias("v"),
        F.explode(F.array(*[F.lit(m) for m in range(_ANF_M)])).alias("m"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", "v", "m")), 1, 15), 16, 10
    ).cast("long")
    masks = sketches.withColumn("h", h).select(
        "v",
        "m",
        F.expr(
            "shiftleft(1L, least(bit_count((h & -h) - 1), 40))"
        ).alias("mask"),
    )
    for _ in range(_ANF_K):
        nbr = (
            edges.join(masks.withColumnRenamed("v", "a"), "a")
            .select(F.col("b").alias("v"), "m", "mask")
        )
        masks = (
            masks.unionByName(nbr)
            .groupBy("v", "m")
            .agg(F.expr("bit_or(mask)").alias("mask"))
            .transform(cut)
        )
    r = F.expr("bit_count(((~mask) & (mask + 1)) - 1)")
    per_v = masks.select("v", r.alias("r")).groupBy("v").agg(
        F.sum("r").cast("long").alias("r_sum")
    )
    c_case = "CASE " + " ".join(
        f"WHEN r_sum % {_ANF_M} = {f} THEN {c}L"
        for f, c in enumerate(_ANF_C)
    ) + " END"
    return per_v.select(
        "v",
        "r_sum",
        F.expr(
            f"shiftleft(1L, int(r_sum div {_ANF_M})) * ({c_case})"
        ).alias("est_ppm"),
    )


def _anf_sql() -> str:
    c_case = "CASE " + " ".join(
        f"WHEN r_sum % {_ANF_M} = {f} THEN CAST({c} AS BIGINT)"
        for f, c in enumerate(_ANF_C)
    ) + " END"
    rounds = []
    for k in range(1, _ANF_K + 1):
        prev = "m0" if k == 1 else f"m{k - 1}"
        rounds.append(
            f"""m{k} AS MATERIALIZED (
  SELECT v, m, bit_or(mask) AS mask FROM (
    SELECT v, m, mask FROM {prev}
    UNION ALL
    SELECT e.b AS v, p.m, p.mask
    FROM uedges e JOIN {prev} p ON p.v = e.a
  ) GROUP BY v, m)"""
        )
    return f"""
WITH {USER_EDGES_CTE},
sk AS (
  SELECT verts.v, s.m,
         CAST('0x' || substr(md5(CAST(verts.v AS VARCHAR) || '|' ||
                                 CAST(s.m AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM verts CROSS JOIN (SELECT unnest(range({_ANF_M})) AS m) s
),
m0 AS MATERIALIZED (
  SELECT v, m,
         (CAST(1 AS BIGINT) << least(bit_count((h & -h) - 1), 40)) AS mask
  FROM sk
),
{','.join(rounds)},
perv AS (
  SELECT v, CAST(sum(bit_count(((~mask) & (mask + 1)) - 1)) AS BIGINT)
           AS r_sum
  FROM m{_ANF_K} GROUP BY v
)
SELECT v AS user_id, r_sum,
       (CAST(1 AS BIGINT) << CAST(r_sum // {_ANF_M} AS INTEGER))
         * ({c_case}) AS est_ppm
FROM perv
"""


_RICH_CLUB_KS = (2, 4, 8, 16, 32)


def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the user graph (Colizza et al.
    2006): among vertices with degree > k, the fraction of possible
    edges actually present — "do the hubs talk to each other". One
    row per threshold in ``_RICH_CLUB_KS``: club size n_k, club
    directed-edge count e_k, and φ in parts-per-million
    (1e6·e_k div (n_k·(n_k−1)), BIGINT division, symmetric edges so
    both numerator and denominator count ordered pairs).

    Shape: degrees are one groupBy over the edge list; each threshold
    is a semi-join of the edge list against the (tiny) club vertex
    set — at 100 TB the club sets shrink as k grows, so the five
    audits are five broadcast semi-joins over one cached degree
    frame. No quadratic anything: e_k comes from counting EXISTING
    edges inside the club, never from enumerating possible ones."""
    edges = _memoized(
        spark, "uedges_sym", sf_dir, lambda: user_edges_sym(spark, sf_dir)
    )
    deg = cut(edges.groupBy("a").agg(F.count(F.lit(1)).alias("deg")))
    out = None
    for k in _RICH_CLUB_KS:
        club = deg.where(F.col("deg") > k).select("a")
        n_k = club.agg(F.count(F.lit(1)).alias("n_k"))
        e_k = (
            edges.join(F.broadcast(club), "a")
            .join(
                F.broadcast(club.withColumnRenamed("a", "b")), "b"
            )
            .agg(F.count(F.lit(1)).alias("e_k"))
        )
        row = n_k.crossJoin(e_k).select(
            F.lit(k).alias("k"),
            "n_k",
            "e_k",
            F.when(
                F.col("n_k") > 1,
                F.expr("(1000000 * e_k) div (n_k * (n_k - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("phi_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _rich_club_sql() -> str:
    parts = []
    for k in _RICH_CLUB_KS:
        parts.append(
            f"""SELECT {k} AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM club{k}) AS n_k,
       (SELECT CAST(count(*) AS BIGINT) FROM uedges e
        WHERE EXISTS (SELECT 1 FROM club{k} c WHERE c.v = e.a)
          AND EXISTS (SELECT 1 FROM club{k} c WHERE c.v = e.b)) AS e_k"""
        )
        parts[-1] = parts[-1]
    clubs = ",\n".join(
        f"""club{k} AS MATERIALIZED (
  SELECT a AS v FROM uedges GROUP BY a HAVING count(*) > {k})"""
        for k in _RICH_CLUB_KS
    )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH {USER_EDGES_CTE},
{clubs},
raw AS ({union})
SELECT k, n_k, e_k,
       CAST(CASE WHEN n_k > 1
                 THEN (1000000 * e_k) // (n_k * (n_k - 1))
                 ELSE 0 END AS BIGINT) AS phi_ppm
FROM raw
"""


_EFFDIAM_K = 3  # rounds tracked for the N(k) curve
_EFFDIAM_BP = 9000  # effective diameter: first k with N(k) >= 90% N(K)


def graph_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective diameter via the ANF curve (the headline application
    in the ANF paper): track the total estimated reachable-pair count
    N(k) = Σ_v |N_k(v)| for k = 1..``_EFFDIAM_K`` and report the first
    k where N(k) reaches ``_EFFDIAM_BP``/10⁴ of N(K) — "90% of all
    reachable pairs are within k hops", the small-world number for the
    user graph. Same O(K·|E|) bit_or propagation as
    ``graph_neighborhood_anf``; this key just snapshots the per-round
    totals instead of only the last round.

    All-integer: per-round totals sum the exact est_ppm integers;
    reach_bp is one BIGINT division; the flag is a comparison. Output:
    one row per k (k, total_est_ppm, reach_bp, is_effective_diameter)."""
    verts = user_vertices(spark, sf_dir)
    edges = _memoized(
        spark, "uedges_sym", sf_dir, lambda: user_edges_sym(spark, sf_dir)
    )
    sketches = verts.select(
        F.col("id").alias("v"),
        F.explode(F.array(*[F.lit(m) for m in range(_ANF_M)])).alias("m"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", "v", "m")), 1, 15), 16, 10
    ).cast("long")
    masks = sketches.withColumn("h", h).select(
        "v",
        "m",
        F.expr(
            "shiftleft(1L, least(bit_count((h & -h) - 1), 40))"
        ).alias("mask"),
    )
    c_case = "CASE " + " ".join(
        f"WHEN r_sum % {_ANF_M} = {f} THEN {c}L"
        for f, c in enumerate(_ANF_C)
    ) + " END"
    rounds = None
    for k in range(1, _EFFDIAM_K + 1):
        nbr = (
            edges.join(masks.withColumnRenamed("v", "a"), "a")
            .select(F.col("b").alias("v"), "m", "mask")
        )
        masks = (
            masks.unionByName(nbr)
            .groupBy("v", "m")
            .agg(F.expr("bit_or(mask)").alias("mask"))
            .transform(cut)
        )
        r = F.expr("bit_count(((~mask) & (mask + 1)) - 1)")
        total = (
            masks.select("v", r.alias("r"))
            .groupBy("v")
            .agg(F.sum("r").cast("long").alias("r_sum"))
            .select(
                F.expr(
                    f"shiftleft(1L, int(r_sum div {_ANF_M})) * ({c_case})"
                ).alias("est_ppm")
            )
            .agg(F.sum("est_ppm").cast("long").alias("total_est_ppm"))
            .select(F.lit(k).alias("k"), "total_est_ppm")
        )
        rounds = total if rounds is None else rounds.unionByName(total)
    out = rounds.withColumn(
        "reach_bp",
        # widen through DECIMAL(38,0) before the *10000: the BIGINT
        # product overflows once summed est_ppm approaches its
        # 2.8e18 r_sum-cap bound (round-8 ADVICE graph_extras.py:2847)
        F.expr(
            "CAST(CAST(total_est_ppm AS DECIMAL(38,0)) * 10000 div "
            "max(total_est_ppm) OVER () AS BIGINT)"
        ),
    )
    weff = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    return out.select(
        "k",
        "total_est_ppm",
        "reach_bp",
        (
            (F.col("reach_bp") >= _EFFDIAM_BP)
            & F.coalesce(
                F.max((F.col("reach_bp") >= _EFFDIAM_BP).cast("int")).over(
                    weff
                ) == 0,
                F.lit(True),
            )
        ).alias("is_effective_diameter"),
    )


def _effdiam_sql() -> str:
    c_case = "CASE " + " ".join(
        f"WHEN r_sum % {_ANF_M} = {f} THEN CAST({c} AS BIGINT)"
        for f, c in enumerate(_ANF_C)
    ) + " END"
    rounds = []
    totals = []
    for k in range(1, _EFFDIAM_K + 1):
        prev = "m0" if k == 1 else f"m{k - 1}"
        rounds.append(
            f"""m{k} AS MATERIALIZED (
  SELECT v, m, bit_or(mask) AS mask FROM (
    SELECT v, m, mask FROM {prev}
    UNION ALL
    SELECT e.b AS v, p.m, p.mask
    FROM uedges e JOIN {prev} p ON p.v = e.a
  ) GROUP BY v, m)"""
        )
        totals.append(
            f"""SELECT {k} AS k,
       CAST(sum((CAST(1 AS BIGINT) << CAST(r_sum // {_ANF_M} AS INTEGER))
                * ({c_case})) AS BIGINT) AS total_est_ppm
FROM (SELECT v, CAST(sum(bit_count(((~mask) & (mask + 1)) - 1)) AS BIGINT)
             AS r_sum
      FROM m{k} GROUP BY v)"""
        )
    union = "\nUNION ALL\n".join(totals)
    return f"""
WITH {USER_EDGES_CTE},
sk AS (
  SELECT verts.v, s.m,
         CAST('0x' || substr(md5(CAST(verts.v AS VARCHAR) || '|' ||
                                 CAST(s.m AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM verts CROSS JOIN (SELECT unnest(range({_ANF_M})) AS m) s
),
m0 AS MATERIALIZED (
  SELECT v, m,
         (CAST(1 AS BIGINT) << least(bit_count((h & -h) - 1), 40)) AS mask
  FROM sk
),
{','.join(rounds)},
curve AS ({union}),
scored AS (
  SELECT k, total_est_ppm,
         CAST(CAST(total_est_ppm AS HUGEINT) * 10000
           // (SELECT max(total_est_ppm) FROM curve) AS BIGINT) AS reach_bp
  FROM curve
)
SELECT k, total_est_ppm, reach_bp,
       reach_bp >= {_EFFDIAM_BP}
       AND COALESCE(max(CASE WHEN reach_bp >= {_EFFDIAM_BP} THEN 1
                             ELSE 0 END)
             OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) = 0,
             TRUE) AS is_effective_diameter
FROM scored
"""


_ANF_SAMPLE_MOD = 29  # accuracy twin: audit every 29th vertex


def graph_anf_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy scorecard for ``graph_neighborhood_anf`` — the recall
    twin every approximate operator here ships with (the simsearch
    recall pattern): on a deterministic vertex sample
    (user_id % ``_ANF_SAMPLE_MOD`` == 0), compute the EXACT 2-hop
    neighborhood size by frontier expansion and report it next to the
    sketch estimate as an integer basis-point ratio
    (est/exact × 10⁴). The exact pass runs only on the sample —
    bounded work regardless of graph size — which is exactly how a
    100 TB deployment audits its sketches.

    est_ppm and exact_n are both exact integers; ratio_bp is one
    BIGINT division (positive, trunc == floor)."""
    edges = _memoized(
        spark, "uedges_sym", sf_dir, lambda: user_edges_sym(spark, sf_dir)
    )
    sample = user_vertices(spark, sf_dir).where(
        F.pmod(F.col("id"), F.lit(_ANF_SAMPLE_MOD)) == 0
    ).select(F.col("id").alias("seed"))
    hop1 = (
        edges.join(sample.withColumnRenamed("seed", "a"), "a")
        .select(F.col("a").alias("seed"), F.col("b").alias("v"))
        .unionByName(sample.select("seed", F.col("seed").alias("v")))
        .distinct()
    )
    hop2 = (
        hop1.join(edges.withColumnRenamed("a", "v"), "v")
        .select("seed", F.col("b").alias("v"))
        .unionByName(hop1)
        .distinct()
    )
    exact = hop2.groupBy("seed").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    est = graph_neighborhood_anf(spark, sf_dir).where(
        F.pmod(F.col("user_id"), F.lit(_ANF_SAMPLE_MOD)) == 0
    )
    return exact.join(
        est, exact["seed"] == est["user_id"]
    ).select(
        "user_id",
        "exact_n",
        "est_ppm",
        # est_ppm*10000 would overflow BIGINT when the r_sum cap puts
        # est_ppm near 2.8e18 (round-8 ADVICE graph_extras.py:2847);
        # a/(100b) truncates identically to (a*10^4)/(10^6*b) for
        # nonnegative integers, so divide without pre-scaling.
        F.expr("est_ppm div (exact_n * 100)").alias("ratio_bp"),
    )


def _anf_accuracy_sql() -> str:
    anf = _anf_sql()
    # reuse the full ANF oracle as a subquery; exact 2-hop via two
    # semi-join expansions over the same uedges CTE
    return f"""
WITH {USER_EDGES_CTE},
sample AS (SELECT v AS seed FROM verts WHERE v % {_ANF_SAMPLE_MOD} = 0),
hop1 AS (
  SELECT DISTINCT seed, v FROM (
    SELECT s.seed, e.b AS v FROM sample s JOIN uedges e ON e.a = s.seed
    UNION ALL SELECT seed, seed AS v FROM sample)
),
hop2 AS (
  SELECT DISTINCT seed, v FROM (
    SELECT h.seed, e.b AS v FROM hop1 h JOIN uedges e ON e.a = h.v
    UNION ALL SELECT seed, v FROM hop1)
),
exact AS (
  SELECT seed, CAST(count(*) AS BIGINT) AS exact_n FROM hop2 GROUP BY seed
),
anf AS ({anf})
SELECT a.user_id, x.exact_n, a.est_ppm,
       a.est_ppm // (x.exact_n * 100) AS ratio_bp
FROM anf a JOIN exact x ON x.seed = a.user_id
WHERE a.user_id % {_ANF_SAMPLE_MOD} = 0
"""


QUERIES = {
    "graph_neighborhood_anf": graph_neighborhood_anf,
    "graph_anf_accuracy": graph_anf_accuracy,
    "graph_effective_diameter": graph_effective_diameter,
    "graph_rich_club": graph_rich_club,
    "graph_mis_luby": graph_mis_luby,
    "pagerank_personalized": pagerank_personalized,
    "link_predict_jaccard": link_predict_jaccard,
    "link_predict_resource_alloc": link_predict_resource_alloc,
    "gnn_sample_fanout": gnn_sample_fanout,
    "graph_mst_boruvka": graph_mst_boruvka,
    "graph_temporal_reachability": graph_temporal_reachability,
    "graph_greedy_coloring": graph_greedy_coloring,
    "sssp_pred_tree": sssp_pred_tree,
    "graph_activity_timeline": graph_activity_timeline,
    "topo_longest_path": topo_longest_path,
    "edge_jaccard": edge_jaccard,
    "bipartite_copurchase": bipartite_copurchase,
    "graph_random_walks": graph_random_walks,
    "graph_node2vec_walks": graph_node2vec_walks,
    "scc_strongly_connected": scc_strongly_connected,
    "katz_centrality": katz_centrality,
    "graph_eccentricity": graph_eccentricity,
    "path_shortest_bidirectional": path_shortest_bidirectional,
}

ORACLES = {
    "graph_neighborhood_anf": _anf_sql(),
    "graph_anf_accuracy": _anf_accuracy_sql(),
    "graph_effective_diameter": _effdiam_sql(),
    "graph_rich_club": _rich_club_sql(),
    "graph_mis_luby": _mis_sql(),
    "link_predict_jaccard": _LINK_PREDICT_SQL,
    "link_predict_resource_alloc": _LINK_PREDICT_RA_SQL,
    "gnn_sample_fanout": _GNN_SAMPLE_SQL,
    "graph_eccentricity": _ECC_SQL,
    "path_shortest_bidirectional": _BIDIR_SQL,
    "graph_mst_boruvka": _mst_sql(),
    "graph_temporal_reachability": _TEMPORAL_REACH_SQL,
    "graph_greedy_coloring": _coloring_sql(),
    "graph_random_walks": _walks_sql(),
    "graph_node2vec_walks": _n2v_sql(),
    "scc_strongly_connected": _SCC_SQL,
    "katz_centrality": _katz_sql(),
    "pagerank_personalized": _ppr_sql(),
    "sssp_pred_tree": _PRED_TREE_SQL,
    "graph_activity_timeline": _ACTIVITY_TIMELINE_SQL,
    "topo_longest_path": _TOPO_SQL,
    "edge_jaccard": _EDGE_JACCARD_SQL,
    "bipartite_copurchase": _BIPARTITE_SQL,
}
