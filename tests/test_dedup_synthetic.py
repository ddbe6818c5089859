"""Dedup operators on SYNTHETIC near-duplicate data.

The sf fixtures contain no true near-dups (random text / random
embeddings), so these tests build tiny corpora that do: they pin (a)
the ADVICE short-doc crash regression, (b) recall — the banded paths
actually FIND near-dups, (c) Spark↔DuckDB hash parity on data where the
result is non-empty, and (d) the exact all-pairs baseline the banded
embedding path replaced (kept here, small-n only, per round-1 verdict).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graph_database_akkatyped_spark.operators import llm
from tests.oracle_utils import compare

_BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from a mossy stone near the river bend"
)
_NEAR1 = _BASE.replace("mossy", "shiny")
_NEAR2 = _BASE.replace("river", "creek")
_OTHER = (
    "completely different subject matter about spacecraft telemetry "
    "budgets and the committee reviewing propulsion schedules today"
)

_DOCS = [
    (0, _BASE),
    (1, _NEAR1),
    (2, _NEAR2),
    (3, _OTHER),
    (4, ""),  # ADVICE regression: 0 tokens -> negative un-clamped slice len
    (5, "single"),  # 1 token
    (6, "two tokens"),  # 2 tokens: still no 3-gram
]


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup_docs")
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in _DOCS], pa.int64()),
            "text": pa.array([t for _, t in _DOCS], pa.string()),
            "lang": pa.array(["en"] * len(_DOCS), pa.string()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _duck_for(path: str, table: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}/{table}.parquet')"
    )
    return con


def test_ngram_short_docs_do_not_crash_and_match_oracle(spark, docs_dir):
    df = llm.dedup_ngram_jaccard(spark, docs_dir)  # would raise pre-clamp
    spark_pd = df.toPandas()
    con = _duck_for(docs_dir, "documents")
    oracle_pd = con.execute(llm._DEDUP_NGRAM_SQL).fetchdf()
    assert not compare(spark_pd, oracle_pd)
    # recall: the three near-dup docs must pair up through the banding
    found = {tuple(sorted((a, b))) for a, b in zip(spark_pd.a, spark_pd.b)}
    assert {(0, 1), (0, 2), (1, 2)} <= found
    # short docs produce no shingles, hence no pairs
    assert not any(a >= 4 or b >= 4 for a, b in found)


def test_clusters_collapse_transitively(spark, docs_dir):
    out = llm.dedup_clusters(spark, docs_dir).toPandas()
    by_doc = dict(zip(out.doc_id, out.cluster))
    assert by_doc[0] == by_doc[1] == by_doc[2] == 0  # one cluster, keeper=min id
    keepers = set(out[out.is_keeper].doc_id)
    assert 0 in keepers and 1 not in keepers and 2 not in keepers
    con = _duck_for(docs_dir, "documents")
    oracle_pd = con.execute(llm._DEDUP_CLUSTERS_SQL).fetchdf()
    assert not compare(llm.dedup_clusters(spark, docs_dir).toPandas(), oracle_pd)


_DIM = 64


def _vecs() -> list[list[float]]:
    rng = np.random.default_rng(7)
    base = rng.normal(size=_DIM).astype(np.float32)
    near = base + rng.normal(scale=0.02, size=_DIM).astype(np.float32)  # cos≈1
    far = rng.normal(size=_DIM).astype(np.float32)  # cos≈0
    flipped = (-base).astype(np.float32)  # cos=-1
    near2 = base * np.float32(1.015)  # same direction, cos=1
    return [v.tolist() for v in (base, near, far, flipped, near2)]


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup_emb")
    vs = _vecs()
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vs)), pa.int64()),
            "embedding": pa.array(vs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


def test_embedding_banded_matches_exact_allpairs(spark, emb_dir):
    """Banded result == exact all-pairs baseline on vectors built to be
    near-dups (the small-n home of the old crossJoin formulation)."""
    vs = [np.array(v, dtype=np.float64) for v in _vecs()]
    exact = set()
    for i in range(len(vs)):
        for j in range(i + 1, len(vs)):
            cos = float(
                vs[i] @ vs[j] / (np.linalg.norm(vs[i]) * np.linalg.norm(vs[j]))
            )
            if cos >= 0.95:
                exact.add((i, j))
    assert exact == {(0, 1), (0, 4), (1, 4)}  # the test is non-vacuous
    out = llm.dedup_embedding_cosine(spark, emb_dir).toPandas()
    assert {tuple(r) for r in zip(out.a, out.b)} == exact
    assert (out.cos >= 0.95).all()


def test_embedding_banded_parity_nonempty(spark, emb_dir):
    spark_pd = llm.dedup_embedding_cosine(spark, emb_dir).toPandas()
    assert len(spark_pd) == 3
    con = _duck_for(emb_dir, "embeddings")
    oracle_pd = con.execute(llm._DEDUP_EMB_SQL).fetchdf()
    assert not compare(spark_pd, oracle_pd)


@pytest.mark.parametrize("n_salt", [1, 3, 8])
def test_embedding_salted_identical_to_unsalted(spark, emb_dir, n_salt):
    """Grid salting must change partitioning only: the pair set and the
    cosines are bit-identical to the unsalted operator at any g,
    including g=1 (degenerate single slot) and g > n (over-split)."""
    base = (
        llm.dedup_embedding_cosine(spark, emb_dir)
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    salted = (
        llm.dedup_embedding_cosine_salted(spark, emb_dir, n_salt=n_salt)
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert base.equals(salted)


def test_keep_best_one_keeper_max_quality(spark):
    """dedup_keep_best invariants on real fixtures: exactly one keeper
    per cluster, and the keeper carries the cluster-max quality."""
    from pyspark.sql import functions as F
    from graph_database_akkatyped_spark.operators.llm import dedup_keep_best

    out = dedup_keep_best(spark, "/root/testdata/sf0.001")
    per = out.groupBy("cluster").agg(
        F.sum(F.col("is_keeper").cast("int")).alias("n_keep"),
        F.max("quality").alias("q_max"),
        F.max_by("quality", F.col("is_keeper").cast("int")).alias("q_keep"),
    )
    bad = per.where(
        (F.col("n_keep") != 1) | (F.col("q_keep") < F.col("q_max"))
    ).count()
    assert bad == 0
    assert out.count() > 0


_P20_A = " ".join(f"alpha{i}" for i in range(20))   # paragraph A (20 words)
_P20_B = " ".join(f"beta{i}" for i in range(20))    # paragraph B (shared)
_P20_C = " ".join(f"gamma{i}" for i in range(20))   # paragraph C


@pytest.fixture(scope="module")
def para_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("para_docs")
    docs = [
        (0, _P20_A + " " + _P20_B),  # first carrier of B
        (1, _P20_C + " " + _P20_B),  # later copy of B -> must be dropped
        (2, _P20_B + " " + _P20_B),  # intra-doc repeat -> keep one
        (3, "tail words only"),      # sub-chunk doc, unique
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_paragraph_dedup_first_occurrence_wins(spark, para_dir):
    """dedup_paragraph semantics on a corpus with engineered overlap:
    the earliest copy (doc order, then position) of a duplicated
    paragraph survives, later copies are removed, and documents are
    reconstructed from their surviving chunks in order."""
    out = llm.dedup_paragraph(spark, para_dir).toPandas()
    row = dict(
        (int(r.doc_id), (int(r.n_chunks), int(r.n_kept), r.kept_text))
        for r in out.itertuples()
    )
    # doc 0 carries the first copy of B: everything kept
    assert row[0] == (2, 2, _P20_A + " " + _P20_B)
    # doc 1's copy of B is a later occurrence: only C survives
    assert row[1] == (2, 1, _P20_C)
    # intra-doc repeat: doc 2's SECOND B goes (its first B already lost
    # to doc 0's earlier copy, so nothing survives)
    assert row[2] == (2, 0, "")
    # unique sub-chunk doc untouched
    assert row[3] == (1, 1, "tail words only")
    con = _duck_for(para_dir, "documents")
    oracle_pd = con.execute(llm._DEDUP_PARAGRAPH_SQL).fetchdf()
    assert not compare(out, oracle_pd)


def test_semantic_dedup_planted_duplicates(spark):
    """SemDeDup contract on planted data at the PRODUCTION threshold
    (0.95): scaled copies of a cluster exemplar (cosine exactly 1) die
    except the smallest vec_id; genuinely distinct members of the same
    cluster (cosine ~0.92 to the exemplar) survive; clusters are the
    planted families."""
    dim = 64
    fams = []
    for f in range(4):
        c = np.zeros(dim)
        c[f * 16 : (f + 1) * 16] = 1.0
        fams.append(c)
    rows = []
    # ids 0..3: one exemplar per family (k-means init = 4 smallest ids)
    for f, c in enumerate(fams):
        rows.append((f, c))
    # ids 4..9: scaled copies of family 0 and 1 — perfect semantic dups
    rows.append((4, fams[0] * 1.5))
    rows.append((5, fams[0] * 0.7))
    rows.append((6, fams[1] * 2.0))
    rows.append((7, fams[1] * 1.1))
    # ids 8..9: distinct members of family 2/3 (perturbed: cos ~0.92)
    p2 = fams[2].copy(); p2[2 * 16] += 2.0
    p3 = fams[3].copy(); p3[3 * 16 + 5] += 2.0
    rows.append((8, p2))
    rows.append((9, p3))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in llm.dedup_semantic_frame(emb, tau=0.95).collect()
    }
    assert len(out) == 10
    # family co-membership: copies share their exemplar's cluster
    assert out[4]["cid"] == out[5]["cid"] == out[0]["cid"]
    assert out[6]["cid"] == out[7]["cid"] == out[1]["cid"]
    assert out[8]["cid"] == out[2]["cid"]
    assert out[9]["cid"] == out[3]["cid"]
    # perfect dups die, keeping the smallest id per family
    assert out[0]["keep"] and not out[4]["keep"] and not out[5]["keep"]
    assert out[1]["keep"] and not out[6]["keep"] and not out[7]["keep"]
    # distinct same-cluster members survive the production threshold
    assert out[2]["keep"] and out[8]["keep"]
    assert out[3]["keep"] and out[9]["keep"]
    # prune accounting: id 5 has dups 0 and 4 earlier in its cluster
    assert out[5]["n_dup_earlier"] == 2 and out[4]["n_dup_earlier"] == 1


_EXCERPT = (
    "governing board approved the coastal survey plan after reviewing "
    "tide gauge records"
)
_HOST = (
    _EXCERPT
    + " and the committee then scheduled seventeen additional public "
    "hearings across four counties to gather comment on dredging "
    "permits wetland buffers ferry schedules and the proposed "
    "breakwater maintenance fund for next fiscal year"
)


@pytest.fixture(scope="module")
def contain_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("contain_docs")
    docs = [
        (0, _EXCERPT),  # small doc, fully contained in doc 1
        (1, _HOST),     # host: excerpt is a prefix
        (2, "entirely unrelated memorandum about orchestra rehearsal "
            "schedules and the brass section's travel reimbursements"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_containment_finds_planted_excerpt(spark, contain_dir):
    """dedup_containment semantics on a planted excerpt: doc 0 is a
    contiguous prefix of doc 1, so every 3-gram of doc 0 appears in
    doc 1 — containment(0 in 1) is exactly 1.0 even though Jaccard is
    well under the symmetric threshold. The unrelated doc 2 pairs with
    nothing. Also pins Spark<->DuckDB hash parity on non-empty output."""
    out = llm.dedup_containment(spark, contain_dir).toPandas()
    pairs = {(int(r.a), int(r.b)): r for r in out.itertuples()}
    assert (0, 1) in pairs, "planted excerpt pair must be recalled"
    r = pairs[(0, 1)]
    assert r.contain_a_in_b == 1.0
    assert r.contain_b_in_a < 0.5
    assert all(2 not in k for k in pairs)
    con = _duck_for(contain_dir, "documents")
    oracle_pd = con.execute(llm._DEDUP_CONTAIN_SQL).fetchdf()
    assert not compare(out, oracle_pd)


def test_phash_dedup_planted_near_identical_payloads(spark, tmp_path):
    """multimodal_phash_dedup on planted binaries: two payloads whose
    bodies differ in a handful of bytes land within the Hamming
    threshold (near-dups), a structurally different payload pairs with
    nothing, and the Spark result hash-matches the ascii()-twin oracle
    on the same corpus."""
    from graph_database_akkatyped_spark.operators.llm import (
        _PHASH_SQL,
        multimodal_phash_dedup,
    )

    base = "abcdefgh" * 40
    near = "x" + base[1:-1] + "y"          # 2 of 320 bytes changed
    far = "a" * 160 + "z" * 160            # low half / high half
    docs = [(0, base), (1, near), (2, far)]
    d = tmp_path / "phash"
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
    out = {r.doc_id: r for r in multimodal_phash_dedup(spark, str(d)).collect()}
    assert out[0].n_near >= 1 and out[1].n_near >= 1, "planted near-dup missed"
    assert out[2].n_near == 0, "structurally different payload must not pair"
    assert len(out[0].phash) == 64 and set(out[0].phash) <= {"0", "1"}
    con = _duck_for(str(d), "documents")
    oracle_pd = con.execute(_PHASH_SQL).fetchdf()
    spark_pd = multimodal_phash_dedup(spark, str(d)).toPandas()
    assert not compare(spark_pd, oracle_pd)


def test_containment_smallside_guaranteed_recall(spark, contain_dir):
    """dedup_containment_smallside: a FULLY contained doc is recalled
    with probability 1 (its sampled grams are grams of the host by
    definition), with the same verified values as the banded variant,
    and the host/unrelated structure holds."""
    out = llm.dedup_containment_smallside(spark, contain_dir).toPandas()
    pairs = {(int(r.a), int(r.b)): r for r in out.itertuples()}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r.contain_a_in_b == 1.0
    assert all(2 not in k for k in pairs)
    con = _duck_for(contain_dir, "documents")
    oracle_pd = con.execute(llm._DEDUP_CONTAIN_SMALL_SQL).fetchdf()
    assert not compare(out, oracle_pd)


_L8_A = "alpha beta gamma delta epsilon zeta eta theta"      # 8 words
_L8_B = "one two three four five six seven eight"            # 8 words
_L8_C = "nine ten eleven twelve thirteen fourteen fifteen sixteen"


@pytest.fixture(scope="module")
def lines_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("line_docs")
    docs = [
        (0, _L8_A + " " + _L8_B),   # first carrier of B
        (1, _L8_B + " " + _L8_C),   # later copy of B -> removed
        (2, _L8_B + " " + _L8_B),   # intra-doc repeat: both copies lose
        (3, "tail words only"),     # partial (<8 words) unique line
        (4, _L8_A.upper()),         # case variant: NORMALIZED hash collides
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_line_dedup_first_occurrence_wins(spark, lines_dir):
    """dedup_lines semantics on planted duplicates: the globally first
    copy (doc order, then line order) of a normalized line survives,
    later copies (including intra-doc repeats and case variants) are
    removed, and the kept_hash pins the RAW-line reassembly."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    out = llm.dedup_lines(spark, lines_dir).toPandas()
    row = dict(
        (int(r.doc_id), (int(r.n_lines), int(r.n_removed), r.kept_hash))
        for r in out.itertuples()
    )
    assert row[0] == (2, 0, md5(_L8_A + "\n" + _L8_B))
    assert row[1] == (2, 1, md5(_L8_C))
    assert row[2] == (2, 2, md5(""))
    assert row[3] == (1, 0, md5("tail words only"))
    # normalized hash matches doc 0's copy, so the raw UPPER line goes
    assert row[4] == (1, 1, md5(""))
    con = _duck_for(lines_dir, "documents")
    oracle_pd = con.execute(llm._DEDUP_LINES_SQL).fetchdf()
    assert not compare(out, oracle_pd)


def test_line_boilerplate_drops_all_copies(spark, lines_dir):
    """dedup_lines_boilerplate vs dedup_lines on the same corpus: a
    line seen in >= 2 DISTINCT docs loses every copy (including the
    first, which dedup_lines keeps), intra-doc repetition alone
    counts once, and case variants collapse through the normalized
    hash."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    out = llm.dedup_lines_boilerplate(spark, lines_dir).toPandas()
    row = dict(
        (int(r.doc_id), (int(r.n_lines), int(r.n_boiler), r.kept_hash))
        for r in out.itertuples()
    )
    # A is in docs {0, 4-as-case-variant}, B in docs {0, 1, 2}: both
    # boilerplate; C and the tail line are single-doc -> kept
    assert row[0] == (2, 2, md5(""))      # dedup_lines kept both here
    assert row[1] == (2, 1, md5(_L8_C))
    assert row[2] == (2, 2, md5(""))
    assert row[3] == (1, 0, md5("tail words only"))
    assert row[4] == (1, 1, md5(""))
    con = _duck_for(lines_dir, "documents")
    oracle_pd = con.execute(llm._DEDUP_LINES_BOILER_SQL).fetchdf()
    assert not compare(out, oracle_pd)


def test_bpe_merge_greedy_nonoverlap(spark, tmp_path_factory):
    """Planted corpus pinning the BPE step end-to-end: 'aa' must win
    the pair vote, and the greedy left-to-right apply must merge
    'aaaa' into [aa, aa] and 'aaa' into [aa, a] (run-parity rule),
    never the overlapping variants."""
    d = tmp_path_factory.mktemp("bpe")
    texts = ["aaaa aaa xy", "aaaa xy", "aaa"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    rows = llm.text_bpe_merge(spark, str(d)).collect()
    assert rows, "no pairs returned"
    # chosen merge: 'a','a' (aa appears 3+2+2+1... dominates)
    assert (rows[0].ml, rows[0].mr) == ("a", "a")
    got = {(r.l, r.r): r.cnt for r in rows}
    # word counts: aaaa x2, aaa x2, xy x2
    # post-merge sequences: aaaa -> [aa, aa]; aaa -> [aa, a]; xy -> [x, y]
    assert got[("aa", "aa")] == 2
    assert got[("aa", "a")] == 2
    assert got[("x", "y")] == 2
    # overlapping merge artifacts must not exist
    assert ("a", "aa") not in got


def test_bpe_encode_fixed_merges(spark, tmp_path_factory):
    """Planted corpus pinning the encode chain: the fixed table
    (t,a)(l,e)(ta,b) must tokenize 'table'->[tab,le], 'tab'->[tab],
    'tatat'->[ta,ta,t] (merges can't overlap when ml != mr, and the
    third merge must see the FIRST merge's output symbol), with exact
    per-doc word/token counts and oracle hash parity."""
    d = tmp_path_factory.mktemp("bpe_enc")
    texts = ["table tata xyz", "tab tab a", "lele table", "tatat"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    out = llm.text_bpe_encode(spark, str(d)).toPandas()
    got = {
        int(r.doc_id): (int(r.n_words), int(r.n_tokens))
        for r in out.itertuples()
    }
    # table -> ta b l e -> ta b le -> [tab, le] = 2; tata -> [ta, ta] = 2
    assert got[0] == (3, 2 + 2 + 3)
    # tab -> ta b -> [tab] = 1; a -> [a] = 1
    assert got[1] == (3, 1 + 1 + 1)
    # lele -> [le, le] = 2
    assert got[2] == (2, 2 + 2)
    # tatat -> [ta, ta, t] = 3 (left-to-right, no overlap possible)
    assert got[3] == (1, 3)
    con = _duck_for(str(d), "documents")
    oracle_pd = con.execute(llm._BPE_ENCODE_SQL).fetchdf()
    assert not compare(out, oracle_pd)


def test_entity_resolve_blocked_planted(spark, tmp_path_factory):
    """Planted master/dirty pair: every 5th customer re-registers, every
    3rd of those with one substitution in the last 6 chars. The masked-
    neighborhood blocking must surface every planted edit (structural
    recall), the verify must score dist exactly 0/1, and the oracle must
    hash-match."""
    from graph_database_akkatyped_spark.operators import relational_extras as rx

    d = tmp_path_factory.mktemp("er")
    n = 30
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n), pa.int64()),
                "c_name": pa.array([f"cust-{i:03d}" for i in range(n)]),
            }
        ),
        d / "customer.parquet",
    )
    out = rx.entity_resolve_blocked(spark, str(d)).toPandas()
    got = {
        int(r.r_id): (int(r.match_key), int(r.dist), int(r.correct))
        for r in out.itertuples()
    }
    # dirty batch = custkeys 0,5,10,15,20,25; edits at custkey%15==0
    assert set(got) == {1000000 + k for k in (0, 5, 10, 15, 20, 25)}
    for k in (5, 10, 20, 25):  # clean re-registrations: exact match
        assert got[1000000 + k] == (k, 0, 1)
    # custkey 0: k=0 masks the LAST char -> 'cust-00x'; ten digit
    # neighbors tie at dist 1, min custkey (=0, the true one) wins
    assert got[1000000] == (0, 1, 1)
    # custkey 15: k=3 replaces the '-' -> 'custx015'; only the true
    # master is at dist 1
    assert got[1000015] == (15, 1, 1)
    con = _duck_for(str(d), "customer")
    oracle_pd = con.execute(rx._ER_SQL).fetchdf()
    assert not compare(out, oracle_pd)
