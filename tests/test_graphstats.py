"""Unit tests for operators/graphstats.py (triangle counting +
common-neighbor link prediction) and datapipe/retrieval.py (BM25).

Gate parity (test_gate_parity) checks these against their DuckDB
oracles over the driver corpus; the tests here pin the SEMANTICS on
hand-checkable and adversarial inputs: a brute-force triangle oracle
on a deterministic pseudo-random graph, orientation invariance, the
hub-guard and anti-join rules of link prediction, and BM25 ordering
behavior (rarity wins, saturation, length normalization).
"""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import functions as F


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, "rel", b) for a, b in pairs], "subj string, pred string, obj string"
    )


def _pseudo_random_graph(n=40, m=160):
    """Deterministic edge list via md5 (no Math.random in tests either:
    reproducibility is the point). Includes self-loops, duplicates and
    both orientations to exercise the simple-graph normalization."""
    pairs = []
    for i in range(m):
        h = hashlib.md5(f"gs::{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % n, int(h[8:16], 16) % n
        pairs.append((f"n{a}", f"n{b}"))
    return pairs


def _brute_triangles(pairs):
    und = {
        tuple(sorted(p)) for p in pairs if p[0] != p[1]
    }
    nodes = sorted({x for p in und for x in p})
    count = dict()
    for x, y, z in itertools.combinations(nodes, 3):
        if ((x, y) in und and (y, z) in und
                and tuple(sorted((x, z))) in und):
            for v in (x, y, z):
                count[v] = count.get(v, 0) + 1
    return count


def test_triangle_counts_match_brute_force(spark):
    from ummon_spark.operators.graphstats import triangle_counts

    pairs = _pseudo_random_graph()
    got = {
        r["id"]: r["triangles"]
        for r in triangle_counts(_edges_df(spark, pairs)).collect()
    }
    assert got == _brute_triangles(pairs)
    assert got, "pseudo-random graph should contain triangles"


def test_triangle_counts_orientation_invariant(spark):
    """Reversing every edge (and duplicating a few in both directions)
    must not change the undirected triangle counts."""
    from ummon_spark.operators.graphstats import triangle_counts

    pairs = _pseudo_random_graph(n=20, m=60)
    fwd = triangle_counts(_edges_df(spark, pairs)).collect()
    rev = triangle_counts(
        _edges_df(spark, [(b, a) for a, b in pairs] + pairs[:10])
    ).collect()
    assert sorted(map(tuple, fwd)) == sorted(map(tuple, rev))


def test_common_neighbors_hand_checked(spark):
    """Path a-c-b plus edge a-d, b-d: pair (a,b) shares {c, d};
    deg(a)=deg(b)=2, so jaccard = 2/(2+2-2) = 1.0. Pair (c,d) shares
    {a, b} with the same degrees. Adjacent pairs are excluded."""
    from ummon_spark.operators.graphstats import (
        JACCARD_SCALE,
        common_neighbors,
    )

    pairs = [("a", "c"), ("c", "b"), ("a", "d"), ("b", "d")]
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard_scaled"])
        for r in common_neighbors(_edges_df(spark, pairs)).collect()
    }
    assert got == {
        ("a", "b"): (2, JACCARD_SCALE),
        ("c", "d"): (2, JACCARD_SCALE),
    }


def test_common_neighbors_hub_guard_and_antijoin(spark):
    """A hub with degree > max_center_degree must not act as a wedge
    center: its leaves get no pairs through it. Pairs that are already
    edges never appear regardless."""
    from ummon_spark.operators.graphstats import common_neighbors

    hub = [("hub", f"leaf{i}") for i in range(5)]
    # triangle so SOME pair exists via a small center
    tri = [("x", "y"), ("y", "z"), ("x", "z"), ("x", "w"), ("y", "w")]
    edges = _edges_df(spark, hub + tri)
    got = {
        (r["a"], r["b"]) for r in common_neighbors(edges, max_center_degree=3).collect()
    }
    assert all("leaf" not in a and "leaf" not in b for a, b in got)
    # (x, y) share z and w but are adjacent -> excluded; (w, z) share x, y
    assert ("w", "z") in got and ("x", "y") not in got
    # with the cap lifted the hub pairs appear
    got_full = {
        (r["a"], r["b"]) for r in common_neighbors(edges, max_center_degree=100).collect()
    }
    assert ("leaf0", "leaf1") in got_full


def test_common_neighbors_topk_rank(spark):
    from ummon_spark.operators.graphstats import common_neighbors_topk

    pairs = _pseudo_random_graph(n=15, m=50)
    rows = common_neighbors_topk(_edges_df(spark, pairs), k=5).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    keys = [
        (-r["jaccard_scaled"], -r["n_common"], r["a"], r["b"]) for r in rows
    ]
    assert keys == sorted(keys)


def _brute_pagerank(node_ids, pairs, n_iters=5, scale=1_000_000):
    """Pure-python twin of the integer recurrence (floor div, exact)."""
    pairs = sorted({p for p in pairs})
    outdeg = {}
    for a, _ in pairs:
        outdeg[a] = outdeg.get(a, 0) + 1
    base = scale * 15 // 100
    score = {n: scale for n in node_ids}
    for _ in range(n_iters):
        new = {n: base for n in node_ids}
        for a, b in pairs:
            if a in score:
                new[b] = new.get(b, base) + (85 * score[a]) // (100 * outdeg[a])
        score = {n: new[n] for n in node_ids}
    return score


def test_pagerank_matches_brute_force(spark):
    from ummon_spark.operators.graphstats import pagerank

    raw = _pseudo_random_graph(n=25, m=80)
    pairs = sorted({p for p in raw})
    node_ids = sorted({x for p in pairs for x in p})
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id string")
    got = {
        r["id"]: r["score"]
        for r in pagerank(nodes, _edges_df(spark, raw)).collect()
    }
    assert got == _brute_pagerank(node_ids, pairs)


def test_pagerank_sink_and_source(spark):
    """Chain a->b->c: the sink accumulates, the source stays at base
    after iteration 1; exact values hand-derived from the recurrence."""
    from ummon_spark.operators.graphstats import pagerank

    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    got = {
        r["id"]: r["score"]
        for r in pagerank(nodes, _edges_df(spark, [("a", "b"), ("b", "c")])).collect()
    }
    assert got == _brute_pagerank(["a", "b", "c"], [("a", "b"), ("b", "c")])
    assert got["a"] == 150_000              # pure source: base only
    assert got["c"] > got["b"] > got["a"]   # downstream accumulates


def test_pagerank_parallel_preds_collapse(spark):
    """Two predicates over the same (subj, obj) count once (DISTINCT
    pair semantics)."""
    from ummon_spark.operators.graphstats import pagerank

    nodes = spark.createDataFrame([("a",), ("b",)], "id string")
    single = spark.createDataFrame(
        [("a", "calls", "b")], "subj string, pred string, obj string"
    )
    double = spark.createDataFrame(
        [("a", "calls", "b"), ("a", "imports", "b")],
        "subj string, pred string, obj string",
    )
    s1 = sorted(map(tuple, pagerank(nodes, single).collect()))
    s2 = sorted(map(tuple, pagerank(nodes, double).collect()))
    assert s1 == s2


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


def test_bm25_rare_term_outranks_common(spark):
    """A doc matching the rare query term beats docs matching only the
    ubiquitous one; a doc matching both beats both. Ties break on
    doc_id ascending and rank is dense 1..k."""
    from ummon_spark.datapipe.retrieval import bm25_topk

    texts = (
        ["common filler filler"] * 6          # docs 0-5: common only
        + ["rare filler filler"]              # doc 6: rare only
        + ["rare common filler"]              # doc 7: both
    )
    rows = bm25_topk(_docs_df(spark, texts), ["rare", "common"], k=10).collect()
    by_rank = {r["rank"]: r["doc_id"] for r in rows}
    assert by_rank[1] == "7"                  # both terms
    assert by_rank[2] == "6"                  # rare only
    assert set(by_rank[r] for r in range(3, 9)) == {"0", "1", "2", "3", "4", "5"}
    assert [r for r in sorted(by_rank)] == list(range(1, 9))
    # identical docs tie -> doc_id ascending
    assert [by_rank[r] for r in range(3, 9)] == ["0", "1", "2", "3", "4", "5"]


def test_bm25_tf_saturates_and_length_normalizes(spark):
    """More occurrences score higher but sub-linearly (k1 saturation);
    the same tf in a longer doc scores lower (b normalization)."""
    from ummon_spark.datapipe.retrieval import bm25_topk

    texts = [
        "term x",                # doc 0: tf=1, short
        "term term x",           # doc 1: tf=2
        "term term term term x",  # doc 2: tf=4
        "term " + "pad " * 30 + "x",  # doc 3: tf=1, long
    ]
    score = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_docs_df(spark, texts), ["term"], k=10).collect()
    }
    assert score["2"] > score["1"] > score["0"] > score["3"]
    # saturation: tf 1->2 gains more than tf 2->4
    assert score["1"] - score["0"] > score["2"] - score["1"]


def test_bm25_empty_and_unknown_terms(spark):
    from ummon_spark.datapipe.retrieval import bm25_topk

    docs = _docs_df(spark, ["a b c", "b c d"])
    assert bm25_topk(docs, ["zzz"], k=5).count() == 0
    out = bm25_topk(docs, ["B", "b", ""], k=5)  # dedup + lowercase + drop empty
    assert out.count() == 2
    assert out.schema["score"].dataType.typeName() == "long"


def test_analytics_job_end_to_end(spark, tmp_path):
    """jobs/analytics_job.py over a tiny materialized graph writes all
    four analytics tables; pagerank/triangles agree with direct calls."""
    import sys

    from ummon_spark.corpus import load_spans
    from ummon_spark.operators.graphstats import pagerank
    from ummon_spark.pipeline import build_graph, materialize

    from conftest import REPO, SF_SMOKE

    sys.path.insert(0, f"{REPO}/jobs")
    import analytics_job

    g = build_graph(load_spans(spark, SF_SMOKE), persist=True)
    gdir = str(tmp_path / "graph")
    materialize(g, gdir)
    out = str(tmp_path / "analytics")
    summary = analytics_job.main(["--graph", gdir, "--output", out,
                                  "--pagerank-iters", "3"])
    assert set(summary["timings"]) == {
        "degree", "pagerank", "triangles", "predicted_links"
    }
    got = sorted(
        map(tuple, spark.read.parquet(f"{out}/pagerank").collect())
    )
    nodes = spark.read.parquet(f"{gdir}/nodes")
    edges = spark.read.parquet(f"{gdir}/edges")
    assert got == sorted(map(tuple, pagerank(nodes, edges, n_iters=3).collect()))
    assert spark.read.parquet(f"{out}/predicted_links").count() == 100
    assert spark.read.parquet(f"{out}/triangles").count() > 0


def test_knn_graph_exact_and_guard(spark):
    """Exact kNN graph on a hand-built geometry: colinear vectors are
    each other's top neighbor regardless of magnitude (cosine, not
    dot); the quadratic guard raises above max_exact."""
    import pytest

    from ummon_spark.datapipe.similarity import knn_graph

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [10.0, 0.0, 0.0]),    # colinear with 0: cosine 1.0
        (2, [0.0, 1.0, 0.1]),
        (3, [0.0, 10.0, 0.9]),    # near-colinear with 2
        (4, [-1.0, 0.0, 0.0]),    # anti-parallel to 0/1
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["src"], r["rank"]): r["nbr"]
        for r in knn_graph(embs, k=2).collect()
    }
    assert got[(0, 1)] == 1 and got[(1, 1)] == 0   # cosine beats magnitude
    assert got[(2, 1)] == 3 and got[(3, 1)] == 2
    assert got[(4, 2)] == 4 or (4, 1) in got        # 4 ranks others last
    # anti-parallel vector is everyone's WORST choice, never rank 1
    assert all(got[(s, 1)] != 4 for s in (0, 1, 2, 3))
    with pytest.raises(ValueError, match="quadratic"):
        knn_graph(embs, k=2, max_exact=3)


def test_knn_graph_approx_finds_planted_duplicates(spark):
    """The banded-LSH approximate path always buckets exact duplicates
    together (cosine 1.0 -> identical sign bits), so planted copies are
    each other's top-1 even when random-vector recall is low."""
    import hashlib

    from ummon_spark.datapipe.similarity import knn_graph

    def vec(seed, dim=16):
        h = hashlib.md5(f"knn::{seed}".encode()).digest()
        return [((h[i % 16] + 7 * i * seed) % 200 - 100) / 100.0 for i in range(dim)]

    rows = [(i, vec(i)) for i in range(40)]
    rows += [(100 + i, vec(i)) for i in range(5)]  # exact copies of 0..4
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top1 = {
        r["src"]: r["nbr"]
        for r in knn_graph(embs, k=1, exact=False, n_bands=4,
                           bits_per_band=8).collect()
    }
    for i in range(5):
        assert top1.get(i) == 100 + i
        assert top1.get(100 + i) == i


def test_hll_estimate_accuracy(spark):
    """HLL at p=10 has ~3.3% std error; assert within 10% at three
    scales (the smallest goes through the linear-counting branch)."""
    from ummon_spark.datapipe.sketches import hll_estimate, hll_registers

    for n in (100, 5_000, 80_000):
        df = spark.range(n).selectExpr("concat('v', id) AS v")
        est = hll_estimate(hll_registers(df, "v").collect())
        assert abs(est - n) / n < 0.10, (n, est)


def test_hll_registers_dedupe_null_and_union(spark):
    """Registers ignore nulls, are insensitive to duplication, and the
    union sketch equals the pairwise register MAX of the part sketches
    (the mergeability that makes HLL shuffle-free to combine)."""
    from ummon_spark.datapipe.sketches import hll_registers

    a = spark.range(500).selectExpr("concat('a', id) AS v")
    b = spark.range(300).selectExpr("concat('b', id) AS v")
    dup = a.union(a).union(spark.createDataFrame([(None,)], "v string"))
    assert sorted(map(tuple, hll_registers(dup, "v").collect())) == sorted(
        map(tuple, hll_registers(a, "v").collect())
    )
    both = sorted(map(tuple, hll_registers(a.union(b), "v").collect()))
    ra = dict(map(tuple, hll_registers(a, "v").collect()))
    rb = dict(map(tuple, hll_registers(b, "v").collect()))
    merged = sorted(
        (k, max(ra.get(k, 0), rb.get(k, 0))) for k in set(ra) | set(rb)
    )
    assert both == merged
