"""Connected-components + canonicalization tests: correctness vs a
driver-side union-find on random graphs, chain/star/skew shapes
(mirroring the reference's 1000-node chain scale smoke,
knowledge_graph.rs:1436-1487), and end-to-end canonicalization
semantics on a tiny corpus."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ummon_spark.operators.cc import connected_components
from ummon_spark.operators.linking import (
    canonical_mapping,
    canonicalize_edges,
    canonicalize_nodes,
    link_keys,
)
from ummon_spark.pipeline import build_graph
from ummon_spark.schemas import DOCUMENTS


def uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical = min id per component
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def run_cc(spark, pairs):
    df = spark.createDataFrame(pairs, "u string, v string")
    res = connected_components(df)
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    assert res.converged, "CC did not converge"
    return got, res


@pytest.mark.parametrize(
    "pairs",
    [
        [("a", "b")],
        [("a", "b"), ("b", "c"), ("x", "y")],
        [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(200)],  # long chain
        [("hub", f"s{i:03d}") for i in range(150)],  # star/hub skew
    ],
    ids=["single", "two_comps", "chain", "star"],
)
def test_cc_shapes(spark, pairs):
    got, _ = run_cc(spark, pairs)
    want = uf_components(pairs)
    assert got == want


def test_cc_random_vs_union_find(spark):
    rng = random.Random(42)
    nodes = [f"v{i:03d}" for i in range(120)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    pairs = [(u, v) for u, v in pairs if u != v]
    got, res = run_cc(spark, pairs)
    want = uf_components(pairs)
    assert got == want
    assert res.rounds <= 10


# --- canonicalization over the KG ------------------------------------------


@pytest.fixture(scope="module")
def canon_graph(spark):
    rows = [
        # doc 1 defines slow, calls hash.slow (fqn) and bare ref slow
        ("1", [("def", "slow(x)", "", 0), ("call", "hash.slow", "", 1),
                ("call", "slow", "", 2), ("import", "lib.slow", "", 3),
                ("image", "", "img_slow", 4)]),
        # doc 2 references slow too; its own def keeps it doc-scoped
        ("2", [("def", "slow(y)", "", 0), ("call", "slow", "", 1)]),
    ]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS)
    g = build_graph(docs, persist=False)
    canon = canonical_mapping(g.nodes)
    return g, canon


def test_link_keys_normalization(canon_graph):
    g, _ = canon_graph
    keys = {r["id"]: r["key"] for r in link_keys(g.nodes).collect()}
    assert keys["hash.slow"] == "slow"
    assert keys["lib.slow"] == "slow"
    assert keys["slow"] == "slow"
    assert keys["media::img_slow"] == "slow"
    # doc-scoped real functions are NOT linkable
    assert "1::slow" not in keys


def test_canonical_mapping_merges_aliases(canon_graph):
    g, canon = canon_graph
    m = {r["id"]: r["canonical_id"] for r in canon.mapping.collect()}
    targets = {m["hash.slow"], m["lib.slow"], m["slow"], m["media::img_slow"]}
    assert len(targets) == 1  # all surface forms -> one canonical id
    assert targets == {"hash.slow"}  # lexicographic min member


def test_canonicalize_edges_merges_and_reweights(canon_graph):
    g, canon = canon_graph
    ce = canonicalize_edges(g.edges, canon.mapping)
    rows = {(r["subj"], r["pred"], r["obj"]): r["weight"] for r in ce.collect()}
    # both docs' bare "references slow" edges now point at the canonical id
    assert rows[("1", "references", "hash.slow")] == 1.0
    assert rows[("2", "references", "hash.slow")] == 1.0
    # depicts + imports collapse onto the same canonical target
    assert ("1", "depicts", "hash.slow") in rows
    assert ("1", "imports", "hash.slow") in rows
    # doc-scoped defines edges unchanged
    assert ("1", "defines", "1::slow") in rows


def test_canonicalize_nodes_keeps_representative(canon_graph):
    g, canon = canon_graph
    cn = canonicalize_nodes(g.nodes, canon.mapping)
    ids = {r["id"] for r in cn.collect()}
    assert "hash.slow" in ids
    assert "lib.slow" not in ids and "media::img_slow" not in ids
    assert "1::slow" in ids and "2::slow" in ids  # doc-scoped survive


# --- fuzzy linking (MinHash-LSH blocking + batched scorer) ------------------


def test_fuzzy_link_pairs_finds_near_miss_aliases(spark):
    from ummon_spark.operators.linking import fuzzy_link_pairs, score_link_pairs

    keys = spark.createDataFrame(
        [("a", "authentication"), ("b", "authentification"), ("c", "zebra"),
         ("d", "authentication")],
        "id string, key string",
    )
    pairs = {(r["u"], r["v"]): r["score"] for r in fuzzy_link_pairs(keys, 0.5).collect()}
    # near-miss aliases pair up with a high trigram score
    assert ("authentication", "authentification") in pairs
    assert pairs[("authentication", "authentification")] > 0.5
    # unrelated keys never pair
    assert not any("zebra" in p for p in pairs)


def test_score_link_pairs_batched(spark):
    from ummon_spark.operators.linking import score_link_pairs

    pairs = spark.createDataFrame(
        [("abcdef", "abcdef"), ("abcdef", "zzzzzz")], "u string, v string"
    )
    scores = {(r["u"], r["v"]): r["score"] for r in score_link_pairs(pairs).collect()}
    assert scores[("abcdef", "abcdef")] == 1.0
    assert scores[("abcdef", "zzzzzz")] == 0.0


def test_canonicalize_nodes_broadcast_guard(spark, canon_graph, monkeypatch):
    """Above MAX_BROADCAST_MAPPING_ROWS the broadcast hint is dropped
    (forcing a huge mapping into executors would OOM); results are
    identical either way."""
    import ummon_spark.operators.linking as linking

    g, canon = canon_graph
    hinted = canonicalize_nodes(g.nodes, canon.mapping, force_broadcast=True)
    monkeypatch.setattr(linking, "MAX_BROADCAST_MAPPING_ROWS", 0)
    unhinted = canonicalize_nodes(g.nodes, canon.mapping)  # count > 0 -> no hint
    plan = unhinted._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in plan.lower()
    hinted_plan = hinted._jdf.queryExecution().analyzed().toString()
    assert "broadcast" in hinted_plan.lower()
    assert sorted(map(tuple, hinted.collect())) == sorted(map(tuple, unhinted.collect()))


def test_score_link_pairs_vectorized_matches_trigram_semantics(spark):
    """Default (JVM expression) path reproduces set-based trigram
    Jaccard exactly; an injected batch scorer still runs via the Arrow
    stage with the same contract."""
    from ummon_spark.operators.linking import score_link_pairs

    def tri(s):
        return {s[i : i + 3] for i in range(max(len(s) - 2, 1))}

    pairs = [("slow", "slows"), ("abc", "xyz"), ("a", "a"), ("hash", "hashing")]
    df = spark.createDataFrame(pairs, "u string, v string")
    got = {(r["u"], r["v"]): r["score"] for r in score_link_pairs(df).collect()}
    for u, v in pairs:
        a, b = tri(u), tri(v)
        expected = len(a & b) / len(a | b) if a | b else 1.0
        assert got[(u, v)] == pytest.approx(expected, abs=1e-12)

    def injected(pdf):
        pdf = pdf.copy()
        pdf["score"] = 0.25
        return pdf

    inj = score_link_pairs(df, scorer=injected).collect()
    assert all(r["score"] == 0.25 for r in inj)


def test_canonicalize_shares_one_count_job(spark, canon_graph):
    """Passing the Canonicalization object to both rewrites runs exactly
    ONE count job for the broadcast size decision (VERDICT r2 #5: the
    mapping used to be re-counted — and the CC fixpoint re-run — once
    per canonicalize call)."""
    g, _ = canon_graph
    canon = canonical_mapping(g.nodes)
    counts = {"n": 0}
    real_count = type(canon.mapping).count

    def counting(self):
        counts["n"] += 1
        return real_count(self)

    import unittest.mock as mock

    with mock.patch.object(type(canon.mapping), "count", counting):
        canonicalize_edges(g.edges, canon)
        canonicalize_nodes(g.nodes, canon)
    assert counts["n"] == 1
    canon.mapping.unpersist()


def test_link_keys_with_alias_dictionary(spark, canon_graph):
    """North-star broadcast alias dictionary: curated (surface,
    canonical_key) rows override the rule key; unmatched keys keep the
    rule result; the dictionary side is broadcast (no node shuffle)."""
    g, _ = canon_graph
    dic = spark.createDataFrame(
        [("slow", "treacle")], "surface string, canonical_key string"
    )
    keys = {r["id"]: r["key"] for r in link_keys(g.nodes, dic).collect()}
    assert keys["hash.slow"] == "treacle"
    assert keys["media::img_slow"] == "treacle"
    plan = link_keys(g.nodes, dic)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
