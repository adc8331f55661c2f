"""Incremental indexing + path enumeration tests.

Key property (mirrors the reference's INSERT OR REPLACE invariant):
incremental(prune + rebuild changed + merge) == full rebuild, bit for
bit, including shared media nodes and placeholder re-derivation.
Path enumeration mirrors the reference's chain/diamond/depth-cutoff
tests (knowledge_graph.rs:858-945, :1238-1344).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ummon_spark.corpus import load_spans, spanify
from ummon_spark.incremental import incremental_update, prune
from ummon_spark.operators.traversal import enumerate_paths
from ummon_spark.pipeline import build_graph

from conftest import SF_SMOKE


def _flat(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


NODE_COLS = ("id", "name", "entity_type", "doc_id", "containing_entity")
EDGE_COLS = ("id", "subj", "pred", "obj")


def test_incremental_equals_full_rebuild(spark):
    spans = load_spans(spark, SF_SMOKE).filter(F.expr("try_cast(doc_id AS INT)") < 60)
    # v2 corpus: docs 0-49 unchanged, docs 50-59 modified (text mutated
    # by dropping their last span), plus new docs 60-64
    changed_old = spans.filter(F.expr("try_cast(doc_id AS INT)") >= 50)
    changed_new = changed_old.select(
        "doc_id", F.slice("spans", 1, F.size("spans") - 1).alias("spans")
    )
    new_docs = (
        load_spans(spark, SF_SMOKE)
        .filter(
            (F.expr("try_cast(doc_id AS INT)") >= 60) & (F.expr("try_cast(doc_id AS INT)") < 65)
        )
        .select(F.concat(F.lit("new_"), "doc_id").alias("doc_id"), "spans")
    )
    changed = changed_new.unionByName(new_docs)
    v2_full_spans = (
        spans.filter(F.expr("try_cast(doc_id AS INT)") < 50)
        .unionByName(changed)
    )

    old_graph = build_graph(spans, persist=True)
    inc = incremental_update(old_graph, changed, persist=True)
    full = build_graph(v2_full_spans, persist=True)

    assert _flat(inc.nodes, NODE_COLS) == _flat(full.nodes, NODE_COLS)
    assert _flat(inc.edges, EDGE_COLS) == _flat(full.edges, EDGE_COLS)


def test_prune_drops_doc_rows_and_edges(spark):
    spans = load_spans(spark, SF_SMOKE).filter(F.expr("try_cast(doc_id AS INT)") < 20)
    g = build_graph(spans, persist=False)
    mods = spark.createDataFrame([("7",)], "doc_id string")
    kept_nodes, kept_edges = prune(g.nodes, g.edges, mods)
    assert kept_nodes.filter(F.col("doc_id") == "7").count() == 0
    assert kept_edges.filter(F.col("src_partition") == "7").count() == 0
    # other docs untouched
    assert kept_edges.filter(F.col("src_partition") == "8").count() > 0


# --- path enumeration ------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(f"{a}->{b}", a, "calls", b, 1.0) for a, b in pairs],
        "id string, subj string, pred string, obj string, weight double",
    )


def test_paths_chain(spark):
    e = _edges(spark, [("A", "B"), ("B", "C")])
    paths = {tuple(r["path"]) for r in enumerate_paths(e, "A", "C", 3).collect()}
    assert paths == {("A", "B", "C")}
    # depth cutoff: no path within 1 hop (knowledge_graph.rs:858-945)
    assert enumerate_paths(e, "A", "C", 1).count() == 0


def test_paths_diamond_two_paths(spark):
    e = _edges(spark, [("A", "B"), ("A", "D"), ("B", "C"), ("D", "C")])
    paths = {tuple(r["path"]) for r in enumerate_paths(e, "A", "C", 3).collect()}
    assert paths == {("A", "B", "C"), ("A", "D", "C")}


def test_paths_cycle_safe(spark):
    e = _edges(spark, [("A", "B"), ("B", "A"), ("B", "C")])
    out = enumerate_paths(e, "A", None, 5)
    paths = {tuple(r["path"]) for r in out.collect()}
    assert ("A", "B", "C") in paths
    assert all(len(set(p)) == len(p) for p in paths)  # simple paths only
