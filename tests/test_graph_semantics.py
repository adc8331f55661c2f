"""Unit tests pinning the reference's graph semantics on tiny fixtures
(mirrors the reference's inline test modules — SURVEY.md §5):

* duplicate node id -> LAST wins (knowledge_graph.rs:1000-1047)
* dangling edge target -> placeholder node, EntityType::Function
  (knowledge_graph.rs:1049-1090, :380-395)
* edge with missing SOURCE is dropped (knowledge_graph.rs:375)
* deterministic edge id "{subj}->{obj}::{pred}" and first-wins dedupe
  (relationship.rs:89-105, :128-156)
* parse stage preserves span order and is a pure function of the span
  array (BASELINE.json per-row invariant)
* fast-path parser == pandas-UDF parser on the synthetic corpus
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ummon_spark.corpus import synthesize
from ummon_spark.operators.parse import explode_spans, parse_mentions, parse_mentions_pandas
from ummon_spark.pipeline import build_graph
from ummon_spark.schemas import DOCUMENTS


def make_docs(spark, rows):
    return spark.createDataFrame(rows, schema=DOCUMENTS)


@pytest.fixture(scope="module")
def tiny_graph(spark):
    # doc A defines f twice (params differ) and calls g.h plus a bare call;
    # doc B defines class C(Sup) and a function C (so inherits survives),
    # imports lib.x, and shows an image.
    rows = [
        (
            "A",
            [
                ("def", "f(x)", "", 0),
                ("def", "f(y)", "", 5),
                ("def", "h(q)", "", 8),
                ("call", "g.h", "", 10),
                ("call", "bare", "", 14),
            ],
        ),
        (
            "B",
            [
                ("class", "C(Sup)", "", 0),
                ("def", "C()", "", 7),
                ("import", "lib.x", "", 12),
                ("image", "", "img_zed", 18),
            ],
        ),
    ]
    g = build_graph(make_docs(spark, rows), persist=False)
    return g


def test_last_wins_dedupe(tiny_graph):
    nodes = {r["id"]: r for r in tiny_graph.nodes.collect()}
    # A::f defined twice -> one node, detail from the LAST definition
    assert nodes["A::f"]["detail"] == "y"


def test_placeholder_function_type(tiny_graph):
    nodes = {r["id"]: r for r in tiny_graph.nodes.collect()}
    # calls edge target g.h doesn't exist -> placeholder typed Function
    assert nodes["g.h"]["entity_type"] == "Function"
    assert nodes["Sup"]["entity_type"] == "Function"
    # real nodes preserved
    assert nodes["type::B::C"]["entity_type"] == "Class"
    assert nodes["media::img_zed"]["entity_type"] == "Media"


def test_source_exists_check(tiny_graph):
    edges = {(r["subj"], r["pred"], r["obj"]) for r in tiny_graph.edges.collect()}
    # A defines h, call g.h -> source A::h exists -> calls edge kept
    assert ("A::h", "calls", "g.h") in edges
    # inherits from class C survives only because function B::C exists
    assert ("B::C", "inherits", "Sup") in edges
    # bare call -> references edge from the module
    assert ("A", "references", "bare") in edges
    assert ("B", "depicts", "media::img_zed") in edges
    assert ("B", "imports", "lib.x") in edges


def test_source_missing_dropped(spark):
    rows = [("D", [("call", "q.z", "", 0)])]  # no def z in D
    g = build_graph(make_docs(spark, rows), persist=False)
    edges = [(r["pred"]) for r in g.edges.collect()]
    assert "calls" not in edges


def test_edge_id_deterministic_and_first_wins(tiny_graph):
    ids = [r["id"] for r in tiny_graph.edges.collect()]
    assert "A::h->g.h::calls" in ids
    assert len(ids) == len(set(ids))  # dedupe by id


def test_edge_metadata_provenance(tiny_graph):
    """metadata = {src_doc, src_span} of the first-wins mention
    (relationship.rs:61-69 per-edge HashMap, populated with lineage)."""
    edges = {r["id"]: r for r in tiny_graph.edges.collect()}
    call = edges["A::h->g.h::calls"]
    assert call["metadata"] == {"src_doc": "A", "src_span": "3"}
    assert call["src_partition"] == "A"


def test_edge_id_collision_first_wins(spark):
    """DISTINCT triples whose ids collide ('->' in names makes the
    concat non-injective) collapse to ONE edge, first wins by the
    winning mention's (doc, span) — the reference DB's collapse-by-id
    (INSERT OR REPLACE keyed on id, relationship.rs:89-105)."""
    from ummon_spark.operators.edges import build_edges

    checked = spark.createDataFrame(
        [
            # both ids concat to "m->x->y::references"
            ("m", "references", "x->y", "m", 7),
            ("m->x", "references", "y", "m", 3),
        ],
        "subj string, pred string, obj string, doc_id string, span_idx long",
    )
    out = build_edges(None, None, checked=checked).collect()
    assert len(out) == 1
    e = out[0]
    assert e["id"] == "m->x->y::references"
    # first wins: span 3 row
    assert (e["subj"], e["obj"]) == ("m->x", "y")
    assert e["metadata"]["src_span"] == "3"


def test_span_order_preserved(spark):
    docs = synthesize(spark, 50, seed=7)
    flat = explode_spans(docs).collect()
    by_doc = {}
    for r in flat:
        by_doc.setdefault(r["doc_id"], []).append(r)
    orig = {d: s for d, s in docs.collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["span_idx"])
        got = [(r["kind"], r["text"], r["media_ref"], r["offset"]) for r in rows]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in orig[doc_id]]
        assert got == want


def test_parser_parity_fast_vs_pandas(spark):
    docs = synthesize(spark, 100, seed=11)
    fast = sorted(tuple(r) for r in parse_mentions(docs).collect())
    ref = sorted(tuple(r) for r in parse_mentions_pandas(docs).collect())
    assert fast == ref


def test_empty_and_weird_content(spark):
    rows = [
        ("E1", []),
        ("E2", [("text", "just filler", "", 0)]),
        ("E3", [("def", "", "", 0)]),
    ]
    g = build_graph(make_docs(spark, rows), persist=False)
    # never throws; every doc gets a Module node even with no mentions
    types = {(r["doc_id"], r["entity_type"]) for r in g.nodes.collect()}
    assert ("E1", "Module") in types
    assert ("E2", "Module") in types


def test_edge_dedupe_equals_two_level_reference_model(spark):
    """Property: the single id-keyed min_by dedupe (edges.build_edges)
    equals the two-level reference rule — per-triple first-wins by
    (doc, span), then first-wins across id-colliding triples — on
    randomized candidate sets dense in '->'/'::' separator names (the
    id concat's adversarial domain). The oracle keeps the two-level SQL
    formulation; this pins the equivalence the Spark side relies on."""
    import random

    from ummon_spark.operators.edges import build_edges

    frags = ["a", "b", "ab", "a->b", "x::y", "->", "::", "m->", "::p", "q"]
    preds = ["defines", "calls", "references", "imports", "contains"]
    rng = random.Random(1234)
    rows = []
    for _ in range(400):
        subj = "".join(rng.choices(frags, k=rng.randint(1, 3)))
        obj = "".join(rng.choices(frags, k=rng.randint(1, 3)))
        rows.append(
            (
                subj,
                rng.choice(preds),
                obj,
                str(rng.randint(0, 5)),
                rng.randint(0, 9),
            )
        )

    # reference model: two-level dedupe
    by_triple = {}
    for subj, pred, obj, doc, span in rows:
        key = (subj, pred, obj)
        w = (doc, span)
        if key not in by_triple or w < by_triple[key]:
            by_triple[key] = w
    by_id = {}
    for (subj, pred, obj), (doc, span) in by_triple.items():
        eid = f"{subj}->{obj}::{pred}"
        cand = ((doc, span, subj, pred, obj), (subj, pred, obj, doc, span))
        if eid not in by_id or cand[0] < by_id[eid][0]:
            by_id[eid] = cand
    expected = {
        eid: (subj, pred, obj, doc, str(span))
        for eid, (_, (subj, pred, obj, doc, span)) in by_id.items()
    }

    checked = spark.createDataFrame(
        rows, "subj string, pred string, obj string, doc_id string, span_idx long"
    )
    got = {
        r["id"]: (
            r["subj"],
            r["pred"],
            r["obj"],
            r["metadata"]["src_doc"],
            r["metadata"]["src_span"],
        )
        for r in build_edges(None, None, checked=checked).collect()
    }
    assert got == expected
