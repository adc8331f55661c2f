"""Skew salting, domain extraction, and NL translation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ummon_spark.domain import (
    chunk_documents,
    extract_domain_model,
    stub_concepts,
)
from ummon_spark.nl import TranslationError, translate
from ummon_spark.operators.skew import (
    detect_hot_keys,
    salted_hot_count,
    salted_join,
)


# --- skew ------------------------------------------------------------------


@pytest.fixture(scope="module")
def zipf_df(spark):
    # hub key 'the' with 5000 rows, 50 cold keys with 10 rows each
    hub = spark.range(5000).select(
        F.lit("the").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("w"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hub.unionByName(cold)


def test_detect_hot_keys(zipf_df):
    hot = detect_hot_keys(zipf_df, "k", min_count=1000).collect()
    assert [r["hot_key"] for r in hot] == ["the"]


def test_salted_join_equals_plain_join(spark, zipf_df):
    dim = spark.createDataFrame(
        [("the", "HUB"), ("w1", "C1"), ("w2", "C2")], "k string, label string"
    )
    hot = detect_hot_keys(zipf_df, "k", min_count=1000)
    plain = zipf_df.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(zipf_df, dim, "k", hot).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_equals_plain(zipf_df):
    plain = dict((r["k"], r["count"]) for r in zipf_df.groupBy("k").count().collect())
    salted = dict((r["k"], r["n"]) for r in salted_hot_count(zipf_df, "k").collect())
    assert plain == salted


# --- domain extraction -----------------------------------------------------


def test_chunking_boundaries(spark):
    # mirrors the reference's 10/2 overlap math (domain_extraction.rs:330-353)
    df = spark.createDataFrame([(1, "a" * 150)], "doc_id long, text string")
    chunks = chunk_documents(df, window=100, overlap=20).collect()
    assert [c["chunk_idx"] for c in chunks] == [0, 1]
    assert chunks[0]["chunk"] == "a" * 100
    assert chunks[1]["chunk"] == "a" * 70  # starts at 80, runs to 150
    # short content -> one chunk; tiny content -> size-gated away
    one = chunk_documents(
        spark.createDataFrame([(2, "b" * 120)], "doc_id long, text string"),
        window=1000,
        overlap=20,
    ).collect()
    assert len(one) == 1 and one[0]["chunk"] == "b" * 120
    gated = chunk_documents(
        spark.createDataFrame([(3, "tiny")], "doc_id long, text string")
    ).collect()
    assert gated == []


def test_stub_concepts_and_merge(spark):
    docs = spark.createDataFrame(
        [
            (1, (" ".join(["customer"] * 3 + ["short", "words"] + ["window"] * 2) + " ") * 3),
        ],
        "doc_id long, text string",
    )
    names = {r["name"] for r in stub_concepts(docs).collect()}
    assert names == {"customer", "window"}  # len>=6 and count>=2


def test_stub_concepts_whole_text_not_chunked(spark):
    # a >10kB doc spans multiple overlapping chunks; the stub must count
    # over the whole text (one count per occurrence), not double-count
    # tokens that land in the 500-char overlap or split at boundaries
    text = " ".join(f"tok{i:06d}" for i in range(2000))  # ~20 kB, all unique
    text += " conceptword conceptword"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = stub_concepts(docs).collect()
    assert {r["name"] for r in rows} == {"conceptword"}


def test_domain_model_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, ("customer " * 3 + "billing " * 2) * 8)], "doc_id long, text string"
    )
    nodes = spark.createDataFrame(
        [
            ("1::customer", "customer", "Function", "1", "1", "", ""),
            ("1::billing", "billing", "Function", "1", "1", "", ""),
        ],
        "id string, name string, entity_type string, doc_id string, "
        "containing_entity string, documentation string, detail string",
    )
    edges = spark.createDataFrame(
        [("e", "1::customer", "calls", "1::billing", 1.0)],
        "id string, subj string, pred string, obj string, weight double",
    )
    cnodes, cedges = extract_domain_model(docs, nodes, edges)
    assert {r["id"] for r in cnodes.collect()} == {"customer", "billing"}
    got = {(r["subj"], r["pred"], r["obj"]) for r in cedges.collect()}
    assert ("customer", "represented_by", "1::customer") in got
    # customer's entity reaches billing's entity in 1 hop -> relates_to
    assert ("customer", "relates_to", "billing") in got
    # reverse direction NOT inferred (outbound-only BFS)
    assert ("billing", "relates_to", "customer") not in got


# --- NL translation --------------------------------------------------------


def test_translate_valid():
    t = translate(
        "which functions call login?",
        llm=lambda p: "TRANSLATED_QUERY: functions calling functions where name = 'login'\nCONFIDENCE: 0.9",
    )
    assert t.confidence == 0.9
    assert t.query.startswith("functions calling")


def test_translate_invalid_query_rejected():
    with pytest.raises(TranslationError, match="failed to parse"):
        translate("x", llm=lambda p: "TRANSLATED_QUERY: select gibberish\nCONFIDENCE: 1.0")


def test_translate_missing_line_rejected():
    with pytest.raises(TranslationError, match="no TRANSLATED_QUERY"):
        translate("x", llm=lambda p: "I don't know")
