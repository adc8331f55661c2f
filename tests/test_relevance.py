"""Relevance pipeline tests (mirrors reference relevance_agent.rs:306-369:
keyword fallback parsing; file aggregation = max-score)."""

from __future__ import annotations

from ummon_spark.relevance import (
    aggregate_files,
    expand_context,
    extract_keywords,
    rank_entities,
    seed_entities,
    suggest_relevant_files,
)


def test_keywords_json_llm():
    assert extract_keywords("x", llm=lambda p: '["auth", "login"]') == ["auth", "login"]


def test_keywords_line_fallback():
    resp = '```json\n[\n  "database connection",\n  "pooling",\n]\n```'
    assert extract_keywords("x", llm=lambda p: resp) == ["database connection", "pooling"]


def test_keywords_whitespace_fallback():
    assert extract_keywords("fix login bug", llm=lambda p: "not json at all") == [
        "fix",
        "login",
        "bug",
    ]
    assert extract_keywords("fix login bug") == ["fix", "login", "bug"]


def _fixture(spark):
    nodes = spark.createDataFrame(
        [
            ("f1::login", "login", "Function", "f1", "f1", "", ""),
            ("f1::helper", "helper", "Function", "f1", "f1", "", ""),
            ("f2::logout", "logout", "Function", "f2", "f2", "", ""),
            ("f1", "f1", "Module", "f1", "", "", ""),
            ("f2", "f2", "Module", "f2", "", "", ""),
        ],
        "id string, name string, entity_type string, doc_id string, "
        "containing_entity string, documentation string, detail string",
    )
    edges = spark.createDataFrame(
        [
            ("e1", "f1::login", "calls", "f1::helper", 1.0),
            ("e2", "f2", "contains", "f2::logout", 1.0),
        ],
        "id string, subj string, pred string, obj string, weight double",
    )
    return nodes, edges


def test_seed_scoring(spark):
    nodes, edges = _fixture(spark)
    seeds = {r["id"]: r["score"] for r in seed_entities(nodes, ["login"]).collect()}
    # name+anywhere: 3.0 for both login (name) and logout (contains 'log'? no —
    # 'login' not in 'logout'); module f1 doesn't contain 'login'
    assert seeds["f1::login"] == 3.0
    assert "f2::logout" not in seeds
    assert "f1::helper" not in seeds


def test_expansion_scores_inverse_depth(spark):
    nodes, edges = _fixture(spark)
    seeds = seed_entities(nodes, ["login"])
    cands = {r["id"]: r["prox"] for r in expand_context(seeds, edges).collect()}
    assert cands["f1::login"] == 3.0  # seed keeps R2 score
    assert cands["f1::helper"] == 3.0 * (1.0 / 2.0)  # depth 1 via calls


def test_file_aggregation_max(spark):
    nodes, edges = _fixture(spark)
    ranked = rank_entities(
        expand_context(seed_entities(nodes, ["login"]), edges), edges
    )
    files = aggregate_files(ranked, nodes).collect()
    assert files[0]["path"] == "f1"
    scores = {r["id"]: r["final_score"] for r in ranked.collect()}
    assert files[0]["relevance_score"] == max(
        scores["f1::login"], scores["f1::helper"]
    )
    assert files[0]["contributing_ids"] == sorted(["f1::login", "f1::helper"])


def test_end_to_end_top10(spark):
    nodes, edges = _fixture(spark)
    out = suggest_relevant_files(nodes, edges, "login")
    rows = out.collect()
    assert len(rows) <= 10
    assert rows[0]["path"] == "f1"
