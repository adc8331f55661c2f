"""LLM plumbing (provider shaping, retry/backoff — mirrors
llm_integration.rs:327-493 tests) + batch scoring + assist."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from ummon_spark.llm import (
    LLMConfig,
    LLMError,
    batch_score,
    parse_response,
    query_llm,
    shape_request,
)


def test_shape_openai():
    url, headers, body = shape_request("hi", LLMConfig(provider="openai", api_key="k"))
    assert url.endswith("/v1/chat/completions")
    assert headers["authorization"] == "Bearer k"
    assert json.loads(body)["messages"][0]["content"] == "hi"


def test_shape_anthropic():
    url, headers, body = shape_request(
        "hi", LLMConfig(provider="anthropic", api_key="k", model="m")
    )
    assert url.endswith("/v1/messages")
    assert headers["x-api-key"] == "k"
    assert json.loads(body)["model"] == "m"


def test_parse_per_provider():
    assert parse_response("openai", json.dumps({"choices": [{"message": {"content": "A"}}]})) == "A"
    assert parse_response("anthropic", json.dumps({"content": [{"text": "B"}]})) == "B"
    assert parse_response("ollama", json.dumps({"response": "C"})) == "C"


def test_retry_backoff_then_success():
    calls = []
    sleeps = []

    def transport(url, headers, body):
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("boom")
        return json.dumps({"choices": [{"message": {"content": "ok"}}]})

    out = query_llm("p", LLMConfig(), transport, sleep=sleeps.append)
    assert out == "ok"
    assert len(calls) == 3
    assert sleeps == [0.5, 1.0]  # 500ms * 2^k


def test_retry_exhaustion_raises():
    def transport(url, headers, body):
        raise ConnectionError("down")

    with pytest.raises(LLMError, match="after 3 attempts"):
        query_llm("p", LLMConfig(), transport, sleep=lambda s: None)


def test_batch_score_stage(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": pdf["v"], "score": pdf["v"] * 2.0})

    out = batch_score(df, scorer, "v long, score double")
    rows = {r["v"]: r["score"] for r in out.collect()}
    assert rows[7] == 14.0 and len(rows) == 100


def test_assist_end_to_end(spark):
    from ummon_spark.assist import assist, build_context

    nodes = spark.createDataFrame(
        [
            ("f1::login", "login", "Function", "f1", "f1", "", ""),
            ("f1", "f1", "Module", "f1", "", "", ""),
        ],
        "id string, name string, entity_type string, doc_id string, "
        "containing_entity string, documentation string, detail string",
    )
    edges = spark.createDataFrame(
        [], "id string, subj string, pred string, obj string, weight double"
    )
    ctx = build_context(nodes)
    assert "- login (f1)" in ctx
    prompts = []
    out = assist(nodes, edges, "login", llm=lambda p: prompts.append(p) or "do X")
    assert out["files"] == ["f1"]
    assert out["recommendation"] == "do X"
    assert "Relevant files: f1" in prompts[0]
