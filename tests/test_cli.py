"""CLI surface tests: `ummon_spark index|query` mirror the reference's
command surface (assist needs an LLM; covered by test_llm_assist's
injected-scorer tests at the library level)."""

from __future__ import annotations

import json

from conftest import SF_SMOKE

from ummon_spark.cli import main


def test_cli_index_then_query(spark, tmp_path, capsys):
    graph = str(tmp_path / "graph")
    assert main(["index", SF_SMOKE, "--output", graph]) == 0
    out = capsys.readouterr().out
    assert "indexed:" in out and "triples" in out

    assert (
        main(
            [
                "query",
                "select functions where name like 'k%'",
                "--graph",
                graph,
                "--no-llm",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "(Limited to 20 results" in out  # limit footer, reference default

    assert (
        main(
            [
                "query",
                "classes containing functions",
                "--graph",
                graph,
                "--no-llm",
                "--format",
                "json",
            ]
        )
        == 0
    )
    objs = json.loads(capsys.readouterr().out)
    assert objs and all(o["type"] == "Class" for o in objs)


def test_cli_dead_flags_accepted(spark, tmp_path, capsys):
    graph = str(tmp_path / "graph")
    main(["index", SF_SMOKE, "--output", graph])
    capsys.readouterr()
    rc = main(
        [
            "query",
            "select modules",
            "--graph",
            graph,
            "--no-llm",
            "--type-filter",
            "function",
            "--exact",
        ]
    )
    captured = capsys.readouterr()
    assert rc == 0
    assert "accepted but unused" in captured.err  # reference-parity quirk noted


def test_extra_headers_json_and_legacy(capsys):
    from ummon_spark.cli import _parse_extra_headers

    # JSON form: escape-safe, values may contain '|' and ':'
    got = _parse_extra_headers('{"X-One": "a|b:c", "X-Two": "2"}')
    assert got == {"X-One": "a|b:c", "X-Two": "2"}
    # legacy pipe form still works
    assert _parse_extra_headers("X-A: 1|X-B: two") == {"X-A": "1", "X-B": "two"}
    # malformed legacy pair warns instead of silently dropping
    assert _parse_extra_headers("nocolon|X-C: 3") == {"X-C": "3"}
    assert "malformed header pair" in capsys.readouterr().err
    # unparseable JSON warns and applies nothing
    assert _parse_extra_headers("{broken") == {}
    assert "does not parse" in capsys.readouterr().err
    assert _parse_extra_headers("  ") == {}


def test_api_version_env_warns(monkeypatch, capsys):
    from ummon_spark import cli

    monkeypatch.setenv("UMMON_SPARK_API_VERSION", "2024-01-01")
    monkeypatch.setenv("UMMON_SPARK_EXTRA_HEADERS", "")
    cli._llm_callable("openai", None)
    assert "no longer consumed" in capsys.readouterr().err
