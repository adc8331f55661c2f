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
