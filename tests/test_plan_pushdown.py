"""Executed-plan regression guards: the scan-pruning properties the
100 TB story depends on must survive refactors — partition pruning on
the pred-partitioned edge table, predicate pushdown for point lookups,
and single-scan shapes where we engineered them."""

from __future__ import annotations

from conftest import SF_SMOKE

from ummon_spark.corpus import load_spans
from ummon_spark.operators.traversal import (
    degree,
    entity_neighborhood,
    who_calls,
)
from ummon_spark.pipeline import build_graph, materialize


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_materialized_scan_properties(spark, tmp_path):
    g = build_graph(load_spans(spark, SF_SMOKE), persist=True)
    out = str(tmp_path / "graph")
    materialize(g, out)
    edges = spark.read.parquet(f"{out}/edges")

    # who_calls: the pred filter must hit the PARTITION index (pruned
    # scan — no data read outside pred=calls) and only the projected
    # columns reach the reader
    wc = _plan(who_calls(edges))
    assert "PartitionFilters" in wc and "calls" in wc
    assert "obj" in wc.split("ReadSchema")[-1]

    # neighborhood: ONE scan with the OR predicate pushed to parquet
    nb = _plan(entity_neighborhood(edges, "nope"))
    assert nb.count("FileScan") == 1
    assert "Or(EqualTo(subj,nope),EqualTo(obj,nope))" in nb.replace(" ", "")

    # degree: single exchange (one-pass agg), no join
    dg = _plan(degree(edges))
    assert dg.count("Exchange hashpartitioning") == 1
    assert "Join" not in dg
