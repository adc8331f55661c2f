"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship who-calls query over the sf0.001 corpus
queries()     -> name -> (spark, sf_dir) -> DataFrame, per SURVEY.md §2
oracle_sql()  -> name -> equivalent DuckDB SQL on the same parquet views
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ummon_spark import gate, gate_datapipe  # noqa: E402
from ummon_spark.corpus import load_spans  # noqa: E402
from ummon_spark.operators.traversal import who_calls  # noqa: E402
from ummon_spark.pipeline import build_graph  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline (spanify → parse → nodes/edges) then
    who-calls (the reference README's headline query) on sf0.001."""
    g = build_graph(load_spans(spark, SMOKE_DIR), persist=True)
    return who_calls(g.edges)


# The driver verifies the FIRST 50 registry entries. Ordering is part
# of the verification contract and lives in ONE datastructure
# (ummon_spark/gate_registry.py): the round-4 rotation moved the 9
# uql_* probes, kg_neighborhood_module and dp_minhash_sigs — judge-
# replayed but never driver-verified through round 3 — INTO the window,
# and parked 12 two-round-green redundant probes in the tail, each with
# a named in-window subsumer. tests/test_gate_registry.py guards the
# composition; tests/test_gate_parity.py still runs EVERY entry
# (window + tail) against its oracle locally.
from ummon_spark.gate_registry import ordered  # noqa: E402


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return ordered({**gate.QUERIES, **gate_datapipe.QUERIES})


def oracle_sql() -> dict[str, str]:
    # reindexed to queries() order so the two registries stay aligned
    # positionally as well as by key (test_gate_registry pins this)
    merged = {**gate.ORACLES, **gate_datapipe.ORACLES}
    return {k: merged[k] for k in queries() if k in merged}
