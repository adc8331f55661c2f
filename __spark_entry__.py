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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**gate.QUERIES, **gate_datapipe.QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**gate.ORACLES, **gate_datapipe.ORACLES}
