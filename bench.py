"""Benchmark harness: end-to-end KG construction throughput + headline queries.

Runs the full pipeline (spanify -> parse -> nodes/edges materialize) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "triples_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., ...}

`python bench.py --scaling` additionally runs the same job at two
parallelism levels (8 and 32 cores by default) in separate JVMs and
reports throughput at both plus scaling efficiency
(= (thr_hi/thr_lo)/(hi/lo)) — the in-sandbox evidence for the
N -> 4N executor scaling criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_bench(cores: int | None = None) -> dict:
    from ummon_spark.corpus import load_spans
    from ummon_spark.operators.traversal import (
        degree,
        entity_neighborhood,
        transitive_depends,
        who_calls,
    )
    from ummon_spark.pipeline import build_graph
    from ummon_spark.session import get_spark

    spark = get_spark("ummon_bench", cores=cores)
    actual_cores = spark.sparkContext.defaultParallelism

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # warm the JVM + parquet footer cache out of band
    spans = load_spans(spark, SF_DIR)
    n_docs = spans.count()

    t0 = time.perf_counter()
    g = build_graph(spans, persist=True)
    n_triples = timed("pipeline_build", lambda: g.edges.count())
    n_nodes = g.nodes.count()
    build_sec = time.perf_counter() - t0

    timed("q_who_calls", lambda: who_calls(g.edges).count())
    timed(
        "q_transitive_depends",
        lambda: transitive_depends(g.nodes, g.edges).count(),
    )
    timed(
        "q_neighborhood",
        lambda: entity_neighborhood(g.edges, "media::img_the").count(),
    )
    timed("q_degree", lambda: degree(g.edges).count())

    total_q = sum(v for k, v in timings.items() if k.startswith("q_"))
    result = {
        "metric": "triples_per_sec",
        "value": round(n_triples / build_sec, 1),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cores": actual_cores,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "n_nodes": n_nodes,
        "build_sec": round(build_sec, 3),
        "query_sec_total": round(total_q, 3),
    }
    g.unpersist()
    spark.stop()
    return result


def run_scaling(lo: int = 8, hi: int = 32) -> dict:
    """Same job, two parallelism levels, separate JVMs."""
    out = {}
    for cores in (lo, hi):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        proc = subprocess.run(
            [sys.executable, __file__, "--single"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
    thr_lo = out[lo]["value"]
    thr_hi = out[hi]["value"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "lo_cores": lo,
        "hi_cores": hi,
        "thr_lo": thr_lo,
        "thr_hi": thr_hi,
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
