"""spark-submit entry point: graph analytics over a materialized KG.

  spark-submit --py-files dist/ummon_spark.zip jobs/analytics_job.py \
      --graph <dir written by build_graph_job / pipeline.materialize> \
      --output <dir> [--pagerank-iters N] [--link-topk K]

Reads the partitioned nodes/edges tables and writes four analytics
tables: degree, pagerank (integer-exact), triangles (per-node counts)
and predicted_links (common-neighbor/Jaccard top-k). Same script at N
and 4N executors — parallelism comes from spark-submit conf, not code.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True, help="dir with nodes/ and edges/")
    ap.add_argument("--output", required=True)
    ap.add_argument("--pagerank-iters", type=int, default=5)
    ap.add_argument("--link-topk", type=int, default=100)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ummon_spark_analytics").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ummon_spark.operators.graphstats import (
        common_neighbors_topk,
        pagerank,
        triangle_counts,
    )
    from ummon_spark.operators.traversal import degree

    nodes = spark.read.parquet(f"{args.graph}/nodes")
    edges = spark.read.parquet(f"{args.graph}/edges")

    timings: dict[str, float] = {}

    def run(name, df):
        t = time.time()
        df.write.mode("overwrite").parquet(f"{args.output}/{name}")
        timings[name] = round(time.time() - t, 3)

    run("degree", degree(edges))
    run("pagerank", pagerank(nodes, edges, n_iters=args.pagerank_iters))
    run("triangles", triangle_counts(edges))
    run("predicted_links", common_neighbors_topk(edges, k=args.link_topk))

    summary = {
        "job": "analytics",
        "graph": args.graph,
        "output": args.output,
        "timings": timings,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
