"""spark-submit entry point: full KG construction run.

  spark-submit --py-files dist/ummon_spark.zip jobs/build_graph_job.py \
      --input <documents parquet/iceberg path or sf dir> \
      --output <graph output dir> \
      [--checkpoints <dir>] [--canonicalize] [--replicate N]

Runs read -> spanify -> parse -> nodes/edges -> [canonicalize] ->
materialize partitioned tables, with per-stage checkpoints when
--checkpoints is given (a killed run resumes there). On a cluster the
same script runs unchanged at N and 4N executors — executor count
comes from spark-submit conf, not code.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--canonicalize", action="store_true")
    ap.add_argument("--replicate", type=int, default=1)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("ummon_spark_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from ummon_spark.pipeline import build_graph, materialize

    t0 = time.time()
    if args.checkpoints:
        from ummon_spark.checkpoint import run_pipeline_checkpointed

        cp = run_pipeline_checkpointed(
            spark, args.input, args.checkpoints, canonicalize=args.canonicalize
        )
        edges = cp.results["edges"].df
        n_triples = cp.results["edges"].row_count
        stages = {s: ("skipped" if r.skipped else "ran") for s, r in cp.results.items()}
    else:
        from ummon_spark.corpus import load_documents, spanify

        # a small input parquet is one split — repartition FIRST so
        # spanify/replication/parse run at full parallelism instead of
        # serializing input prep in one task; the tiny replication
        # factor table broadcasts (a plain crossJoin would shuffle the
        # document table against it)
        docs = load_documents(spark, args.input).repartition(
            spark.sparkContext.defaultParallelism * 4
        )
        spans = spanify(docs)
        if args.replicate > 1:
            reps = spark.range(args.replicate).select(
                F.col("id").cast("string").alias("_rep")
            )
            spans = spans.crossJoin(F.broadcast(reps)).select(
                F.concat("doc_id", F.lit("#"), "_rep").alias("doc_id"), "spans"
            )
        g = build_graph(spans, persist=True)
        materialize(g, args.output)
        edges = spark.read.parquet(f"{args.output}/edges")
        n_triples = edges.count()
        stages = {"pipeline": "ran"}
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "n_triples": n_triples,
                "elapsed_sec": round(elapsed, 2),
                "triples_per_sec": round(n_triples / elapsed, 1),
                "stages": stages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
