"""spark-submit entry point: corpus curation run.

  spark-submit --py-files dist/ummon_spark.zip jobs/curate_job.py \
      --input <dir containing documents.parquet> --output <dir> \
      [--min-tokens N] [--per-stratum N]

Runs quality filter -> exact dedupe -> MinHash near-dedupe ->
stratified per-language cap, writes the kept documents as parquet and
prints the per-stage lineage counters as one JSON line.

With --checkpoints DIR every stage commits parquet + a manifest
(row_count, content_hash, per-partition counters) there, and a killed
run re-invoked with the same flags resumes past completed stages.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--per-stratum", type=int, default=1_000_000)
    ap.add_argument("--checkpoints", help="stage checkpoint dir (resumable)")
    ap.add_argument(
        "--scrub",
        action="store_true",
        help="rewrite URLs/emails/long digit runs to typed placeholders first",
    )
    ap.add_argument(
        "--pair-candidates",
        action="store_true",
        help="full quadratic LSH pair listing instead of the default "
        "linear star candidates (only needed when the complete pair "
        "list itself is the product; keep-first dedupe does not)",
    )
    ap.add_argument(
        "--benchmark",
        help="parquet of the held-out eval set (doc_id, text); corpus "
        "docs sharing a k-gram with it are dropped after near-dedup",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("ummon_spark_curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ummon_spark.datapipe.curate import (
        CurationConfig,
        curate,
        curate_checkpointed,
    )

    cfg = CurationConfig(
        min_tokens=args.min_tokens,
        n_per_stratum=args.per_stratum,
        scrub=args.scrub,
        star_candidates=not args.pair_candidates,
    )
    docs = spark.read.parquet(f"{args.input}/documents.parquet").persist()
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    if args.checkpoints:
        kept, report = curate_checkpointed(
            spark, docs, args.checkpoints, cfg,
            input_signature=f"{args.input}|bench:{args.benchmark}",
            benchmark=bench,
        )
    else:
        kept, report = curate(docs, cfg, benchmark=bench)
    kept.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"stages": report.counts}))


if __name__ == "__main__":
    main()
