"""Streaming ingestion tests: streamed mentions == batch mentions;
exactly-once replay via the streaming checkpoint."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from ummon_spark.corpus import load_spans
from ummon_spark.operators.parse import parse_mentions
from ummon_spark.streaming import run_mentions_ingest


def test_stream_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()
    shutil.copy(f"{SF_SMOKE}/documents.parquet", in_dir)

    run_mentions_ingest(spark, in_dir, out_dir, ckpt)
    streamed = sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )
    batch = sorted(
        tuple(r) for r in parse_mentions(load_spans(spark, SF_SMOKE)).collect()
    )
    assert streamed == batch

    # replay with no new files: checkpoint makes it a no-op (no dupes)
    run_mentions_ingest(spark, in_dir, out_dir, ckpt)
    again = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert again == batch
