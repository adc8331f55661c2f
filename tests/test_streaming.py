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


def test_dedup_admission_stream(spark, tmp_path):
    """Two arriving files with overlapping content: the admitted corpus
    holds each distinct text exactly once — within-batch dupes collapse
    to the min doc_id, cross-batch dupes are rejected against the
    already-admitted table. Replay with no new files is a no-op."""
    from pyspark.sql import functions as F

    from ummon_spark.streaming import run_dedup_admission

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    f1 = [(1, "alpha beta gamma", "en", "s", 16),
          (2, "alpha beta gamma", "en", "s", 16),   # within-batch dupe of 1
          (3, "delta epsilon zeta", "en", "s", 18)]
    f2 = [(4, "alpha beta gamma", "en", "s", 16),   # cross-batch dupe of 1
          (5, "brand new content here", "en", "s", 22)]
    # two separate files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(in_dir / "a"))
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(in_dir / "b"))
    import glob
    import shutil
    for sub in ("a", "b"):
        part = glob.glob(str(in_dir / sub / "part-*.parquet"))[0]
        shutil.move(part, str(in_dir / f"{sub}.parquet"))
        shutil.rmtree(str(in_dir / sub))

    run_dedup_admission(spark, str(in_dir), out_dir, ckpt)
    admitted = spark.read.parquet(out_dir)
    rows = {r["text"]: r["doc_id"] for r in admitted.collect()}
    assert set(rows) == {"alpha beta gamma", "delta epsilon zeta",
                         "brand new content here"}
    assert admitted.count() == 3  # no duplicate texts admitted
    assert rows["alpha beta gamma"] in (1, 4)  # first-arrived batch wins
    # each text admitted exactly once
    assert admitted.groupBy("text").count().filter(F.col("count") > 1).count() == 0

    run_dedup_admission(spark, str(in_dir), out_dir, ckpt)  # replay no-op
    assert spark.read.parquet(out_dir).count() == 3


def test_hll_ingest_stream(spark, tmp_path):
    """Streaming HLL: after two micro-batches the register table
    equals the batch sketch over the union of all arrived rows, and
    the driver-side estimate tracks the true distinct count. Replay
    with no new files is a no-op (MAX-merge idempotence)."""
    from ummon_spark.datapipe.sketches import hll_estimate, hll_registers
    from ummon_spark.streaming import read_hll_registers, run_hll_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "hll_out")
    ckpt = str(tmp_path / "hll_ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    f1 = [(i, f"text number {i}", "en", "s", 10) for i in range(300)]
    # overlap: 100 repeats of batch-1 texts + 200 fresh
    f2 = [(1000 + i, f"text number {i}", "en", "s", 10) for i in range(100)]
    f2 += [(2000 + i, f"fresh {i}", "en", "s", 7) for i in range(200)]
    import glob
    import shutil

    for name, rows in (("a", f1), ("b", f2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(in_dir / f"{name}_dir")
        )
        part = glob.glob(str(in_dir / f"{name}_dir" / "part-*.parquet"))[0]
        shutil.move(part, str(in_dir / f"{name}.parquet"))
        shutil.rmtree(str(in_dir / f"{name}_dir"))

    run_hll_ingest(spark, str(in_dir), out_dir, ckpt)
    streamed = sorted(map(tuple, read_hll_registers(spark, out_dir).collect()))
    all_rows = spark.createDataFrame(f1 + f2, schema)
    batch = sorted(map(tuple, hll_registers(all_rows, "text").collect()))
    assert streamed == batch
    est = hll_estimate(streamed)
    assert abs(est - 500) / 500 < 0.15  # 300 + 200 fresh distinct texts

    run_hll_ingest(spark, str(in_dir), out_dir, ckpt)  # replay no-op
    assert sorted(map(tuple, read_hll_registers(spark, out_dir).collect())) == batch
