"""Structured Streaming ingestion: continuous document arrival ->
incremental mention/graph updates.

The reference is strictly batch (SURVEY.md §2.7); this is the
Spark-native extension for corpora that arrive continuously. The parse
stage is stateless (a pure function of each row's span array), so the
exact same operators run on a stream:

  readStream(documents) -> spanify -> parse_mentions
    -> writeStream (append mentions; or foreachBatch -> incremental
       graph update with exactly-once parquet commits per micro-batch)

Late data needs no watermark for the stateless path (no windows); the
foreachBatch graph path reuses incremental_update per micro-batch,
giving the same deterministic merge as the batch pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .corpus import spanify
from .operators.parse import parse_mentions

FLAT_DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def stream_documents(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-arrival stream of flat documents parquet."""
    return (
        spark.readStream.schema(FLAT_DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_mentions(documents_stream: DataFrame) -> DataFrame:
    """Streaming spans -> mentions (stateless, no shuffle, no state)."""
    return parse_mentions(spanify(documents_stream))


def run_mentions_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    block: bool = True,
):
    """Continuous parse: append mention rows as documents arrive.
    Exactly-once via the streaming checkpoint + parquet sink."""
    q = (
        stream_mentions(stream_documents(spark, input_dir))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if block:
        q.awaitTermination()
    return q


def run_graph_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    block: bool = True,
):
    """Continuous graph build: each micro-batch of documents runs the
    batch node/edge build and appends, with the micro-batch id recorded
    for idempotent replay (foreachBatch = exactly-once sink pattern)."""
    from pyspark.sql import functions as F

    from .pipeline import build_graph

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        g = build_graph(spanify(batch_df), persist=False)
        g.nodes.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{output_dir}/nodes"
        )
        g.edges.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{output_dir}/edges"
        )

    q = (
        spark.readStream.schema(FLAT_DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if block:
        q.awaitTermination()
    return q


def run_dedup_admission(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    near: bool = False,
    block: bool = True,
):
    """Continuous dedup admission: each micro-batch of arriving
    documents is deduped WITHIN itself (exact, keep min doc_id) and
    then AGAINST the already-admitted corpus before appending — the
    streaming form of the batch-vs-corpus ingestion dedup.

    near=False compares admitted content hashes (exact); near=True runs
    datapipe.dedup.dedup_against (MinHash-LSH cross-corpus near-dedup).
    At 100 TB the admitted-corpus probe side is a materialized
    hash/signature index, not a rescan — here it reads the output table
    back, which is the same join shape. foreachBatch + the streaming
    checkpoint give exactly-once batch tracking; the appended batch_id
    column makes replays idempotent to downstream consumers (same
    pattern as run_graph_ingest)."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .datapipe.dedup import dedup_against, doc_hashes

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hashed = batch_df.withColumn("_h", F.md5(F.col("text")))
        w = Window.partitionBy("_h").orderBy(F.col("doc_id"))
        batch = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if os.path.exists(output_dir):
            admitted = spark.read.parquet(output_dir)
            if near:
                batch = dedup_against(
                    batch.drop("_h"),
                    admitted.select("doc_id", "text"),
                ).withColumn("_h", F.md5(F.col("text")))
            else:
                seen = admitted.select(F.md5(F.col("text")).alias("_h")).distinct()
                batch = batch.join(seen, "_h", "left_anti")
        (
            batch.drop("_h")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    q = (
        spark.readStream.schema(FLAT_DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if block:
        q.awaitTermination()
    return q


def run_hll_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    block: bool = True,
):
    """Continuous distinct-count sketching: each micro-batch's HLL
    registers (datapipe.sketches) merge into the running register
    table by pairwise MAX — the streaming twin of hll_registers.

    MAX-merge makes replays naturally idempotent (merging a batch
    twice is a no-op), so exactly-once here needs only the streaming
    checkpoint for source progress; the state is <= 2^p rows however
    much data has streamed, rewritten atomically per batch (write to
    a versioned subdir, then repoint via the tiny _current marker —
    readers never observe a half-written table)."""
    import os

    from pyspark.sql import functions as F

    from .datapipe.sketches import hll_registers

    state_dir = os.path.join(output_dir, "registers")

    def _read_current():
        marker = os.path.join(output_dir, "_current")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return os.path.join(state_dir, f.read().strip())

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        regs = hll_registers(batch_df, "text")
        current = _read_current()
        if current is not None:
            prev = spark.read.parquet(current)
            regs = (
                regs.unionByName(prev)
                .groupBy("register")
                .agg(F.max("max_rank").alias("max_rank"))
            )
        new_path = os.path.join(state_dir, f"v{batch_id}")
        regs.coalesce(1).write.mode("overwrite").parquet(new_path)
        # atomic repoint: write-then-rename, so a concurrent
        # read_hll_registers never observes an empty/partial marker
        # (a plain truncate-and-write has that window; ADVICE r5)
        marker = os.path.join(output_dir, "_current")
        tmp = marker + f".tmp.{batch_id}"
        with open(tmp, "w") as f:
            f.write(f"v{batch_id}")
        os.replace(tmp, marker)

    os.makedirs(output_dir, exist_ok=True)
    q = (
        spark.readStream.schema(FLAT_DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if block:
        q.awaitTermination()
    return q


def read_hll_registers(spark: SparkSession, output_dir: str) -> DataFrame:
    """The current register table written by run_hll_ingest."""
    import os

    marker = os.path.join(output_dir, "_current")
    with open(marker) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(output_dir, "registers", version))
