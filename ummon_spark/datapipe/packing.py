"""Token-range sharding (sequence packing): assign each document a
global token start offset and a fixed-capacity shard — the layout step
a pre-tokenized training corpus runs before writing packed examples
(documents concatenated in deterministic doc_id order; a shard is a
contiguous `capacity`-token range of that concatenation).

The naive formulation is ONE unpartitioned window (`SUM OVER (ORDER BY
doc_id)`) — a single-task global sort that dies at 100 TB. This module
runs the standard two-phase distributed prefix sum instead:

1. range-partition by the order key and sort within partitions — the
   shuffle Spark would do for a global sort, but terminating in P
   parallel sorted runs instead of one task;
2. one tiny job collects the P per-partition token totals (P rows) to
   the driver, prefix-sums them, and broadcasts the offsets;
3. a per-partition window (parallel — partitioned by the physical
   partition id) computes within-partition running sums; the global
   offset is partition offset + within-partition sum.

The result is independent of the partition boundaries (the offset of a
doc is the token sum of all smaller doc_ids, however they were split),
so the operator is deterministic and oracle-checkable while scaling as
P parallel sorts + one P-row driver hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PACK_CAPACITY = 2048


def pack_documents(
    documents: DataFrame,
    capacity: int = PACK_CAPACITY,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, shard_id): token-range sharding
    over whitespace token counts in ascending doc_id order.
    shard_id = start_offset DIV capacity."""
    spark = documents.sparkSession
    n_part = num_partitions or max(spark.sparkContext.defaultParallelism, 8)
    toks = documents.select(
        F.col("doc_id").cast("bigint").alias("_k"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    parted = (
        toks.repartitionByRange(n_part, F.col("_k"))
        .sortWithinPartitions("_k")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # P-row driver hop: per-partition totals -> exclusive prefix offsets
    totals = {
        r["_pid"]: r["t"]
        for r in parted.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_col = F.lit(0).cast("bigint")
    for pid, off in offsets.items():
        offset_col = F.when(F.col("_pid") == pid, F.lit(off).cast("bigint")).otherwise(
            offset_col
        )
    w = Window.partitionBy("_pid").orderBy("_k")
    start = (offset_col + F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "start_offset"
    )
    return parted.select(
        "doc_id",
        "n_tokens",
        start,
    ).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {capacity}").cast("bigint").alias("shard_id"),
    )
