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

from .hashing import token_hash

PACK_CAPACITY = 2048
VAL_PCT = 5  # deterministic held-out fraction for shuffle_split


def _exclusive_prefix_sum(
    df: DataFrame,
    order_key: str,
    weight: str,
    num_partitions: int | None,
    out: str,
) -> DataFrame:
    """Two-phase distributed exclusive prefix sum of `weight` in
    `order_key` order: range-partition + in-partition sorts (P parallel
    runs), a P-row driver hop for the per-partition offsets, then a
    per-partition window. The result is independent of where the range
    partitioner cut the key space."""
    spark = df.sparkSession
    n_part = num_partitions or max(spark.sparkContext.defaultParallelism, 8)
    # the persist is load-bearing for CORRECTNESS, not just speed:
    # repartitionByRange samples the key space to pick boundaries, so an
    # uncached re-execution could cut partitions differently and attach
    # the collected offsets to the wrong _pid. It stays cached for the
    # lifetime of the returned (lazily consumed) DataFrame and is
    # released by the ContextCleaner when the caller drops it.
    parted = (
        df.repartitionByRange(n_part, F.col(order_key))
        .sortWithinPartitions(order_key)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # P-row driver hop: per-partition totals -> exclusive prefix offsets
    totals = {
        r["_pid"]: r["t"]
        for r in parted.groupBy("_pid").agg(F.sum(weight).alias("t")).collect()
    }
    # r6 (guide §5 / VERDICT r5): the offsets attach via a BROADCAST
    # JOIN on _pid instead of a P-branch CASE expression — the old
    # when/otherwise chain was an O(P)-deep expression tree, i.e.
    # O(N*P) interpreted work once P outgrows codegen limits
    # (P ~ 10^4-10^5 at 100 TB); the P-row broadcast join is O(N).
    acc = 0
    rows = []
    for pid in sorted(totals):
        rows.append((pid, acc))
        acc += totals[pid]
    offsets = spark.createDataFrame(rows or [(0, 0)], "_pid int, _poff bigint")
    w = Window.partitionBy("_pid").orderBy(order_key)
    return (
        parted.join(F.broadcast(offsets), "_pid", "left")
        .withColumn(
            out,
            F.coalesce(F.col("_poff"), F.lit(0).cast("bigint"))
            + F.sum(weight).over(w)
            - F.col(weight),
        )
        .drop("_poff")
    )


def pack_documents(
    documents: DataFrame,
    capacity: int = PACK_CAPACITY,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, shard_id): token-range sharding
    over whitespace token counts in ascending doc_id order.
    shard_id = start_offset DIV capacity."""
    toks = documents.select(
        F.col("doc_id").cast("bigint").alias("_k"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return _exclusive_prefix_sum(
        toks, "_k", "n_tokens", num_partitions, "start_offset"
    ).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {capacity}").cast("bigint").alias("shard_id"),
    )


def shuffle_split(
    documents: DataFrame,
    val_pct: int = VAL_PCT,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, shuffle_rank, split): deterministic global shuffle +
    train/val split — the layout step before writing training shards.

    * shuffle_rank is the doc's position in md5(doc_id) order — a
      deterministic pseudo-random permutation of the corpus, computed
      with the same two-phase prefix machinery as pack_documents
      (weight 1 = exclusive prefix COUNT), never one global window.
    * split is hash-stable per document ('val' iff an independent
      md5-derived hash mod 100 < val_pct), so re-running over a grown
      corpus never migrates an old doc across the train/val boundary.
    """
    keyed = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
        F.lit(1).cast("bigint").alias("_one"),
    )
    ranked = _exclusive_prefix_sum(
        keyed, "_h", "_one", num_partitions, "shuffle_rank"
    )
    split_hash = token_hash(F.col("doc_id"), "split") % 100
    return ranked.select(
        "doc_id",
        "shuffle_rank",
        F.when(split_hash < val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
