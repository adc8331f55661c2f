"""Incremental indexing: CDC-style prune + reparse + merge.

Reference lifecycle (SURVEY.md §2.1 S3-S5, §3.1): `ummon index`
reads `last_index_time`, selects files modified since
(src/commands/index.rs:482-510), DELETEs their entities and every edge
touching them in one transaction (src/db.rs:677-733), reparses only
those files (index.rs:513-784), and upserts; `--full` purges everything
first (db.rs:736-749).

Spark-first shape:
* change detection: a `modified_docs` predicate/DataFrame — from an
  Iceberg incremental scan between snapshots in production, from a
  `modified_at > checkpoint` filter on parquet here;
* prune: anti-joins — drop nodes of modified docs and edges whose
  src_partition (lineage column) is a modified doc. Placeholder nodes
  (doc_id = '') are dropped too and re-derived, since their existence
  depends on the surviving edge set;
* rebuild: the normal pipeline over ONLY the modified docs;
* merge: union + the same deterministic-id dedupe the full build uses
  (last-wins for nodes, first-wins for edges) — which makes
  incremental == full rebuild bit-for-bit (proven by test), the
  property the reference enforces with INSERT OR REPLACE on
  deterministic ids (db.rs:172-175, 897-1037).

At 100 TB this is `overwritePartitions` on the bucket(doc_id)
partitions of the modified docs — the anti-join here is the
engine-agnostic equivalent over plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.nodes import synthesize_placeholders
from .pipeline import Graph, build_graph


def purge(spark, out_dir: str) -> None:
    """--full rebuild: drop materialized tables (overwrite-mode writes
    make this implicit; kept for API parity with purge_graph)."""
    import shutil

    shutil.rmtree(f"{out_dir}/nodes", ignore_errors=True)
    shutil.rmtree(f"{out_dir}/edges", ignore_errors=True)


def prune(
    nodes: DataFrame, edges: DataFrame, modified_docs: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Remove all graph rows derived from the modified documents
    (db.rs:677-733 semantics: entities by file_path + every
    relationship touching them). Placeholders are dropped wholesale
    and re-derived after the merge."""
    mods = modified_docs.select(F.col("doc_id"))
    kept_nodes = nodes.filter(F.col("doc_id") != "").join(
        mods, "doc_id", "left_anti"
    )
    kept_edges = edges.join(
        mods.select(F.col("doc_id").alias("src_partition")),
        "src_partition",
        "left_anti",
    )
    return kept_nodes, kept_edges


def incremental_update(
    old: Graph, changed_spans: DataFrame, persist: bool = True
) -> Graph:
    """Prune + rebuild changed docs + merge; returns the new graph.

    changed_spans: the spans table restricted to modified/new docs.

    Doc-scoped ids can't collide between kept and fresh (prune removed
    every modified doc), so those rows merge by plain union. MEDIA ids
    are CROSS-doc (id = "media::{ref}"): the stored node is only the
    last-wins WINNER row, so when the winner's document is pruned, the
    runner-up candidate from a surviving document is not recoverable
    from the node table — it must be re-derived from the mention table
    (the same place the full build gets it). The media slice is
    therefore rebuilt from surviving + fresh Media mentions; at scale
    that slice is a small fraction of the (materialized) mention table
    and one hash-agg.
    """
    from .operators.nodes import build_nodes

    modified = changed_spans.select("doc_id").distinct()
    kept_nodes, kept_edges = prune(old.nodes, old.edges, modified)
    fresh = build_graph(changed_spans, persist=persist)

    edges = kept_edges.unionByName(fresh.edges)
    is_media = F.col("entity_type") == "Media"
    media_mentions = (
        old.mentions.filter(F.col("mention_type") == "Media")
        .join(modified, "doc_id", "left_anti")
        .unionByName(fresh.mentions.filter(F.col("mention_type") == "Media"))
    )
    spark = changed_spans.sparkSession
    no_docs = spark.createDataFrame([], changed_spans.schema)
    media_nodes = build_nodes(media_mentions, no_docs)
    real_nodes = (
        kept_nodes.filter(~is_media)
        .unionByName(fresh.nodes.filter((F.col("doc_id") != "") & ~is_media))
        .unionByName(media_nodes)
    )
    placeholders = synthesize_placeholders(edges, real_nodes)
    nodes = real_nodes.unionByName(placeholders)
    if persist:
        nodes = nodes.persist()
        edges = edges.persist()
    mentions = (
        old.mentions.join(modified, "doc_id", "left_anti")
        .unionByName(fresh.mentions)
    )
    return Graph(nodes=nodes, edges=edges, mentions=mentions)


def modified_since(documents: DataFrame, checkpoint_ts: str, ts_col: str = "modified_at") -> DataFrame:
    """S3 change detection for sources carrying a modification
    timestamp; with Iceberg this is an incremental snapshot scan."""
    if ts_col not in documents.columns:
        return documents  # no CDC column -> treat everything as modified
    return documents.filter(F.col(ts_col) > F.lit(checkpoint_ts))
