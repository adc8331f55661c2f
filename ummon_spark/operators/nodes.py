"""Node construction: mentions -> deduplicated entity nodes.

Reproduces the reference's entity build (SURVEY.md §2.3):

* ID synthesis (reference src/commands/index.rs):
    module   -> "{doc_id}"                       (index.rs:188)
    function -> "{doc_id}::{name}"               (index.rs:212-215)
    type     -> "type::{doc_id}::{TypeName}"     (index.rs:265)
    media    -> "media::{media_ref}"             (new; BASELINE north_star)
* Dedup: duplicate id -> LAST wins (HashMap::insert semantics,
  knowledge_graph.rs:179, proven by test :1000-1047). Distributed
  last-wins needs an explicit total order: (doc_id, span_idx) — the
  document/span sequence is the ingestion order, stable under
  repartitioning.
* Documentation: first Doc span of a document attaches to its module
  node (the reference only extracts docs for Java — java.rs:790-856 —
  and returns None elsewhere; our Doc spans are the dialect analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dedupe_last_wins(df: DataFrame) -> DataFrame:
    """Keep the last candidate per id in (doc_id, span_idx) order.

    max_by over the order key = hash aggregation (one shuffle, no
    sort, map-side partial) — cheaper than a row_number window at
    scale. Ties are impossible: (doc_id, span_idx) is unique per
    candidate row."""
    payload = [c for c in df.columns if c not in ("id", "_ord_doc", "_ord_idx")]
    ord_key = F.struct(F.col("_ord_doc"), F.col("_ord_idx"))
    agg = df.groupBy("id").agg(
        F.max_by(F.struct(*payload), ord_key).alias("_win")
    )
    return agg.select("id", *[F.col(f"_win.{c}").alias(c) for c in payload])


def build_nodes(mentions: DataFrame, documents: DataFrame) -> DataFrame:
    """Mentions + document ids -> nodes table (before placeholders).

    `documents` is the spans table (one row per doc): a module entity
    exists for every document regardless of parse results, matching the
    reference which always creates a module entity per file
    (index.rs:188) even when parsers return nothing.

    One shuffle on id (the dedupe window); everything upstream is
    narrow. At scale the id space is ~uniform (doc-scoped prefixes), so
    no skew; media ids are hubs but carry one row per (doc, span).
    """
    m = mentions
    doc = F.col("doc_id")
    name = F.col("name")
    mt = F.col("mention_type")

    # single pass over (cached) mentions: id/type/containing per row
    node_id = (
        F.when(mt == "Function", F.concat(doc, F.lit("::"), name))
        .when(mt == "Class", F.concat(F.lit("type::"), doc, F.lit("::"), name))
        .when(mt == "Media", F.concat(F.lit("media::"), name))
    )
    entities = (
        m.filter(mt.isin("Function", "Class", "Media"))
        .select(
            node_id.alias("id"),
            name.alias("name"),
            F.when(mt == "Media", "Media")
            .otherwise(mt)
            .alias("entity_type"),
            doc.alias("doc_id"),
            F.when(mt == "Media", F.lit("")).otherwise(doc).alias(
                "containing_entity"
            ),
            F.col("detail"),
            F.col("offset"),
            doc.alias("_ord_doc"),
            F.col("span_idx").alias("_ord_idx"),
        )
    )
    # one module node per document; order key (-1) sorts before any span
    doc_texts = (
        m.filter(F.col("mention_type") == "Doc")
        .groupBy("doc_id")
        .agg(F.min(F.struct("span_idx", "detail")).alias("_first"))
        .select("doc_id", F.col("_first.detail").alias("_doc_text"))
    )
    modules = (
        documents.select("doc_id")
        .distinct()
        .join(doc_texts, "doc_id", "left")
        .select(
            F.col("doc_id").alias("id"),
            F.col("doc_id").alias("name"),
            F.lit("Module").alias("entity_type"),
            "doc_id",
            F.lit("").alias("containing_entity"),
            F.coalesce(F.col("_doc_text"), F.lit("")).alias("detail"),
            F.lit(-1).cast("long").alias("offset"),
            F.col("doc_id").alias("_ord_doc"),
            F.lit(-1).cast("long").alias("_ord_idx"),
        )
    )

    candidates = entities.unionByName(modules)
    deduped = _dedupe_last_wins(candidates)
    return deduped.select(
        "id",
        "name",
        "entity_type",
        "doc_id",
        "containing_entity",
        F.when(F.col("entity_type") == "Module", F.col("detail"))
        .otherwise(F.lit(""))
        .alias("documentation"),
        F.when(F.col("entity_type") != "Module", F.col("detail"))
        .otherwise(F.lit(""))
        .alias("detail"),
        F.struct(
            F.col("offset").alias("start_offset"),
            F.col("offset").alias("end_offset"),
        ).alias("location"),
        F.lit(None)
        .cast("map<string,string>")
        .alias("metadata"),
    )


def with_visibility(nodes: DataFrame) -> DataFrame:
    """Visibility by the reference's Python underscore convention
    (python.rs:205-211): '__'-prefixed -> Private, '_' -> Protected,
    else Public; is_constructor when a Function shares its name with a
    same-document Class (java.rs:37-59 constructor-name rule)."""
    vis = (
        F.when(F.col("name").startswith("__"), "Private")
        .when(F.col("name").startswith("_"), "Protected")
        .otherwise("Public")
    )
    classes = nodes.filter(F.col("entity_type") == "Class").select(
        F.col("doc_id").alias("_cdoc"), F.col("name").alias("_cname")
    )
    out = nodes.withColumn("visibility", vis)
    ctor = (
        out.filter(F.col("entity_type") == "Function")
        .join(
            classes,
            (F.col("doc_id") == F.col("_cdoc")) & (F.col("name") == F.col("_cname")),
            "left_semi",
        )
        .select(F.col("id").alias("_ctor_id"))
    )
    return out.join(ctor, out.id == F.col("_ctor_id"), "left").select(
        *[F.col(c) for c in out.columns],
        F.col("_ctor_id").isNotNull().alias("is_constructor"),
    )


def synthesize_placeholders(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Placeholder nodes for edge targets that don't exist.

    Reference: missing target => BaseEntity named after the last '::'
    segment, hard-coded EntityType::Function
    (knowledge_graph.rs:380-395). left_anti join keeps this a single
    shuffle; the placeholder set is small relative to edges.
    """
    missing = (
        edges.select(F.col("obj").alias("id"))
        .join(nodes.select("id"), "id", "left_anti")
        .distinct()
    )
    return missing.select(
        "id",
        F.substring_index(F.col("id"), "::", -1).alias("name"),
        F.lit("Function").alias("entity_type"),
        F.lit("").alias("doc_id"),
        F.lit("").alias("containing_entity"),
        F.lit("").alias("documentation"),
        F.lit("").alias("detail"),
        F.lit(None).cast("struct<start_offset:bigint,end_offset:bigint>").alias(
            "location"
        ),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )
