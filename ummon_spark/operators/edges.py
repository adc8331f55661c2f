"""Edge (triple) construction: mentions + nodes -> (subj, pred, obj).

Reproduces the reference's relationship build (SURVEY.md §2.3 G2-G6):

* Candidate projections per mention type (reference src/commands/index.rs):
    defines    module -> function / class        (Pass-1 containment)
    calls      "{doc}::{callee_name}" -> fqn     (index.rs:380-398; only
               mentions WITH a dotted FQN — python.rs:787-791)
    references module -> bare callee name        (undotted calls; name
               reference without resolution)
    imports    module -> imported module path    (index.rs:461-474)
    inherits   "{doc}::{ClassName}" -> supertype (index.rs:400-427; the
               source id deliberately LACKS the "type::" prefix — the
               reference quirk means these edges only survive when a
               same-named *function* exists, see G4 caveat)
    depicts    module -> "media::{media_ref}"    (new; BASELINE)
* Source-exists check: an edge whose subj is not a known node is DROPPED
  (create_relationship fails+warns, knowledge_graph.rs:375) — a
  left_semi join against nodes.
* Missing targets get placeholder nodes (nodes.synthesize_placeholders).
* Deterministic edge id "{subj}->{obj}::{pred}" (relationship.rs:89-105);
  duplicate id -> FIRST wins in (doc_id, span_idx) order
  (RelationshipStore insert-if-absent, relationship.rs:128-156).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def candidate_edges(mentions: DataFrame) -> DataFrame:
    """Project mentions into candidate (subj, pred, obj) triples."""
    m = mentions
    doc = F.col("doc_id")
    name = F.col("name")
    detail = F.col("detail")

    def cand(df: DataFrame, subj, pred: str, obj) -> DataFrame:
        return df.select(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            "doc_id",
            "span_idx",
        )

    is_ = lambda t: F.col("mention_type") == t

    defines_fn = cand(
        m.filter(is_("Function")), doc, "defines", F.concat(doc, F.lit("::"), name)
    )
    defines_cls = cand(
        m.filter(is_("Class")),
        doc,
        "defines",
        F.concat(F.lit("type::"), doc, F.lit("::"), name),
    )
    calls = cand(
        m.filter(is_("CallSite") & (detail != "")),
        F.concat(doc, F.lit("::"), name),
        "calls",
        detail,
    )
    references = cand(m.filter(is_("CallSite") & (detail == "")), doc, "references", name)
    imports = cand(m.filter(is_("Import")), doc, "imports", name)
    inherits = cand(
        m.filter(is_("Class") & (detail != "")),
        F.concat(doc, F.lit("::"), name),
        "inherits",
        detail,
    )
    depicts = cand(
        m.filter(is_("Media")), doc, "depicts", F.concat(F.lit("media::"), name)
    )

    return (
        defines_fn.unionByName(defines_cls)
        .unionByName(calls)
        .unionByName(references)
        .unionByName(imports)
        .unionByName(inherits)
        .unionByName(depicts)
    )


def build_edges(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """Candidates -> checked, deduplicated edge table.

    Two shuffles: the source-exists semi-join (on subj) and the id
    dedupe window. At 100 TB the subj key space is doc-scoped (no hub
    skew on the join side); AQE skew-join covers residual hot keys.
    """
    cands = candidate_edges(mentions)
    checked = cands.join(
        nodes.select(F.col("id").alias("subj")), "subj", "left_semi"
    )
    w = Window.partitionBy("id").orderBy("doc_id", "span_idx")
    return (
        checked.withColumn(
            "id", F.concat("subj", F.lit("->"), "obj", F.lit("::"), "pred")
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "id",
            "subj",
            "pred",
            "obj",
            F.lit(1.0).alias("weight"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.col("doc_id").alias("src_partition"),
        )
    )
