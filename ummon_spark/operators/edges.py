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
  duplicate id -> FIRST wins in (doc_id, span_idx) order. This is a
  deliberate deterministic choice, not reference behavior: the
  reference's add_relationship is a plain HashMap insert (last wins,
  relationship.rs:128-156), but duplicate ids carry identical
  (subj, pred, obj, weight) payloads, so the two policies are
  observably equivalent there — we pin FIRST so the src_partition
  lineage column is stable under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_edges(mentions: DataFrame) -> DataFrame:
    """Project mentions into candidate (subj, pred, obj) triples.

    Single pass: each mention row emits an array of 0-2 candidate
    structs which is exploded — one scan of the (cached) mentions
    instead of a 7-branch union re-reading it seven times.
    """
    doc = F.col("doc_id")
    name = F.col("name")
    detail = F.col("detail")
    mt = F.col("mention_type")

    def c(subj, pred: str, obj):
        return F.struct(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
        )

    fn_id = F.concat(doc, F.lit("::"), name)
    cls_id = F.concat(F.lit("type::"), doc, F.lit("::"), name)
    cands = (
        F.when(mt == "Function", F.array(c(doc, "defines", fn_id)))
        .when(
            mt == "Class",
            F.when(
                detail != "",
                F.array(c(doc, "defines", cls_id), c(fn_id, "inherits", detail)),
            ).otherwise(F.array(c(doc, "defines", cls_id))),
        )
        .when(
            mt == "CallSite",
            F.when(detail != "", F.array(c(fn_id, "calls", detail))).otherwise(
                F.array(c(doc, "references", name))
            ),
        )
        .when(mt == "Import", F.array(c(doc, "imports", name)))
        .when(mt == "Media", F.array(c(doc, "depicts", F.concat(F.lit("media::"), name))))
    )
    return mentions.select(
        "doc_id", "span_idx", F.explode(cands).alias("e")
    ).select("e.subj", "e.pred", "e.obj", "doc_id", "span_idx")


def checked_candidates(mentions: DataFrame, nodes: DataFrame) -> DataFrame:
    """Candidates that pass the source-exists check, split by subject
    shape: a module subject (subj == doc_id) always exists (one module
    node per document); only "{doc}::{name}" subjects (calls/inherits)
    can dangle, and those can only match Function ids — so the join
    probes the Function slice of the node table, not the whole graph.
    """
    cands = candidate_edges(mentions)
    module_cands = cands.filter(F.col("subj") == F.col("doc_id"))
    fn_cands = cands.filter(F.col("subj") != F.col("doc_id")).join(
        nodes.filter(F.col("entity_type") == "Function").select(
            F.col("id").alias("subj")
        ),
        "subj",
        "left_semi",
    )
    return module_cands.unionByName(fn_cands)


def build_edges(
    mentions: DataFrame, nodes: DataFrame, checked: DataFrame | None = None
) -> DataFrame:
    """Candidates -> checked, deduplicated edge table.

    Two shuffles: the source-exists semi-join (on subj) and the id
    dedupe window. At 100 TB the subj key space is doc-scoped (no hub
    skew on the join side); AQE skew-join covers residual hot keys.
    """
    if checked is None:
        checked = checked_candidates(mentions, nodes)
    # first-wins by (doc_id, span_idx) via min_by: hash aggregation
    # (map-side partial, no sort) instead of a row_number window
    with_id = checked.withColumn(
        "id", F.concat("subj", F.lit("->"), "obj", F.lit("::"), "pred")
    )
    ord_key = F.struct(F.col("doc_id"), F.col("span_idx"))
    agg = with_id.groupBy("id").agg(
        F.min_by(F.struct("subj", "pred", "obj", "doc_id"), ord_key).alias("_win")
    )
    return agg.select(
        "id",
        F.col("_win.subj").alias("subj"),
        F.col("_win.pred").alias("pred"),
        F.col("_win.obj").alias("obj"),
        F.lit(1.0).alias("weight"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.col("_win.doc_id").alias("src_partition"),
    )
