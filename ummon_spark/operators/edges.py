"""Edge (triple) construction: mentions + nodes -> (subj, pred, obj).

Reproduces the reference's relationship build (SURVEY.md §2.3 G2-G6):

* Candidate projections per mention type (reference src/commands/index.rs):
    defines    module -> function / class        (Pass-1 containment)
    contains   "type::{doc}::{Cls}" -> function  (index.rs:429-457 type->
               method containment; dialect: a def span is a member of
               the most recent preceding class span in its document)
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
* The id concat is NOT injective ('->' can occur inside
  whitespace-split tokens), so after the triple-keyed dedupe an
  id-keyed first-wins pass collapses adversarial collisions — the
  analog of the reference DB's collapse-by-id (INSERT OR REPLACE keyed
  on id, relationship.rs:89-105), with one deliberate divergence:
  REPLACE keeps the LAST arrival (insertion-order dependent), while
  this pass deterministically keeps the FIRST by (src_doc, src_span,
  triple) so the result is stable under repartitioning — same
  determinism-over-arrival-order choice as the triple dedupe above,
  and oracle-locked. The pass runs ONLY on the slice whose
  subj or obj contains '->': when neither does, the id holds exactly
  one '->' (preds contain neither '->' nor ':'), which pins the
  subj/obj split and makes the concat injective on that slice — and a
  1-'->' id can never equal a >=2-'->' id, so the clean slice skips
  the second shuffle entirely (it is the whole table on non-adversarial
  corpora; measured ~10% of build throughput at bench scale).
* metadata carries the winning mention's provenance
  {src_doc, src_span}. The metadata field itself is the reference's
  per-edge HashMap<String,String> (relationship.rs:61-69), but the
  reference INDEXER always leaves it empty (only its tests populate
  it) — filling it with (doc_id, span_idx) lineage is this engine's
  EXTENSION, feeding the north_rule's per-partition checkpoint
  counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


TYPE_MENTIONS = ("Class", "Interface", "Trait", "Enum", "Struct")
MEMBER_MENTIONS = ("Function", "Variable")


def member_context(mentions: DataFrame) -> DataFrame:
    """(doc_id, span_idx, mention_type, name, _last_cls): member and
    type mentions annotated with the name of the most recent preceding
    class-like mention in the same document (NULL if none). This is the
    dialect's membership rule — a def span following a class span is
    that type's member (reference type_def.methods, index.rs:429-442).

    One window shuffle partitioned by doc_id (uniform keys: documents
    are the natural unit of work at 100 TB, no hub skew). The sort input
    is pre-filtered to the four columns and the member/type mention
    rows that can participate — call/import/media/doc rows never affect
    membership, so they stay out of the sort (≈60% fewer rows at the
    dialect's span mix)."""
    w = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_type = F.col("mention_type").isin(*TYPE_MENTIONS)
    last_cls = F.last(
        F.when(is_type, F.col("name")), ignorenulls=True
    ).over(w)
    return (
        mentions.filter(
            F.col("mention_type").isin(*(TYPE_MENTIONS + MEMBER_MENTIONS))
        )
        .select("doc_id", "span_idx", "mention_type", "name")
        .withColumn("_last_cls", last_cls)
    )


def contains_candidates(mentions: DataFrame) -> DataFrame:
    """Type->member `contains` candidates from the membership window
    (index.rs:429-457: methods and fields of a type). Kept out of the
    main explode pass so the window sort only sees the member/type
    subset of the (cached) mentions."""
    doc = F.col("doc_id")
    name = F.col("name")
    mt = F.col("mention_type")
    member_id = F.when(mt == "Function", F.concat(doc, F.lit("::"), name)).when(
        mt == "Variable", F.concat(doc, F.lit("::var::"), name)
    )
    return (
        member_context(mentions)
        .filter(mt.isin(*MEMBER_MENTIONS) & F.col("_last_cls").isNotNull())
        .select(
            F.concat(F.lit("type::"), doc, F.lit("::"), F.col("_last_cls")).alias(
                "subj"
            ),
            F.lit("contains").alias("pred"),
            member_id.alias("obj"),
            "doc_id",
            "span_idx",
        )
    )


def candidate_edges(mentions: DataFrame) -> DataFrame:
    """Project mentions into candidate (subj, pred, obj) triples.

    Two passes over the (cached) mentions: the main explode — each
    mention row emits an array of 0-2 candidate structs, no shuffle —
    plus the windowed contains_candidates subset. Cheaper than one
    pass behind a window over every mention row.
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
    var_id = F.concat(doc, F.lit("::var::"), name)
    const_id = F.concat(doc, F.lit("::const::"), name)

    # supertype pred by SOURCE kind (index.rs:410-418): Class and Struct
    # produce Inherits; Interface/Trait/Enum produce Implements. Both
    # share the unprefixed-source quirk (see module docstring). detail
    # is a comma-joined supertype LIST (entity.rs:288-296 Vec): one edge
    # per non-empty entry (index.rs:400-427 loops the supertypes).
    super_pred = F.when(
        mt.isin("Class", "Struct"), F.lit("inherits")
    ).otherwise(F.lit("implements"))
    sups = F.filter(F.split(detail, ","), lambda x: x != "")
    type_cands = F.concat(
        F.array(c(doc, "defines", cls_id)),
        F.transform(
            sups,
            lambda s: F.struct(
                fn_id.alias("subj"), super_pred.alias("pred"), s.alias("obj")
            ),
        ),
    )
    cands = (
        F.when(mt == "Function", F.array(c(doc, "defines", fn_id)))
        .when(mt.isin(*TYPE_MENTIONS), type_cands)
        .when(mt == "Variable", F.array(c(doc, "defines", var_id)))
        .when(mt == "Constant", F.array(c(doc, "defines", const_id)))
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
    node per document); contains candidates' "type::" subjects provably
    exist too — each is synthesized from a class mention in the same
    document, and node dedupe never drops an id — so they join the
    output directly, skipping both filter branches (the windowed
    subtree is evaluated exactly once). Only "{doc}::{name}" subjects
    (calls/inherits/implements) can dangle, and those can only match
    Function ids — so the join probes the Function slice of the node
    table, not the whole graph.
    """
    cands = candidate_edges(mentions)
    module_cands = cands.filter(F.col("subj") == F.col("doc_id")).unionByName(
        contains_candidates(mentions)
    )
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
    # ONE id-keyed aggregate does both dedupe levels at once: min over
    # the total order (doc, span, subj, pred, obj) within each id group
    # picks the same row as "per-triple first-wins, then first-wins
    # across colliding triples" — the global min row's (doc, span) is
    # its own triple's winner, so the two-level and one-level rules
    # provably agree (the oracle keeps the two-level formulation).
    # min_by partial-aggregates map-side, so duplicate triples combine
    # before the shuffle exactly as a triple-keyed agg would; a
    # two-pass clean/dirty split was measured WORSE (no ReusedExchange
    # across the union branches — the candidate subtree ran twice).
    # r6 optimization (guide §2.3 — shuffle fewer bytes): the order key
    # and the payload are permutations of the same five columns, so
    # min() over ONE struct ordered (doc_id, span_idx, subj, pred, obj)
    # picks the identical winner min_by(payload, ord_key) did, while the
    # partial-aggregated shuffle row carries each column once instead of
    # twice (~45% fewer bytes through the build's biggest exchange).
    ord_key = F.struct(
        F.col("doc_id"), F.col("span_idx"),
        F.col("subj"), F.col("pred"), F.col("obj"),
    )
    with_id = checked.select(
        F.concat("subj", F.lit("->"), "obj", F.lit("::"), "pred").alias("id"),
        ord_key.alias("o"),
    )
    final = with_id.groupBy("id").agg(F.min("o").alias("e"))
    return final.select(
        "id",
        F.col("e.subj").alias("subj"),
        F.col("e.pred").alias("pred"),
        F.col("e.obj").alias("obj"),
        F.lit(1.0).alias("weight"),
        F.create_map(
            F.lit("src_doc"), F.col("e.doc_id"),
            F.lit("src_span"), F.col("e.span_idx").cast("string"),
        ).alias("metadata"),
        F.col("e.doc_id").alias("src_partition"),
    )
