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
* Documentation (java.rs:790-856 doc-above-entity analog): a Doc span
  attaches to the nearest FOLLOWING entity mention in its document
  (per-entity docs, P15); a Doc span with no following entity attaches
  to the module node (module docstring). First wins per target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import LOCATION_DDL

# class-shaped kinds sharing the "type::{doc}::{Name}" id namespace
# (entity.rs:69-86; index.rs:265)
TYPE_KINDS = ("Class", "Interface", "Trait", "Enum", "Struct")

ENTITY_MENTIONS = (
    "Function",
    "Class",
    "Interface",
    "Trait",
    "Enum",
    "Struct",
    "Variable",
    "Constant",
)


def doc_attachments(mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Documentation attachment (java.rs:790-856 analog): each Doc span
    attaches to the NEAREST FOLLOWING entity mention in its document;
    a Doc span with no following entity attaches to the module. First
    doc wins per target (min span_idx).

    Returns (entity_docs: (doc_id, _ent_idx, _edoc) — _ent_idx is the
             target entity's OFFSET (strictly increasing within a doc
             per the input contract, so "nearest following" by offset
             == by span order, and the candidate join needs no extra
             order column), module_docs: (doc_id, _doc_text)).

    The forward-looking window only scans documents that contain at
    least one Doc span (semi-join first), and corpora with NO Doc spans
    at all skip everything via an isEmpty probe — one limit-1 job on
    the (cached) mentions instead of shuffling every mention row
    against an empty dimension (AQE empty-propagation still pays the
    exchange planning; this doesn't)."""
    doc_mentions = mentions.filter(F.col("mention_type") == "Doc")
    if doc_mentions.isEmpty():
        spark = mentions.sparkSession
        empty_ent = spark.createDataFrame(
            [], "doc_id string, _ent_idx long, _edoc string"
        )
        empty_mod = spark.createDataFrame([], "doc_id string, _doc_text string")
        return empty_ent, empty_mod
    docs_with_doc = doc_mentions.select("doc_id").distinct()
    # only entity mentions can be attachment targets and only Doc rows
    # carry text — CallSite/Import/Media rows never affect next_ent, so
    # they stay out of the window sort (~35% fewer rows at the dialect's
    # span mix; matters now that nearly every document has Doc spans)
    scoped = (
        mentions.filter(F.col("mention_type").isin(*ENTITY_MENTIONS, "Doc"))
        .select("doc_id", "span_idx", "mention_type", "detail", "offset")
        .join(docs_with_doc, "doc_id", "left_semi")
    )
    wfwd = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    next_ent = F.first(
        F.when(
            F.col("mention_type").isin(*ENTITY_MENTIONS), F.col("offset")
        ),
        ignorenulls=True,
    ).over(wfwd)
    # materialized once (lazy): entity_docs AND module_docs read this
    # frame, and without the checkpoint the window sort ran twice —
    # subtree reuse only exists for exchanges, not window operators
    # (r6; the frame is tiny: one row per Doc span)
    doc_rows = (
        scoped.withColumn("_next_ent", next_ent)
        .filter(F.col("mention_type") == "Doc")
        .select("doc_id", "span_idx", "detail", "_next_ent")
        .localCheckpoint(eager=False)
    )
    entity_docs = (
        doc_rows.filter(F.col("_next_ent").isNotNull())
        .groupBy("doc_id", F.col("_next_ent").alias("_ent_idx"))
        .agg(F.min(F.struct("span_idx", "detail")).alias("_first"))
        .select("doc_id", "_ent_idx", F.col("_first.detail").alias("_edoc"))
    )
    module_docs = (
        doc_rows.filter(F.col("_next_ent").isNull())
        .groupBy("doc_id")
        .agg(F.min(F.struct("span_idx", "detail")).alias("_first"))
        .select("doc_id", F.col("_first.detail").alias("_doc_text"))
    )
    return entity_docs, module_docs


def _dedupe_last_wins(df: DataFrame) -> DataFrame:
    """Keep the last candidate per id in (doc_id, offset) order.

    max_by over the order key, one shuffle. The order key reuses the
    payload's own (doc_id, offset) columns — offset == span_idx for
    every entity candidate and -1 for module rows, so the ordering is
    exactly the ingestion order (doc_id, span_idx) without shuffling a
    separate pair of order columns. Ties are impossible: (doc_id,
    offset) is unique per candidate row."""
    payload = [c for c in df.columns if c != "id"]
    ord_key = F.struct(F.col("doc_id"), F.col("offset"))
    agg = df.groupBy("id").agg(
        F.max_by(F.struct(*payload), ord_key).alias("_win")
    )
    return agg.select("id", *[F.col(f"_win.{c}").alias(c) for c in payload])


EMPTY_PARAMS = (
    "array<struct<name:string,type_annotation:string,default_value:string>>"
)


def parse_parameters(detail):
    """Raw param string -> array<struct<name,type_annotation,default_value>>,
    mirroring the reference's typed Parameter payload (entity.rs:38-46;
    python.rs:55-195 extraction shapes: "a", "a: int", "a=3",
    "a: int = 3", "*args", "**kwargs"). Pure Spark SQL expressions
    (split/trim/substring_index) — no Python, stays in codegen.

    Grammar per comma-separated part:
      default_value = text after the LAST '=' (if any), trimmed
      name:type     = text before the FIRST '='
      type_annotation = text after the LAST ':' of the name side
      name          = name side before the first ':', leading '*'s
                      stripped ("*args" -> "args", "**kw" -> "kw")
    """
    parts = F.filter(
        F.transform(F.split(detail, ","), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def to_struct(part):
        name_type = F.trim(F.substring_index(part, "=", 1))
        default = F.when(
            part.contains("="), F.trim(F.substring_index(part, "=", -1))
        ).otherwise(F.lit(""))
        type_ann = F.when(
            name_type.contains(":"),
            F.trim(F.substring_index(name_type, ":", -1)),
        ).otherwise(F.lit(""))
        pname = F.regexp_replace(
            F.trim(F.substring_index(name_type, ":", 1)), r"^\*+", ""
        )
        return F.struct(
            pname.alias("name"),
            type_ann.alias("type_annotation"),
            default.alias("default_value"),
        )

    return F.transform(parts, to_struct)


EMPTY_TYPE_PARAMS = "array<struct<name:string,bounds:array<string>,default_type:string>>"


def parse_type_params(tparams):
    """Raw '<...>' contents -> array<struct<name,bounds,default_type>>,
    mirroring the reference's GenericParameter payload
    (language_support/mod.rs:161-165; extraction java.rs:116-204 /
    rust.rs:214-326 shapes: "T", "T:Bound", "T:B1&B2", "T=Default").
    Pure Spark SQL expressions — no Python, stays in codegen.

    Grammar per comma-separated part:
      default_type = text after the LAST '=' (if any), trimmed
      name[:bounds] = text before the FIRST '='
      bounds        = '&'-separated list after the first ':', trimmed
      name          = before the first ':'; empty names are skipped
                      (java.rs:169 skips empty parameter names)
    """
    parts = F.filter(
        F.transform(F.split(tparams, ","), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def to_struct(part):
        rest = F.trim(F.substring_index(part, "=", 1))
        default = F.when(
            part.contains("="), F.trim(F.substring_index(part, "=", -1))
        ).otherwise(F.lit(""))
        bounds = F.when(
            rest.contains(":"),
            F.filter(
                F.transform(
                    F.split(F.substring_index(rest, ":", -1), "&"),
                    lambda b: F.trim(b),
                ),
                lambda b: b != "",
            ),
        ).otherwise(F.array().cast("array<string>"))
        pname = F.trim(F.substring_index(rest, ":", 1))
        return F.struct(
            pname.alias("name"),
            bounds.alias("bounds"),
            default.alias("default_type"),
        )

    return F.filter(F.transform(parts, to_struct), lambda s: s["name"] != "")


def build_node_candidates(mentions: DataFrame, documents: DataFrame) -> DataFrame:
    """Mentions + document ids -> DEDUPED slim node rows (all flat
    strings; the derived payload arrays come from ``finalize_nodes``).

    `documents` is the spans table (one row per doc): a module entity
    exists for every document regardless of parse results, matching the
    reference which always creates a module entity per file
    (index.rs:188) even when parsers return nothing.

    One shuffle on id (the dedupe window); everything upstream is
    narrow. At scale the id space is ~uniform (doc-scoped prefixes), so
    no skew; media ids are hubs but carry one row per (doc, span).

    The slim/finalize split exists for the cache boundary: the pipeline
    persists THIS frame (flat strings — columnar cache writes ~40%
    faster than the wide frame with its array<struct> payloads,
    measured 10.8 s vs 18.5 s at sf0.1 x20) and re-derives the payload
    columns narrowly wherever they're read.
    """
    m = mentions
    doc = F.col("doc_id")
    name = F.col("name")
    mt = F.col("mention_type")

    # single pass over (cached) mentions: id/type/containing per row.
    # Type-kind breadth (entity.rs:69-86): Interface/Trait/Enum share
    # the Class id namespace ("type::{doc}::{Name}" — index.rs:265);
    # Variables get "{doc}::var::{name}" mirroring the reference's
    # field-id shape "{key}::field::{name}" (index.rs:446).
    node_id = (
        F.when(mt == "Function", F.concat(doc, F.lit("::"), name))
        .when(mt.isin(*TYPE_KINDS), F.concat(F.lit("type::"), doc, F.lit("::"), name))
        .when(mt == "Variable", F.concat(doc, F.lit("::var::"), name))
        .when(mt == "Constant", F.concat(doc, F.lit("::const::"), name))
        .when(mt == "Media", F.concat(F.lit("media::"), name))
    )
    entity_docs, module_docs = doc_attachments(m)
    entities = (
        m.filter(mt.isin("Function", "Media", "Variable", "Constant", *TYPE_KINDS))
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
            F.col("modifier"),
            F.col("ret"),
            F.col("tparams"),
            F.col("offset"),
        )
        # per-entity documentation: the Doc span immediately preceding
        # this entity mention (doc_attachments); offset == span_idx for
        # entity mentions in the span dialect
        .join(
            entity_docs.select(
                F.col("doc_id").alias("_ddoc"), "_ent_idx", "_edoc"
            ),
            (F.col("doc_id") == F.col("_ddoc"))
            & (F.col("offset") == F.col("_ent_idx")),
            "left",
        )
        .drop("_ddoc", "_ent_idx")
        .withColumn("_edoc", F.coalesce(F.col("_edoc"), F.lit("")))
    )
    # one module node per document; order key (-1) sorts before any span.
    # No distinct here (r6): the input is one row per document by
    # contract, and even if a doc_id repeated, the id-keyed dedupe below
    # collapses the (identical-payload) module candidates — the explicit
    # distinct only added a full exchange of the document ids.
    modules = (
        documents.select("doc_id")
        .join(module_docs, "doc_id", "left")
        .select(
            F.col("doc_id").alias("id"),
            F.col("doc_id").alias("name"),
            F.lit("Module").alias("entity_type"),
            "doc_id",
            F.lit("").alias("containing_entity"),
            F.coalesce(F.col("_doc_text"), F.lit("")).alias("detail"),
            F.lit("").alias("modifier"),
            F.lit("").alias("ret"),
            F.lit("").alias("tparams"),
            F.lit(-1).cast("long").alias("offset"),
            F.lit("").alias("_edoc"),
        )
    )

    candidates = entities.unionByName(modules, allowMissingColumns=False)
    return _dedupe_last_wins(candidates)


def finalize_nodes(deduped: DataFrame) -> DataFrame:
    """Slim deduped node rows -> full node schema with the typed
    payloads (parameters, flags, supertypes, type_params, location).
    Pure column expressions — narrow, no shuffle — so callers can apply
    it lazily on top of the cached slim frame."""
    et = F.col("entity_type")
    is_fn = et == "Function"
    is_value = et.isin("Variable", "Constant")
    is_type = et.isin(*TYPE_KINDS)
    # Variable/Constant detail is the raw ":annotation=value" remainder;
    # split it into the typed payload (entity.rs:422-429)
    value = F.when(
        F.col("detail").contains("="), F.substring_index(F.col("detail"), "=", -1)
    ).otherwise(F.lit(""))
    annotation = F.regexp_extract(F.col("detail"), r"^:([^=]*)", 1)
    return deduped.select(
        "id",
        "name",
        "entity_type",
        "doc_id",
        "containing_entity",
        F.when(et == "Module", F.col("detail"))
        .otherwise(F.col("_edoc"))
        .alias("documentation"),
        F.when(is_value, value)
        .when(et != "Module", F.col("detail"))
        .otherwise(F.lit(""))
        .alias("detail"),
        # typed payloads (entity.rs:209-219): parameters parsed from the
        # def's paren contents; return_type from the "->ret" annotation;
        # flags from the modifier marker
        F.when(is_fn, parse_parameters(F.col("detail")))
        .otherwise(F.lit(None).cast(EMPTY_PARAMS))
        .alias("parameters"),
        F.when(is_fn, F.col("ret"))
        .otherwise(F.lit(None).cast("string"))
        .alias("return_type"),
        F.when(is_fn, F.col("modifier") == "async")
        .otherwise(F.lit(None).cast("boolean"))
        .alias("is_async"),
        F.when(is_fn, F.col("modifier") == "static")
        .otherwise(F.lit(None).cast("boolean"))
        .alias("is_static"),
        F.when(is_fn, F.col("modifier") == "abstract")
        .otherwise(F.lit(None).cast("boolean"))
        .alias("is_abstract"),
        # VariableEntity type_annotation (entity.rs:422-429)
        F.when(is_value, annotation)
        .otherwise(F.lit(None).cast("string"))
        .alias("type_annotation"),
        # TypeEntity supertypes Vec (entity.rs:288-296): the comma list
        # parsed to an array, one inherits/implements edge each (edges.py)
        F.when(
            is_type,
            F.filter(F.split(F.col("detail"), ","), lambda x: x != ""),
        )
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("supertypes"),
        # TypeEntity generic parameters (GenericParameter payload,
        # mod.rs:161-165): parsed from the '<...>' list
        F.when(is_type, parse_type_params(F.col("tparams")))
        .otherwise(F.lit(None).cast(EMPTY_TYPE_PARAMS))
        .alias("type_params"),
        # Location (entity.rs:6-23): {start,end} x {line,column,offset},
        # measured in the dialect's span units on a single line
        F.struct(
            F.struct(
                F.lit(1).cast("long").alias("line"),
                (F.col("offset") + 1).cast("long").alias("column"),
                F.col("offset").cast("long").alias("offset"),
            ).alias("start"),
            F.struct(
                F.lit(1).cast("long").alias("line"),
                (F.col("offset") + 2).cast("long").alias("column"),
                (F.col("offset") + 1).cast("long").alias("offset"),
            ).alias("end"),
        ).alias("location"),
        F.lit(None)
        .cast("map<string,string>")
        .alias("metadata"),
    )


def build_nodes(mentions: DataFrame, documents: DataFrame) -> DataFrame:
    """Mentions + documents -> full nodes table (before placeholders);
    see build_node_candidates / finalize_nodes for the two halves."""
    return finalize_nodes(build_node_candidates(mentions, documents))


def with_type_members(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """TypeEntity payload (entity.rs:288-296): `methods` and `fields`
    id lists materialized onto type nodes from their contains edges.
    Member kind comes from the id shape our synthesis pins
    ("{doc}::var::{name}" = field, else method) — no join against the
    node table needed, so this is one groupBy over the contains slice
    plus one left join onto nodes. Lists are sorted for determinism.

    Scale caveat (inherent to the reference's list-valued payload,
    entity.rs:288-296): a pathological type with millions of members
    yields a multi-MB array in one row. If that class of input exists,
    keep the relational form (kg_contains / kg_type_members exploded
    pairs) and skip this materialization."""
    contains = edges.filter(F.col("pred") == "contains")
    is_field = F.col("obj").contains("::var::")
    grouped = contains.groupBy(F.col("subj").alias("id")).agg(
        F.array_sort(
            F.collect_list(F.when(~is_field, F.col("obj")))
        ).alias("methods"),
        F.array_sort(F.collect_list(F.when(is_field, F.col("obj")))).alias(
            "fields"
        ),
    )
    empty = F.array().cast("array<string>")
    return nodes.join(grouped, "id", "left").select(
        *[F.col(c) for c in nodes.columns],
        F.coalesce("methods", empty).alias("methods"),
        F.coalesce("fields", empty).alias("fields"),
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
        F.lit(None).cast(EMPTY_PARAMS).alias("parameters"),
        F.lit(None).cast("string").alias("return_type"),
        F.lit(None).cast("boolean").alias("is_async"),
        F.lit(None).cast("boolean").alias("is_static"),
        F.lit(None).cast("boolean").alias("is_abstract"),
        F.lit(None).cast("string").alias("type_annotation"),
        F.lit(None).cast("array<string>").alias("supertypes"),
        F.lit(None).cast(EMPTY_TYPE_PARAMS).alias("type_params"),
        F.lit(None).cast(LOCATION_DDL).alias("location"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )
