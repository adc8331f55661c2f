"""Canonical schemas for every table in the pipeline.

Mirrors the reference's data model (SURVEY.md §1; reference
src/graph/entity.rs:142-152, src/graph/relationship.rs:61-69,
src/db.rs:86-132) re-expressed as typed nested Spark StructTypes instead
of SQLite rows with a JSON ``data`` blob.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: interleaved text + media documents (driver contract, BASELINE.json).
# Partition strategy at scale: bucket(doc_id) so the parse stage is
# embarrassingly parallel and node/edge builds shuffle evenly.
# ---------------------------------------------------------------------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN, False), False),
    ]
)

# Text-span kinds understood by the parse stage (the synthetic language
# dialect; mirrors what the reference's tree-sitter parsers extract —
# SURVEY.md §2.2 / FIXTURES.md §1).
TEXT_KINDS = ("def", "class", "call", "import", "doc", "text")
MEDIA_KINDS = ("image", "audio", "video")

# ---------------------------------------------------------------------------
# Intermediate: mentions (the parser IR; reference
# src/parser/language_support/mod.rs:79-184 FunctionDefinition /
# TypeDefinition / CallReference structs).
# ---------------------------------------------------------------------------
MENTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.LongType(), False),
        T.StructField("mention_type", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        # single free-form payload: fqn for CallSite, supertype list for
        # type kinds, params for Function, module path for Import,
        # media_ref for Media, ":annotation=value" remainder for
        # Variable/Constant, prose for Doc
        T.StructField("detail", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        # Function-only payloads (entity.rs:209-219): the async/static/
        # abstract marker and the "->ret" return annotation; '' elsewhere
        T.StructField("modifier", T.StringType(), False),
        T.StructField("ret", T.StringType(), False),
        # Type-kind-only payload: the raw '<...>' generic-parameter list
        # (GenericParameter extraction, language_support/mod.rs:161-165,
        # java.rs:116-204); '' elsewhere
        T.StructField("tparams", T.StringType(), False),
    ]
)

MENTION_TYPES = (
    "Function",
    "Class",
    "Interface",
    "Trait",
    "Enum",
    "Struct",
    "Variable",
    "Constant",
    "CallSite",
    "Import",
    "Media",
    "Doc",
)

# ---------------------------------------------------------------------------
# Output: nodes + edges (the property graph; reference entities /
# relationships tables src/db.rs:91-111). Partitioned by entity_type /
# pred respectively — the Spark analog of the reference's B-tree indexes.
# ---------------------------------------------------------------------------
# Location range (entity.rs:6-23): {start,end} x {line,column,offset}.
# The span dialect measures positions in span units on a single line:
# line = 1, column = span index + 1 (1-based), offset = span index;
# end = start + one span (exclusive).
POSITION = T.StructType(
    [
        T.StructField("line", T.LongType(), True),
        T.StructField("column", T.LongType(), True),
        T.StructField("offset", T.LongType(), True),
    ]
)
LOCATION = T.StructType(
    [
        T.StructField("start", POSITION, True),
        T.StructField("end", POSITION, True),
    ]
)
LOCATION_DDL = (
    "struct<start:struct<line:bigint,column:bigint,offset:bigint>,"
    "end:struct<line:bigint,column:bigint,offset:bigint>>"
)

NODES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("containing_entity", T.StringType(), True),
        T.StructField("documentation", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("location", LOCATION, True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# entity_type domain (reference src/graph/entity.rs:69-86, 15 variants)
# + "Media" for media-anchored entities (new per BASELINE north_star).
ENTITY_TYPES = (
    "Function",
    "Method",
    "Class",
    "Interface",
    "Trait",
    "Struct",
    "Enum",
    "Module",
    "File",
    "Variable",
    "Field",
    "Constant",
    "DomainConcept",
    "Type",
    "Media",
    "Other",
)

EDGES = T.StructType(
    [
        # deterministic id "{subj}->{obj}::{pred}" (relationship.rs:89-105)
        T.StructField("id", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("src_partition", T.StringType(), True),  # lineage
    ]
)

# pred domain: driver-required defines/calls/imports/references/depicts
# (BASELINE.json) + the reference's vocabulary where exercised
# (relationship.rs:18-38).
PREDICATES = (
    "defines",
    "calls",
    "imports",
    "references",
    "depicts",
    "inherits",
    "implements",
    "contains",
    "represented_by",
    "relates_to",
)

CHECKPOINTS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("ts", T.StringType(), False),
    ]
)
