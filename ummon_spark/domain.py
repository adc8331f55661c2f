"""Domain-model extraction (SURVEY.md §2.4 D1, §2.3 G7-G8).

The reference walks a docs directory, chunks big files (10 kB window /
500 B overlap — src/prompt/domain_extraction.rs:82-102,151-181), asks
an LLM for JSON concepts, name-dedupes, and merges DomainConcept nodes
(confidence 0.8) plus RepresentedBy edges into the graph
(src/commands/index.rs:834-977); then infers RelatesTo between concept
pairs whose technical entities connect within 3 hops
(index.rs:984-1041).

Spark-first shape:
* size gate: skip docs < 100 B or > 100 kB (index.rs:888-904);
* chunking: built-in substring over an exploded window index (no UDF);
* concept scoring: injectable batch scorer (an LLM endpoint at
  production; here the deterministic stub: per chunk, tokens of
  length >= 6 occurring >= 2 times become concepts — the reference
  itself treats LLM output as untrusted JSON with fallbacks, so the
  contract is just "chunk -> list of concept names");
* merge: name-dedupe (dropDuplicates on name ~ HashMap name dedupe,
  domain_extraction.rs:104-114), concept node id = the concept name
  (index.rs:800,929), confidence 0.8;
* RepresentedBy: concept -> same-named Function entities of the doc;
* RelatesTo: concept pairs whose represented entities connect within
  3 hops of outbound BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.traversal import transitive_closure
from .schemas import LOCATION_DDL

MIN_DOC_BYTES = 100
MAX_DOC_BYTES = 100_000
CHUNK_WINDOW = 10_000
CHUNK_OVERLAP = 500
CONFIDENCE = 0.8
RELATES_MAX_HOPS = 3


def size_gate(documents: DataFrame) -> DataFrame:
    """Skip docs < 100 B or > 100 kB (index.rs:888-904)."""
    n = F.length("text")
    return documents.filter((n >= MIN_DOC_BYTES) & (n <= MAX_DOC_BYTES))


def chunk_documents(
    documents: DataFrame,
    window: int = CHUNK_WINDOW,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk): sliding windows with overlap —
    substring over an exploded index sequence, no Python.

    Matches the reference's boundaries: chunks start every
    (window - overlap) chars; content shorter than the window yields
    one chunk (domain_extraction.rs:151-181)."""
    step = window - overlap
    n = F.length("text")
    gated = size_gate(documents)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)).cast("int")
    )
    return gated.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_i"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.substring(
            F.col("text"), F.col("chunk_idx").cast("int") * step + 1, window
        ).alias("chunk"),
    )


def stub_concepts(
    documents: DataFrame, min_len: int = 6, min_count: int = 2
) -> DataFrame:
    """Deterministic concept scorer stub: per size-gated DOCUMENT
    (un-chunked text), tokens of length >= min_len occurring
    >= min_count times. Output (doc_id, name).

    Counts over the whole text, not over chunk_documents output —
    overlapping chunks would double-count tokens in the overlap and
    split tokens at chunk boundaries. Chunking exists for the
    LLM-backed scorer (which plugs in with the chunk -> concepts
    contract via extract_domain_model's `scorer`); the deterministic
    gate path matches the DuckDB oracle's whole-text tokenization."""
    toks = size_gate(documents).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.length("token") >= min_len)
    return (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("doc_id", F.col("token").alias("name"))
    )


def concept_nodes(concepts: DataFrame) -> DataFrame:
    """Name-deduped DomainConcept nodes; id = concept name
    (index.rs:800), confidence 0.8 in metadata."""
    return (
        concepts.select("name")
        .distinct()
        .select(
            F.col("name").alias("id"),
            "name",
            F.lit("DomainConcept").alias("entity_type"),
            F.lit("").alias("doc_id"),
            F.lit("").alias("containing_entity"),
            F.lit("").alias("documentation"),
            F.lit(str(CONFIDENCE)).alias("detail"),
            F.lit(None).cast(LOCATION_DDL).alias("location"),
            F.create_map(F.lit("confidence"), F.lit(str(CONFIDENCE))).alias(
                "metadata"
            ),
        )
    )


REPRESENTED_TYPES = (
    "Function",
    "Class",
    "Interface",
    "Trait",
    "Enum",
    "Struct",
)


def represented_by_edges(concepts: DataFrame, nodes: DataFrame) -> DataFrame:
    """concept -> same-named technical entities of the same document.

    Name matching is entity-type-agnostic in the reference (concept
    relationships target EntityId::new(bare name), index.rs:957-975),
    so concepts anchor to functions AND type entities — type anchors
    give RelatesTo its outbound paths (type --contains--> member
    function == another concept's anchor)."""
    funcs = nodes.filter(F.col("entity_type").isin(*REPRESENTED_TYPES)).select(
        F.col("id").alias("obj"), F.col("name"), F.col("doc_id")
    )
    return (
        concepts.join(funcs, ["name", "doc_id"])
        .select(
            F.col("name").alias("subj"),
            F.lit("represented_by").alias("pred"),
            "obj",
        )
        .distinct()
        .select(
            F.concat("subj", F.lit("->"), "obj", F.lit("::"), "pred").alias("id"),
            "subj",
            "pred",
            "obj",
            F.lit(1.0).alias("weight"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.lit("domain").alias("src_partition"),
        )
    )


def relates_to_edges(
    rep_edges: DataFrame, edges: DataFrame, max_hops: int = RELATES_MAX_HOPS
) -> DataFrame:
    """RelatesTo between concept pairs whose technical entities connect
    within max_hops outbound hops (index.rs:984-1041): one BFS from
    ALL represented entities at once, then concept×concept via the
    reached set — never a per-pair loop."""
    anchors = rep_edges.select(
        F.col("subj").alias("concept"), F.col("obj").alias("id")
    )
    closure = transitive_closure(edges, anchors.select("id").distinct(), None, max_hops)
    # tech -> tech reachability, lifted to concept -> concept
    reach = (
        anchors.withColumnRenamed("id", "root")
        .join(closure, "root")
        .select("concept", "dst")
    )
    other = anchors.select(
        F.col("concept").alias("concept_b"), F.col("id").alias("dst")
    )
    pairs = (
        reach.join(other, "dst")
        .filter(F.col("concept") != F.col("concept_b"))
        .select(F.col("concept").alias("subj"), F.col("concept_b").alias("obj"))
        .distinct()
    )
    return pairs.select(
        F.concat("subj", F.lit("->"), "obj", F.lit("::relates_to")).alias("id"),
        "subj",
        F.lit("relates_to").alias("pred"),
        "obj",
        F.lit(1.0).alias("weight"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit("domain").alias("src_partition"),
    )


def extract_domain_model(
    documents: DataFrame, nodes: DataFrame, edges: DataFrame, scorer=None
) -> tuple[DataFrame, DataFrame]:
    """Full D1+G7+G8: returns (new_nodes, new_edges). An injected
    `scorer` (LLM-backed) receives chunked documents; the deterministic
    stub tokenizes whole gated documents (see stub_concepts)."""
    concepts = (
        scorer(chunk_documents(documents))
        if scorer is not None
        else stub_concepts(documents)
    )
    cnodes = concept_nodes(concepts)
    rep = represented_by_edges(concepts, nodes)
    rel = relates_to_edges(rep, edges)
    return cnodes, rep.unionByName(rel)
