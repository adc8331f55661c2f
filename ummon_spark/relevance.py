"""Relevance-agent ranking pipeline (SURVEY.md §2.6, reference
src/agent/relevance_agent.rs:19-304) — 5 stages, each a DataFrame op:

R1 keyword extraction — LLM with line-parse fallback and final
   whitespace-split fallback (relevance_agent.rs:39-107). Here the
   deterministic path IS the final fallback: whitespace split of the
   change text (the LLM hook is injectable; tests/gate use the stub).
R2 seed search + scoring (rs:110-170): over 7 entity types, keyword
   containment in lower(name ⊕ file_path ⊕ documentation); score per
   keyword: +1 anywhere, +2 more if in the name; keep score > 0.
R3 context expansion (rs:174-223): BFS depth<=2 both directions per
   relationship type in {calls, contains, imports, references,
   represented_by}; expanded score = seed_score * (1/(depth+1)).
   DEVIATION (documented): the reference's global seen-set makes the
   claiming seed iteration-order-dependent; we take the MAX proximity
   contribution over (seed, rel) — order-independent and stable under
   any partitioning. Seeds keep their R2 score.
R4 hybrid ranking (rs:226-266): centrality = FULL degree of the
   entity (the reference's induced-subgraph filter is a no-op since
   one endpoint is always the entity itself), max-normalized over the
   candidate set; final = proximity*0.7 + centrality*0.3.
R5 file aggregation (rs:269-304): group by file, score = MAX entity
   score, contributing ids collected (sorted for determinism), top 10
   by (score desc, path) — the path tie-break replaces the
   reference's unstable sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.traversal import transitive_closure

SEED_ENTITY_TYPES = (
    "Function",
    "Method",
    "Class",
    "Module",
    "Variable",
    "Constant",
    "DomainConcept",
)
EXPAND_RELS = ("calls", "contains", "imports", "references", "represented_by")
EXPAND_DEPTH = 2
TOP_FILES = 10


def extract_keywords(change: str, llm=None) -> list[str]:
    """R1. llm: optional callable prompt->str returning a JSON array;
    falls back to line parsing then whitespace split (rs:39-107)."""
    if llm is not None:
        import json

        resp = llm(change).strip().strip("`").strip('"')
        try:
            kws = json.loads(resp)
            if isinstance(kws, list) and all(isinstance(k, str) for k in kws):
                return kws
        except (ValueError, TypeError):
            pass
        fallback = []
        for line in resp.removeprefix("```json").strip("`").strip().splitlines():
            line = line.strip().lstrip("[").rstrip("]").rstrip(",").strip()
            if line.startswith('"') and line.endswith('"') and len(line) >= 2:
                fallback.append(line[1:-1])
        if fallback:
            return fallback
    return change.split()


def seed_entities(nodes: DataFrame, keywords: list[str]) -> DataFrame:
    """R2: (id, name, entity_type, doc_id, score)."""
    entity_str = F.lower(
        F.concat(
            F.col("name"),
            F.lit(" "),
            F.coalesce(F.col("doc_id"), F.lit("")),
            F.lit(" "),
            F.coalesce(F.col("documentation"), F.lit("")),
        )
    )
    score = F.lit(0.0)
    for kw in keywords:
        lk = kw.lower()
        per_kw = F.when(
            entity_str.contains(lk),
            F.lit(1.0)
            + F.when(F.lower(F.col("name")).contains(lk), F.lit(2.0)).otherwise(
                F.lit(0.0)
            ),
        ).otherwise(F.lit(0.0))
        score = score + per_kw
    return (
        nodes.filter(F.col("entity_type").isin(*SEED_ENTITY_TYPES))
        .select("id", "name", "entity_type", "doc_id", score.alias("score"))
        .filter(F.col("score") > 0.0)
    )


def expand_context(seeds: DataFrame, edges: DataFrame) -> DataFrame:
    """R3: (id, prox) — seeds keep score; expansions get max
    seed_score * (1/(depth+1)) over (seed, rel)."""
    sym_contribs = []
    roots = seeds.select("id")
    for rel in EXPAND_RELS:
        e = edges.filter(F.col("pred") == rel).select("subj", "obj")
        sym = e.unionByName(
            e.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
        )
        closure = transitive_closure(sym, roots, None, EXPAND_DEPTH)
        sym_contribs.append(closure)
    reached = sym_contribs[0]
    for c in sym_contribs[1:]:
        reached = reached.unionByName(c)
    # min depth per (root, dst) across rels already handled per-call;
    # take the best contribution over seeds and rels
    contrib = (
        reached.join(
            seeds.select(F.col("id").alias("root"), "score"), "root"
        )
        .select(
            F.col("dst").alias("id"),
            (
                F.col("score") * (F.lit(1.0) / (F.col("depth").cast("double") + F.lit(1.0)))
            ).alias("prox"),
        )
        .groupBy("id")
        .agg(F.max("prox").alias("prox"))
        # seeds are never re-scored by expansion (global seen-set)
        .join(seeds.select("id"), "id", "left_anti")
    )
    seed_prox = seeds.select("id", F.col("score").alias("prox"))
    return seed_prox.unionByName(contrib)


def rank_entities(candidates: DataFrame, edges: DataFrame) -> DataFrame:
    """R4: (id, prox, centrality, final_score)."""
    touch = edges.select(F.col("subj").alias("id")).unionByName(
        edges.select(F.col("obj").alias("id"))
    )
    degree = touch.groupBy("id").agg(F.count("*").cast("double").alias("deg"))
    with_deg = candidates.join(degree, "id", "left").withColumn(
        "deg", F.coalesce("deg", F.lit(0.0))
    )
    maxdeg = with_deg.agg(F.max("deg").alias("maxdeg"))
    return (
        with_deg.crossJoin(F.broadcast(maxdeg))
        .select(
            "id",
            "prox",
            F.when(F.col("maxdeg") > 0.0, F.col("deg") / F.col("maxdeg"))
            .otherwise(F.lit(0.0))
            .alias("centrality"),
        )
        .withColumn(
            "final_score",
            F.col("prox") * F.lit(0.7) + F.col("centrality") * F.lit(0.3),
        )
    )


def aggregate_files(ranked: DataFrame, nodes: DataFrame) -> DataFrame:
    """R5: (path, relevance_score, n_contributing, contributing_ids)."""
    with_file = ranked.join(
        nodes.select("id", F.col("doc_id").alias("path")), "id"
    ).filter(F.col("path") != "")
    return (
        with_file.groupBy("path")
        .agg(
            F.max("final_score").alias("relevance_score"),
            F.count("*").cast("bigint").alias("n_contributing"),
            F.array_sort(F.collect_list("id")).alias("contributing_ids"),
        )
        .orderBy(F.col("relevance_score").desc(), "path")
        .limit(TOP_FILES)
    )


def suggest_relevant_files(
    nodes: DataFrame, edges: DataFrame, change: str, llm=None
) -> DataFrame:
    """The full R1-R5 pipeline."""
    kws = extract_keywords(change, llm)
    seeds = seed_entities(nodes, kws).persist()
    cands = expand_context(seeds, edges)
    ranked = rank_entities(cands, edges)
    return aggregate_files(ranked, nodes)
