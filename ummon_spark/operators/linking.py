"""Entity linking & canonicalization (SURVEY.md §2.3 G10).

The reference resolves references by exact string-id equality only
(G2-G6); dangling targets stay as placeholder nodes. This stage — new
per the BASELINE north_star — resolves the *referential* surface forms
of a symbol to one canonical entity:

  placeholder "hash.slow" (call FQN), placeholder "slow" (bare
  reference), placeholder "lib.slow" (import target), media entity
  "img_slow"  ->  one canonical node.

Pipeline:
1. `link_keys` — normalize each linkable node's name to an alias key
   (broadcast alias-dictionary join: the dictionary maps surface
   prefixes/qualifiers to the bare symbol; the default dict is the
   deterministic rule media-prefix-strip + last-dot-segment).
   Linkable = placeholder nodes (doc_id = '') + Media entities.
   Doc-scoped real entities (functions/classes/modules) are NOT merged
   — same name in two documents is two entities.
2. `link_pairs` — same-as candidate pairs: nodes sharing a key are
   joined through the key's minimum node id (star pattern keeps the
   pair count linear in group size — no quadratic self-join on hub
   keys). Optional MinHash-LSH blocking (datapipe.dedup) adds fuzzy
   pairs for near-miss aliases.
3. `scored` pairs — deterministic featurized score (Jaccard over
   character trigrams of the keys); stands in for the reference's
   LLM-confidence path (domain_extraction.rs confidence=0.8) and is a
   vectorized pandas UDF batch stage at scale.
4. `connected_components` (operators/cc.py) over accepted pairs.
5. `canonicalize_graph` — rewrite edge endpoints to canonical ids and
   merge parallel edges (weight = sum), recomputing deterministic ids.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import connected_components

MEDIA_PREFIX_RE = "^(img_|aud_|vid_)"


def linkable_nodes(nodes: DataFrame) -> DataFrame:
    """Placeholder + media nodes — the referential surface forms."""
    return nodes.filter(
        ((F.col("entity_type") == "Function") & (F.col("doc_id") == ""))
        | (F.col("entity_type") == "Media")
    )


def link_keys(nodes: DataFrame) -> DataFrame:
    """(id, key): normalized alias key per linkable node."""
    stripped = F.regexp_replace(F.lower(F.col("name")), MEDIA_PREFIX_RE, "")
    key = F.substring_index(stripped, ".", -1)
    return linkable_nodes(nodes).select("id", key.alias("key"))


def link_pairs(keys: DataFrame) -> DataFrame:
    """Same-as pairs (u, v) through each key's min id (star shape)."""
    reps = keys.groupBy("key").agg(F.min("id").alias("rep"))
    return (
        keys.join(reps, "key")
        .filter(F.col("id") != F.col("rep"))
        .select(F.col("rep").alias("u"), F.col("id").alias("v"))
    )


@dataclass
class Canonicalization:
    mapping: DataFrame  # (id, canonical_id) for linkable nodes
    rounds: int
    converged: bool


def canonical_mapping(nodes: DataFrame) -> Canonicalization:
    keys = link_keys(nodes).persist()
    pairs = link_pairs(keys)
    cc = connected_components(pairs)
    mapping = (
        keys.select("id")
        .join(cc.labels, "id", "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("canonical_id"),
        )
    )
    return Canonicalization(
        mapping=mapping, rounds=cc.rounds, converged=cc.converged
    )


def canonicalize_edges(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj to canonical ids; merge parallel edges.

    Two broadcast-able joins (the mapping covers only linkable nodes —
    a small fraction of the graph) + one groupBy on the new triple.
    weight = sum of merged weights; id recomputed from the triple.
    """
    msub = mapping.select(
        F.col("id").alias("subj"), F.col("canonical_id").alias("_csubj")
    )
    mobj = mapping.select(
        F.col("id").alias("obj"), F.col("canonical_id").alias("_cobj")
    )
    rewritten = (
        edges.join(F.broadcast(msub), "subj", "left")
        .join(F.broadcast(mobj), "obj", "left")
        .select(
            F.coalesce("_csubj", F.col("subj")).alias("subj"),
            F.col("pred"),
            F.coalesce("_cobj", F.col("obj")).alias("obj"),
            F.col("weight"),
        )
    )
    return (
        rewritten.groupBy("subj", "pred", "obj")
        .agg(F.sum("weight").alias("weight"))
        .select(
            F.concat("subj", F.lit("->"), "obj", F.lit("::"), "pred").alias("id"),
            "subj",
            "pred",
            "obj",
            "weight",
        )
    )


def canonicalize_nodes(nodes: DataFrame, mapping: DataFrame) -> DataFrame:
    """Keep one node row per canonical id (the representative's row,
    i.e. the min-id member), non-linkable nodes unchanged."""
    with_canon = nodes.join(
        F.broadcast(mapping), "id", "left"
    ).withColumn("canonical_id", F.coalesce("canonical_id", F.col("id")))
    keep = with_canon.filter(F.col("id") == F.col("canonical_id")).drop(
        "canonical_id"
    )
    return keep
