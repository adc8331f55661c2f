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


def link_keys(nodes: DataFrame, alias_dict: DataFrame | None = None) -> DataFrame:
    """(id, key): normalized alias key per linkable node.

    alias_dict: optional (surface, canonical_key) table — the broadcast
    alias dictionary of the BASELINE north_star. Surfaces are matched
    against the rule-normalized key (lowercased, media prefix stripped,
    last dot segment) and override it; unmatched keys keep the rule
    result. The dictionary is a curated artifact (thousands of rows,
    not data-scale), so it is explicitly broadcast — the join never
    shuffles the node table."""
    stripped = F.regexp_replace(F.lower(F.col("name")), MEDIA_PREFIX_RE, "")
    key = F.substring_index(stripped, ".", -1)
    keyed = linkable_nodes(nodes).select("id", key.alias("key"))
    if alias_dict is None:
        return keyed
    dic = F.broadcast(
        alias_dict.select(
            F.col("surface").alias("key"),
            F.col("canonical_key").alias("_canon"),
        )
    )
    return keyed.join(dic, "key", "left").select(
        "id", F.coalesce("_canon", "key").alias("key")
    )


def link_pairs(keys: DataFrame) -> DataFrame:
    """Same-as pairs (u, v) through each key's min id (star shape)."""
    reps = keys.groupBy("key").agg(F.min("id").alias("rep"))
    return (
        keys.join(reps, "key")
        .filter(F.col("id") != F.col("rep"))
        .select(F.col("rep").alias("u"), F.col("id").alias("v"))
    )


def fuzzy_link_pairs(
    keys: DataFrame, threshold: float = 0.5, n_bands: int = 8
) -> DataFrame:
    """MinHash-LSH candidate blocking over alias KEYS for near-miss
    aliases (typos, morphological variants), scored by the batched
    trigram scorer and thresholded. Output (u, v, score) — feed the
    (u, v) pairs into connected_components alongside the exact pairs.

    Scale shape: signatures are one groupBy over exploded key trigrams;
    banding joins are md5-uniform; the scorer is an Arrow-batched
    mapInPandas stage (the north_star's entity-link scoring stage) —
    at production it swaps for a model endpoint with the same batch
    contract (llm.batch_score handles retries).
    """
    from ..datapipe.dedup import lsh_candidates, minhash_signatures

    distinct_keys = keys.select(F.col("key")).distinct()
    # reuse the document MinHash machinery: key "text" = its char trigrams
    trigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length("key") - 3, F.lit(0))),
        lambda i: F.col("key").substr(i + F.lit(1), F.lit(3)),
    )
    docs_like = distinct_keys.select(
        F.col("key").alias("doc_id"),
        F.concat_ws(" ", trigrams).alias("text"),
    )
    sigs = minhash_signatures(docs_like)
    # default 8 bands x 2 rows: p_match ≈ 1-(1-j^2)^8 (~97% recall at
    # trigram-jaccard 0.6); n_bands=16 (1 row each) is maximally
    # permissive (1-(1-j)^16) — the scorer filters precision either way
    cands = lsh_candidates(sigs, n_bands=n_bands).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    scored = score_link_pairs(cands)
    return scored.filter(F.col("score") >= threshold)


def _trigram_set(col):
    """Distinct character trigrams of a string column, entirely as a
    Spark SQL expression (codegen, no Python). For len < 3 the single
    short prefix is the set — same as {s[i:i+3] for i in
    range(max(len(s)-2, 1))}."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(col) - 3, F.lit(0))),
            lambda i: col.substr(i + F.lit(1), F.lit(3)),
        )
    )


def score_link_pairs(pairs: DataFrame, scorer=None) -> DataFrame:
    """Entity-link scoring stage: character-trigram Jaccard of the two
    keys. Default path is a pure Spark SQL expression
    (array_intersect/array_union over trigram sets — whole-stage
    codegen, no per-row Python). An injected `scorer`
    (pandas batch in -> pandas batch out with columns u, v, score)
    runs via the Arrow-batched llm.batch_score stage instead — the
    production contract for an LLM/model scorer."""
    if scorer is not None:
        from ..llm import batch_score

        return batch_score(
            pairs.select("u", "v"), scorer, "u string, v string, score double"
        )
    tu, tv = _trigram_set(F.col("u")), _trigram_set(F.col("v"))
    union_sz = F.size(F.array_union(tu, tv))
    score = F.when(union_sz == 0, F.lit(1.0)).otherwise(
        F.size(F.array_intersect(tu, tv)) / union_sz
    )
    return pairs.select("u", "v", score.cast("double").alias("score"))


@dataclass
class Canonicalization:
    mapping: DataFrame  # (id, canonical_id) for linkable nodes
    rounds: int
    converged: bool
    _n_rows: int | None = None  # lazily counted, shared by both rewrites

    def broadcast_ok(self) -> bool:
        """One counted size decision shared by canonicalize_edges AND
        canonicalize_nodes. The mapping is persisted (canonical_mapping),
        so the count materializes it once and both rewrites reuse the
        cached partitions — no repeated CC fixpoint recomputation."""
        if self._n_rows is None:
            self._n_rows = self.mapping.count()
        return self._n_rows <= MAX_BROADCAST_MAPPING_ROWS


def canonical_mapping(
    nodes: DataFrame, alias_dict: DataFrame | None = None
) -> Canonicalization:
    keys = link_keys(nodes, alias_dict).persist()
    pairs = link_pairs(keys)
    cc = connected_components(pairs)
    mapping = (
        keys.select("id")
        .join(cc.labels, "id", "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("canonical_id"),
        )
        # persisted: every consumer (size guard, edge rewrite subj+obj
        # sides, node rewrite) would otherwise re-run the CC fixpoint
        .persist()
    )
    return Canonicalization(
        mapping=mapping, rounds=cc.rounds, converged=cc.converged
    )


MAX_BROADCAST_MAPPING_ROWS = 5_000_000  # ~a few hundred MB of id pairs


def _resolve_mapping(mapping, force_broadcast):
    """Accept either a raw mapping DataFrame or a Canonicalization; the
    latter shares one counted broadcast decision across calls."""
    if isinstance(mapping, Canonicalization):
        if force_broadcast is None:
            force_broadcast = mapping.broadcast_ok()
        return mapping.mapping, force_broadcast
    if force_broadcast is None:
        force_broadcast = mapping.count() <= MAX_BROADCAST_MAPPING_ROWS
    return mapping, force_broadcast


def canonicalize_edges(
    edges: DataFrame, mapping, force_broadcast: bool | None = None
) -> DataFrame:
    """Rewrite subj/obj to canonical ids; merge parallel edges.

    The mapping covers only linkable nodes — usually a small fraction
    of the graph — so the rewrite joins broadcast when the mapping is
    small enough; beyond MAX_BROADCAST_MAPPING_ROWS the hint is dropped
    and AQE picks the join strategy (a forced broadcast of a huge
    mapping would OOM executors at 10^12-doc scale). Pass the
    Canonicalization itself (not .mapping) to share one counted size
    decision with canonicalize_nodes.
    weight = sum of merged weights; id recomputed from the triple.
    """
    mapping, force_broadcast = _resolve_mapping(mapping, force_broadcast)
    hint = F.broadcast if force_broadcast else (lambda df: df)
    msub = mapping.select(
        F.col("id").alias("subj"), F.col("canonical_id").alias("_csubj")
    )
    mobj = mapping.select(
        F.col("id").alias("obj"), F.col("canonical_id").alias("_cobj")
    )
    rewritten = (
        edges.join(hint(msub), "subj", "left")
        .join(hint(mobj), "obj", "left")
        .select(
            F.coalesce("_csubj", F.col("subj")).alias("subj"),
            F.col("pred"),
            F.coalesce("_cobj", F.col("obj")).alias("obj"),
            F.col("weight"),
        )
    )
    merged = (
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
    # collapse id collisions exactly as build_edges does (the concat is
    # non-injective under adversarial '->' names): first by triple
    # order. Unique ids are what make the downstream
    # MERGE-by-deterministic-id write idempotent (io.py). A window, not
    # a branch split — one linear id-keyed exchange, no duplicated
    # subtree; the sort within each id group is O(collisions) ≈ 0.
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("subj", "pred", "obj")
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def canonicalize_nodes(
    nodes: DataFrame, mapping, force_broadcast: bool | None = None
) -> DataFrame:
    """Keep one node row per canonical id (the representative's row,
    i.e. the min-id member), non-linkable nodes unchanged.

    Same size-guarded broadcast as canonicalize_edges: above
    MAX_BROADCAST_MAPPING_ROWS the hint is dropped and AQE picks the
    strategy — a forced broadcast of a 10^9-row mapping OOMs executors.
    Pass the Canonicalization itself to share one counted decision.
    """
    mapping, force_broadcast = _resolve_mapping(mapping, force_broadcast)
    hint = F.broadcast if force_broadcast else (lambda df: df)
    with_canon = nodes.join(
        hint(mapping), "id", "left"
    ).withColumn("canonical_id", F.coalesce("canonical_id", F.col("id")))
    keep = with_canon.filter(F.col("id") == F.col("canonical_id")).drop(
        "canonical_id"
    )
    return keep
