"""Connected components over a DataFrame edge list — the
canonicalization core (SURVEY.md §2.3 G10; no reference analog: the
reference links by exact id equality only, our BASELINE north_star
requires alias canonicalization at 10^12-doc scale).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014; see also
PAPERS.md BTS/ICDE-2024 for load-balanced variants) expressed as
DataFrame self-joins:

  large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
  small-star(u): over N≤(u) = {v ∈ N(u): v ≤ u}:
                 m = min(N≤(u) ∪ {u}); emit (v, m) for v ∈ N≤(u) ∪ {u}

Alternate until the edge set reaches a fixpoint: every edge then points
directly at its component's minimum id (a star), giving the label map.
Convergence is O(log n) rounds; each round is two shuffles (groupBy u +
join back). `localCheckpoint` truncates lineage per round; a
convergence counter is exposed for the checkpoint/metrics table.

Determinism: component representative = lexicographic min id — stable
under repartitioning and across engines.

Skew note: hub nodes (high degree) concentrate one groupBy key; rounds
after the first shrink neighborhoods toward stars, and AQE skew-join
handles the transient hot keys. For adversarial hubs the caller can
pre-salt via `salt_hot_keys` (operators/skew.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    e = edges.select(F.col("u").cast("string"), F.col("v").cast("string"))
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(sym: DataFrame) -> DataFrame:
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # operate on edges oriented (u, v) with v <= u
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    neigh = (
        e.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfp = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        neigh.unionByName(selfp)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


@dataclass
class CCResult:
    labels: DataFrame  # (id, component) — component = min id, incl. self rows
    rounds: int
    converged: bool
    round_edge_counts: list[int] = field(default_factory=list)


def connected_components(
    pairs: DataFrame, max_rounds: int = 25
) -> CCResult:
    """pairs: DataFrame with columns (u, v) — undirected same-as edges.

    Returns the label map for every id appearing in `pairs` (callers
    union in singleton self-labels for isolated vertices).
    """
    vertices = (
        pairs.select(F.col("u").cast("string").alias("id"))
        .unionByName(pairs.select(F.col("v").cast("string").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = _sym(pairs).localCheckpoint(eager=True)
    rounds = 0
    converged = False
    counts: list[int] = []
    prev_sig = None
    while rounds < max_rounds:
        e = _small_star(_large_star(_sym(e))).localCheckpoint(eager=True)
        rounds += 1
        # fixpoint signature: (edge count, xor-ish hash of the edge set)
        sig = e.select(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        counts.append(sig[0])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    # after convergence every edge is (member, root); roots label themselves
    member_labels = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    labels = (
        vertices.join(member_labels, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
        # a vertex may transiently hold >1 label edge; min is the root
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return CCResult(labels=labels, rounds=rounds, converged=converged,
                    round_edge_counts=counts)
