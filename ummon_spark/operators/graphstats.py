"""Graph statistics: triangle counting and common-neighbor link
prediction over the knowledge graph.

Neither exists in the reference (its analytics stop at degree/count,
src/db.rs:791-895) — these are the standard KG-health/link-prediction
operators a production graph pipeline adds on top: triangle counts
feed clustering-coefficient quality metrics; common-neighbor/Jaccard
scores are the classic cheap link-prediction baseline.

Both operate on the edge relation as an UNDIRECTED SIMPLE graph:
predicates are ignored, self-loops dropped, parallel edges collapsed
to one `(a, b)` pair with `a < b`.

Scale shapes (the 100 TB story):

* `triangle_counts` uses DEGREE ORIENTATION: every undirected edge is
  oriented from its lower-(degree, id) endpoint to the higher one, so
  each node's oriented out-degree is O(sqrt(m)) on any graph — the
  wedge join (the quadratic hazard of naive triangle enumeration on a
  hub) is bounded by sum(out_deg^2) <= m^(3/2) instead of
  sum(deg^2) ~ m * max_hub_degree. Three hash joins total, each on
  edge-pair keys; AQE skew-join handles residual imbalance.
* `common_neighbors` enumerates wedges THROUGH each node, which is
  inherently quadratic in the wedge center's degree — exactly like
  LSH bucket pair-listing, so it takes the same guard: centers with
  degree > `max_center_degree` are excluded (hubs connect everything
  to everything; their wedge pairs are noise for link prediction, and
  at 1e6-degree hubs they are also 1e12 rows). The cap is part of the
  operator's semantics and is mirrored by the oracle.

All outputs are bigint-exact (counts, and Jaccard scaled by
`JACCARD_SCALE` via integer division) so Spark and the DuckDB oracle
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JACCARD_SCALE = 1_000_000
DEFAULT_MAX_CENTER_DEGREE = 64


def undirected_simple(edges: DataFrame) -> DataFrame:
    """Edge relation -> undirected simple graph: (a, b) with a < b,
    self-loops dropped, predicates and duplicates collapsed. One
    projection + one distinct (single shuffle)."""
    return (
        edges.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _undirected_degree(und: DataFrame) -> DataFrame:
    """(id, deg) over the undirected simple graph — one explode + one
    hash agg with map-side partials (same shape as traversal.degree)."""
    return (
        und.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(id, triangles): how many triangles each node participates in.
    Nodes in no triangle are omitted (join back against nodes for a
    zero-filled variant).

    Degree-oriented enumeration: orient each undirected edge from the
    endpoint with smaller (deg, id) to the larger; every triangle
    {u, v, w} then has exactly ONE "apex" whose two oriented out-edges
    reach the other two, so the wedge join (o1.src = o2.src) followed
    by the closing-edge semi-join counts each triangle once. Out-degree
    under this orientation is <= O(sqrt(m)), which is what keeps the
    wedge join linear-ish on power-law graphs where a naive neighbor
    self-join explodes on hubs.
    """
    # und feeds three plan branches (degree, orientation, closing-edge
    # probe) and deg two — lazy localCheckpoint materializes each ONCE
    # instead of re-running the distinct/agg per branch (plan audit
    # showed 38 exchanges without it).
    # r6 note: an int64-surrogate variant (translate ids once, run the
    # wedge/closing joins on longs, translate back) was implemented and
    # A/B-measured at x20 and x40 replication — neutral to slightly
    # worse both times (the extra translated-edge materialization and
    # the final join-back cost what the narrower shuffles saved), so
    # the string-keyed formulation stays.
    und = undirected_simple(edges).localCheckpoint(eager=False)
    deg = _undirected_degree(und).localCheckpoint(eager=False)

    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))
            )
            .alias("e")
        )
        .select("e.src", "e.dst")
    )

    o1 = oriented.select(F.col("src"), F.col("dst").alias("v"))
    o2 = oriented.select(F.col("src"), F.col("dst").alias("w"))
    # each unordered {v, w} wedge once per apex
    wedges = o1.join(o2, "src").filter(F.col("v") < F.col("w"))
    closing = und.select(F.col("a").alias("v"), F.col("b").alias("w"))
    triangles = wedges.join(closing, ["v", "w"])  # (src, v, w) per triangle

    return (
        triangles.select(
            F.explode(F.array("src", "v", "w")).alias("id")
        )
        .groupBy("id")
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )


def common_neighbors(
    edges: DataFrame,
    max_center_degree: int = DEFAULT_MAX_CENTER_DEGREE,
    min_common: int = 1,
) -> DataFrame:
    """Link-prediction scores for NON-adjacent node pairs:
    (a, b, n_common, jaccard_scaled) where n_common is the shared
    undirected-neighbor count and jaccard_scaled =
    floor(JACCARD_SCALE * |N(a) ∩ N(b)| / |N(a) ∪ N(b)|) — bigint
    everywhere, so the DuckDB oracle matches exactly.

    Wedge centers with degree > max_center_degree are excluded (see
    module docstring — the hub guard is part of the semantics).
    Already-adjacent pairs are anti-joined out: the operator proposes
    NEW edges, it doesn't re-score existing ones.
    """
    # same reuse story as triangle_counts: und feeds the neighbor
    # lists, the anti-join and (via deg) the Jaccard denominator
    und = undirected_simple(edges).localCheckpoint(eager=False)
    deg = _undirected_degree(und).localCheckpoint(eager=False)

    nbrs = und.select(
        F.col("a").alias("center"), F.col("b").alias("nbr")
    ).union(und.select(F.col("b").alias("center"), F.col("a").alias("nbr")))
    small = deg.filter(F.col("deg") <= max_center_degree).select(
        F.col("id").alias("center")
    )
    nbrs = nbrs.join(small, "center")

    n1 = nbrs.select("center", F.col("nbr").alias("a"))
    n2 = nbrs.select("center", F.col("nbr").alias("b"))
    pairs = (
        n1.join(n2, "center")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    # drop pairs that are already edges
    pairs = pairs.join(und, ["a", "b"], "left_anti")

    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "n_common",
            F.expr(
                f"CAST({JACCARD_SCALE} * n_common AS BIGINT)"
                " DIV (deg_a + deg_b - n_common)"
            ).alias("jaccard_scaled"),
        )
    )


PAGERANK_SCALE = 1_000_000
PAGERANK_ITERS = 5
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """(id, score): integer-exact PageRank after `n_iters` synchronous
    iterations over the DISTINCT directed (subj, obj) pairs (parallel
    predicates collapse; self-loops kept).

    Exact-arithmetic variant: scores are bigints scaled by `scale`,
    damping 0.85 is the rational 85/100, and each edge contribution is
    floor((85 * score) / (100 * outdeg)) — so Spark and the DuckDB
    oracle (the same recurrence unrolled into chained CTEs — no
    WITH RECURSIVE, whose UNION-semantics quirk is a known parity
    trap) agree bit-for-bit, and the bigint SUM is order-independent
    where a float PageRank would drift with accumulation order.
    Dangling-node mass evaporates (the common simplification); scores
    are unnormalized importances, score0 = scale.

    Scale shape (reworked in the r6 optimization round — same recurrence,
    same bit-exact output, cheaper plan):

    * The per-node id set and outdeg are INVARIANT across iterations, so
      they live in one static `(id, outdeg)` frame materialized once
      (lazy localCheckpoint) instead of being re-derived per round.
      Because each iteration then references the previous score vector
      exactly ONCE (the old formulation read it twice — contribution
      join + id-set projection — which is why it needed a per-round
      localCheckpoint to stop 2^n plan blowup), the whole n_iters
      recurrence is a single linear-lineage query: no per-round
      materialization barriers, and Spark's ReuseExchange serves the
      static edge/id sides to every iteration from one shuffle.
    * The damping contribution floor((85*score)/(100*outdeg)) is
      computed once per SOURCE NODE, not once per edge (it is constant
      across a node's out-edges), so the per-iteration edge join
      carries one narrow (subj, c) pair per node and the only
      per-iteration full shuffle is the map-side-combinable sum by obj.
    * Overflow: total mass <= n_nodes * scale, so bigint holds to
      ~1e12 nodes at the default scale.
    """
    pairs = edges.select("subj", "obj").distinct().localCheckpoint(eager=False)
    outdeg = pairs.groupBy("subj").agg(F.count("*").alias("outdeg"))
    # static (id, outdeg) frame: outdeg is null for sink nodes
    ids = (
        nodes.select("id")
        .join(outdeg.select(F.col("subj").alias("id"), "outdeg"), "id", "left")
        .localCheckpoint(eager=False)
    )

    base = (scale * (_DAMP_DEN - _DAMP_NUM)) // _DAMP_DEN
    scores = ids.select(
        "id", "outdeg", F.lit(scale).cast("bigint").alias("score")
    )
    for _ in range(n_iters):
        # per-node contribution (only source nodes emit mass); the
        # filter is an optimization — non-source rows would drop in the
        # inner join against the edge list anyway
        c = scores.filter(F.col("outdeg").isNotNull()).select(
            F.col("id").alias("subj"),
            F.expr(f"({_DAMP_NUM} * score) DIV ({_DAMP_DEN} * outdeg)").alias(
                "c"
            ),
        )
        contrib = (
            pairs.join(c, "subj")
            .groupBy("obj")
            .agg(F.sum("c").alias("contrib"))
        )
        scores = ids.join(
            contrib.select(F.col("obj").alias("id"), "contrib"), "id", "left"
        ).select(
            "id",
            "outdeg",
            (F.lit(base) + F.coalesce(F.col("contrib"), F.lit(0)))
            .cast("bigint")
            .alias("score"),
        )
    return scores.select("id", "score")


def pagerank_oracle_ctes(
    n_iters: int = PAGERANK_ITERS, scale: int = PAGERANK_SCALE
) -> tuple[str, str]:
    """DuckDB twin of `pagerank`: (ctes, body) to compose after the
    graph CTEs (which provide `edges` and `all_nodes`) — the
    recurrence unrolled into one chained CTE per iteration."""
    # AS MATERIALIZED is load-bearing: each pgr_t is referenced twice
    # by pgr_{t+1}, and DuckDB inlines multiply-referenced CTEs by
    # default — without the hint the whole graph derivation re-runs
    # 2^n_iters times (measured 353 s vs <1 s at sf0.001)
    base = (scale * (_DAMP_DEN - _DAMP_NUM)) // _DAMP_DEN
    ctes = [
        "pgr_e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges)",
        "pgr_o AS MATERIALIZED "
        "(SELECT subj, COUNT(*) AS outdeg FROM pgr_e GROUP BY subj)",
        f"pgr_0 AS MATERIALIZED "
        f"(SELECT id, CAST({scale} AS BIGINT) AS score FROM all_nodes)",
    ]
    for t in range(n_iters):
        ctes.append(
            f"""pgr_{t + 1} AS MATERIALIZED (
  SELECT b.id,
         CAST({base} + COALESCE(c.contrib, 0) AS BIGINT) AS score
  FROM pgr_{t} b LEFT JOIN (
    SELECT e.obj AS id,
           SUM(({_DAMP_NUM} * p.score) // ({_DAMP_DEN} * o.outdeg)) AS contrib
    FROM pgr_{t} p
    JOIN pgr_e e ON e.subj = p.id
    JOIN pgr_o o ON o.subj = p.id
    GROUP BY e.obj
  ) c ON c.id = b.id
)"""
        )
    return ",\n".join(ctes), f"SELECT id, score FROM pgr_{n_iters}"


def common_neighbors_topk(
    edges: DataFrame,
    k: int = 100,
    max_center_degree: int = DEFAULT_MAX_CENTER_DEGREE,
) -> DataFrame:
    """Top-k predicted links by (jaccard_scaled desc, n_common desc,
    a asc, b asc) with a bigint rank — the gate/report surface. The
    global order-by-limit lowers to TakeOrderedAndProject (per-partition
    top-k then a k-row merge on the driver side of the exchange — no
    single-task sort of the full pair set); the rank window then runs
    over k rows only."""
    from pyspark.sql import Window

    top = (
        common_neighbors(edges, max_center_degree=max_center_degree)
        .orderBy(
            F.col("jaccard_scaled").desc(),
            F.col("n_common").desc(),
            F.col("a").asc(),
            F.col("b").asc(),
        )
        .limit(k)
    )
    w = Window.orderBy(
        F.col("jaccard_scaled").desc(),
        F.col("n_common").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    )
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))
