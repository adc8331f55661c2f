"""Similarity search over an embedding column (array<float>).

Two paths:

* `topk_cosine` — brute-force exact top-k: quantized integer dot
  products (embedding * 1000 rounded to int64) so scores are exact and
  engine-independent; ranking totally ordered by (dot, vec_id). The
  correctness baseline.
* `lsh_topk_cosine` — the scale path: random-hyperplane signs bucket
  vectors (signed projections onto md5-derived pseudo-random axes);
  top-k is computed within the query's bucket ± 1-bit neighbors. At
  10^9+ vectors this turns the all-pairs scan into a bucket-local one;
  recall is tunable via n_planes/probes.
* `cosine_near_duplicates` — embedding near-dup pairs above an integer
  threshold on the quantized cosine numerator (dedup by semantics).

Float cosine (`topk_cosine_float`) is also provided for real use;
gate comparisons use the quantized-int variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col) -> Column:
    """array<float> -> array<bigint>, x -> round(x*1000)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000, 0).cast("bigint"))


def quantized(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _quantize(F.col("embedding")).alias("q"),
    )


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def topk_cosine(
    embeddings: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors of one vector by quantized dot product.

    The query row broadcasts (one row); the scan is narrow — at scale
    this is a single pass over the vectors with a top-k aggregation
    (TakeOrderedAndProject), no shuffle of the full table.
    """
    q = quantized(embeddings)
    query = q.filter(F.col("vec_id") == query_vec_id).select(
        F.col("q").alias("qq")
    )
    scored = (
        q.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(query))
        .select("vec_id", _dot(F.col("q"), F.col("qq")).alias("dot"))
    )
    return scored.orderBy(F.col("dot").desc(), F.col("vec_id")).limit(k)


def topk_cosine_float(
    embeddings: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Float cosine variant (real-use path)."""
    e = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    query = e.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return (
        e.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            (dot / (norm(F.col("v")) * norm(F.col("qv")))).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


DEFAULT_N_PLANES = 8
TARGET_BUCKET_ROWS = 1024


def auto_plane_count(n_vectors: int, target_bucket_rows: int = TARGET_BUCKET_ROWS) -> int:
    """Bits per bucket key, scaled to corpus size: 2^bits buckets keeps
    the expected bucket occupancy near target_bucket_rows, so the
    within-bucket candidate join stays bounded as the corpus grows
    (the fixed-2^8-bucket scheme goes quadratic at 10^9 vectors:
    ~4M rows/bucket). 10^6 vecs -> 10 bits; 10^9 -> 20 bits; 10^12 ->
    30 bits."""
    import math

    if n_vectors <= target_bucket_rows:
        return DEFAULT_N_PLANES
    return max(DEFAULT_N_PLANES, math.ceil(math.log2(n_vectors / target_bucket_rows)))


def plane_weights(dim: int, n_planes: int = 8) -> list[list[int]]:
    """+-1 weight matrix for the pseudo-random hyperplanes, derived
    from md5 parity — the single source of truth shared with the
    DuckDB oracle (oracle embeds these as literals)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{p}|{i}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def _sign_bits(planes: list[list[int]]) -> list:
    """0/1 sign bit per hyperplane for the quantized column `q`."""
    bits = []
    for row in planes:
        w = F.array(*[F.lit(v).cast("bigint") for v in row])
        proj = F.aggregate(
            F.zip_with(F.col("q"), w, lambda x, s: x * s),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def _infer_dim(q: DataFrame) -> int:
    # one driver hop on a 1-row limit — callers that know the dimension
    # (the gate passes it) skip this entirely
    return q.select(F.size("q").alias("d")).limit(1).first()["d"]


def hyperplane_signs(
    embeddings: DataFrame, n_planes: int = 8, dim: int | None = None
) -> DataFrame:
    """(vec_id, q, bucket): sign bits of projections onto the
    plane_weights hyperplanes (random-hyperplane LSH for cosine)."""
    q = quantized(embeddings)
    if dim is None:
        dim = _infer_dim(q)
    bits = _sign_bits(plane_weights(dim, n_planes))
    bucket = bits[0] * 1
    for p in range(1, n_planes):
        bucket = bucket + bits[p] * (1 << p)
    return q.select("vec_id", "q", bucket.cast("bigint").alias("bucket"))


def banded_hyperplane_signs(
    embeddings: DataFrame,
    n_bands: int,
    bits_per_band: int,
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, band, bucket): minhash-style banding of the hyperplane
    signature — n_bands independent bucket keys of bits_per_band sign
    bits each. A pair is a candidate if ANY band bucket matches, so
    recall stays high while bits_per_band (from auto_plane_count) keeps
    per-band bucket occupancy bounded as the corpus grows."""
    q = quantized(embeddings)
    if dim is None:
        dim = _infer_dim(q)
    bits = _sign_bits(plane_weights(dim, n_bands * bits_per_band))
    band_structs = []
    for j in range(n_bands):
        bucket = F.lit(0)
        for p in range(bits_per_band):
            bucket = bucket + bits[j * bits_per_band + p] * (1 << p)
        band_structs.append(
            F.struct(
                F.lit(j).alias("band"), bucket.cast("bigint").alias("bucket")
            )
        )
    return q.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("vec_id", "bb.band", "bb.bucket")


def lsh_topk_cosine(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int | None = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket or
    any 1-bit-flip neighbor bucket (multi-probe). n_planes=None scales
    the bucket count with the corpus (auto_plane_count), keeping the
    bucket-local scan bounded at 10^9+ vectors."""
    if n_planes is None:
        n_planes = auto_plane_count(embeddings.count())
    # persisted for the lifetime of the returned (lazy) result, which
    # reads it twice (query row + candidate scan); released by the
    # ContextCleaner when the caller drops the frame — an in-operator
    # unpersist would force the signing pass to run twice instead.
    signed = hyperplane_signs(embeddings, n_planes, dim=dim).persist()
    qrow = signed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("q").alias("qq"), F.col("bucket").alias("qb")
    )
    probes = F.array(
        F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    cands = (
        signed.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qrow.select("qq", "qb", probes.alias("probes"))))
        .filter(F.array_contains(F.col("probes"), F.col("bucket")))
    )
    return (
        cands.select("vec_id", _dot(F.col("q"), F.col("qq")).alias("dot"))
        .orderBy(F.col("dot").desc(), F.col("vec_id"))
        .limit(k)
    )


def _verify_cosine_pairs(
    pairs: DataFrame, q: DataFrame, threshold_milli: int
) -> DataFrame:
    """Exact quantized-cosine check for candidate (a, b) pairs.
    Condition (dot > 0):
      (dot*1.0)*(dot*1.0) >= t*t * ((na2*1.0)*(nb2*1.0))
    evaluated in double with this exact association so the oracle SQL
    reproduces it bit-for-bit. Output ints (a, b, dot, na2, nb2)."""
    qa = q.select(F.col("vec_id").alias("a"), F.col("q").alias("qa"))
    qb = q.select(F.col("vec_id").alias("b"), F.col("q").alias("qb"))
    joined = pairs.join(qa, "a").join(qb, "b")
    dot = _dot(F.col("qa"), F.col("qb"))
    na2 = _dot(F.col("qa"), F.col("qa"))
    nb2 = _dot(F.col("qb"), F.col("qb"))
    t2 = (threshold_milli / 1000.0) ** 2
    d = F.col("dot").cast("double")
    cond = (F.col("dot") > 0) & (
        d * d >= F.lit(t2) * (F.col("na2").cast("double") * F.col("nb2").cast("double"))
    )
    return joined.select(
        "a", "b", dot.alias("dot"), na2.alias("na2"), nb2.alias("nb2")
    ).filter(cond)


IVF_CENTROIDS = 16
IVF_PROBES = 4
MAX_IVF_CENTROIDS = 65_536


def auto_centroid_count(n_vectors: int) -> int:
    """IVF centroid count scaled to the corpus: ~sqrt(n) (the standard
    FAISS sizing), floored at IVF_CENTROIDS and capped at 2^16 — the
    assignment pass computes n x C dot products, so C must grow slower
    than n; at 10^9 vectors C=31623 keeps inverted lists ~31k rows and
    the assignment ~3*10^13 int-dot terms, spread across executors as
    one narrow broadcast-join pass."""
    c = int(max(n_vectors, 1) ** 0.5)
    return min(max(IVF_CENTROIDS, c), MAX_IVF_CENTROIDS)


def ivf_assignments(
    embeddings: DataFrame, n_centroids: int | None = IVF_CENTROIDS
) -> DataFrame:
    """(vec_id, q, centroid): IVF coarse quantizer. Centroids are the
    quantized vectors of the n_centroids smallest vec_ids — a
    deterministic, SQL-expressible seeding (k-means would converge to
    data-dependent centroids; the INDEX STRUCTURE — inverted lists
    probed by nearest-centroid — is what matters for the scale shape,
    and the seeding rule is swappable). Assignment = argmax quantized
    dot product, ties to the smallest centroid id.

    Scale shape: the centroid table is n_centroids rows (broadcast);
    assignment is one narrow pass; the downstream search scans only the
    probed inverted lists, each ~n/n_centroids rows. n_centroids=None
    scales C ~ sqrt(n) (auto_centroid_count) so lists stay bounded as
    the corpus grows."""
    if n_centroids is None:
        n_centroids = auto_centroid_count(embeddings.count())
    q = quantized(embeddings)
    cents = q.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    scored = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cid", _dot(F.col("q"), F.col("cq")).alias("cdot")
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(F.struct("q", "cid"), F.struct(F.col("cdot"), -F.col("cid"))).alias(
            "_b"
        )
    )
    return best.select(
        "vec_id", F.col("_b.q").alias("q"), F.col("_b.cid").alias("centroid")
    )


def ivf_topk_cosine(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int | None = IVF_CENTROIDS,
    n_probe: int = IVF_PROBES,
) -> DataFrame:
    """IVF approximate top-k: scan only the inverted lists of the
    n_probe centroids nearest to the query (by quantized dot, ties to
    smaller cid), rank candidates by exact quantized dot. The scan
    touches ~n * n_probe / n_centroids rows instead of n;
    n_centroids=None scales C ~ sqrt(n)."""
    if n_centroids is None:
        n_centroids = auto_centroid_count(embeddings.count())
    # persisted for the returned result's lifetime (read three times:
    # query row, centroid slice, candidate scan); see lsh_topk_cosine.
    assigned = ivf_assignments(embeddings, n_centroids).persist()
    qrow = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("q").alias("qq")
    )
    cents = assigned.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    probes = (
        cents.crossJoin(F.broadcast(qrow))
        .select("cid", _dot(F.col("cq"), F.col("qq")).alias("cdot"))
        .orderBy(F.col("cdot").desc(), F.col("cid"))
        .limit(n_probe)
        .select("cid")
    )
    cands = (
        assigned.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(probes), assigned.centroid == F.col("cid"), "left_semi")
        .crossJoin(F.broadcast(qrow))
    )
    return (
        cands.select("vec_id", _dot(F.col("q"), F.col("qq")).alias("dot"))
        .orderBy(F.col("dot").desc(), F.col("vec_id"))
        .limit(k)
    )


KMEANS_K = 8
KMEANS_ITERS = 2


def _kmeans_assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, q, cluster, cdot): nearest centroid by quantized dot
    (spherical k-means assignment), ties to the smaller cluster id.
    The centroid table is k rows — always broadcast."""
    scored = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cid", _dot(F.col("q"), F.col("cq")).alias("cdot")
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("q", "cid", "cdot"), F.struct(F.col("cdot"), -F.col("cid"))
        ).alias("_b")
    )
    return best.select(
        "vec_id",
        F.col("_b.q").alias("q"),
        F.col("_b.cid").alias("cluster"),
        F.col("_b.cdot").alias("cdot"),
    )


def kmeans_clusters(
    embeddings: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """(vec_id, cluster, cdot): spherical k-means over quantized
    embeddings — Lloyd iterations with INTEGER arithmetic only, so the
    result is bit-identical across engines and runs:

    * init: centroids = quantized vectors of the k smallest vec_ids
      (deterministic, SQL-expressible — same seeding rule as IVF)
    * assignment: argmax quantized dot (ties -> smaller cluster id)
    * update: element-wise integer mean, SUM(val) DIV COUNT(*) per
      dimension (truncation toward zero — DuckDB's integer `//`
      matches Spark's DIV exactly, floor division would not)

    Scale shape: each iteration is ONE narrow assignment pass (k-row
    centroid table broadcast, map-side) plus ONE aggregation keyed by
    (cluster, dim) — the posexplode widens rows 64x but partial
    (map-side) aggregation reduces the shuffle to k * dim * partitions
    rows. iters is a small constant (SemDeDup-style curation needs
    stable clusters, not convergence). At 10^9+ vectors pick
    k ~ n/1024 so downstream within-cluster scans stay bounded."""
    q = quantized(embeddings)
    if iters > 0:
        # persisted for the returned result's lifetime: every Lloyd
        # iteration and the final assignment re-read q; see
        # lsh_topk_cosine for the release story.
        q = q.persist()
    cents = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    for _ in range(iters):
        assigned = _kmeans_assign(q, cents)
        per_dim = assigned.select(
            "cluster", F.posexplode("q").alias("dim", "val")
        ).groupBy("cluster", "dim").agg(
            F.sum("val").alias("s"), F.count("*").alias("n")
        )
        cents = (
            per_dim.select(
                "cluster", "dim", F.expr("s DIV n").cast("bigint").alias("v")
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "v"))),
                    lambda s: s["v"],
                ).alias("cq")
            )
            .select(F.col("cluster").alias("cid"), "cq")
        )
    return _kmeans_assign(q, cents).select("vec_id", "cluster", "cdot")


def semantic_near_dups(
    embeddings: DataFrame,
    threshold_milli: int = 950,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """(a, b, dot, na2, nb2): SemDeDup-shaped semantic dedup —
    candidate pairs come from the SAME k-means cluster, then pass the
    exact quantized-cosine threshold. Complements the hyperplane-LSH
    near-dup path: clusters follow the data distribution (a dense
    semantic region becomes its own candidate pool) where fixed random
    hyperplanes cut it arbitrarily.

    Scale shape: the pair join is keyed by cluster id — with
    k ~ n/1024 each cluster's all-pairs stays ~10^6 comparisons, and
    the verify is the shared integer-exact kernel. Survivor selection
    (keep-first) plugs into dedup.dedup_survivors unchanged."""
    assigned = kmeans_clusters(embeddings, k, iters)
    a = assigned.select(F.col("vec_id").alias("a"), F.col("cluster"))
    b = assigned.select(F.col("vec_id").alias("b"), F.col("cluster"))
    pairs = a.join(b, "cluster").filter(F.col("a") < F.col("b")).select("a", "b")
    return _verify_cosine_pairs(pairs, quantized(embeddings), threshold_milli)


def cosine_near_duplicates(
    embeddings: DataFrame,
    threshold_milli: int = 950,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: same LSH bucket, quantized cosine
    >= threshold_milli/1000 (see _verify_cosine_pairs for the exact
    float condition). Single-bucket scheme — the gate/oracle path.
    For corpora where 2^n_planes buckets would go quadratic, use
    cosine_near_duplicates_banded (bits scale with corpus size)."""
    signed = hyperplane_signs(embeddings, n_planes, dim=dim)
    left = signed.select(
        F.col("vec_id").alias("a"), F.col("q").alias("qa"), "bucket"
    )
    right = signed.select(
        F.col("vec_id").alias("b"), F.col("q").alias("qb"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("a") < F.col("b"))
    dot = _dot(F.col("qa"), F.col("qb"))
    na2 = _dot(F.col("qa"), F.col("qa"))
    nb2 = _dot(F.col("qb"), F.col("qb"))
    t2 = (threshold_milli / 1000.0) ** 2
    d = F.col("dot").cast("double")
    cond = (F.col("dot") > 0) & (
        d * d >= F.lit(t2) * (F.col("na2").cast("double") * F.col("nb2").cast("double"))
    )
    return pairs.select(
        "a", "b", dot.alias("dot"), na2.alias("na2"), nb2.alias("nb2")
    ).filter(cond)


def cosine_near_duplicates_banded(
    embeddings: DataFrame,
    threshold_milli: int = 950,
    n_bands: int = 4,
    bits_per_band: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """The 100 TB-scale embedding near-dup path: minhash-style banding
    of the hyperplane signature. bits_per_band defaults to
    auto_plane_count(n_vectors) so per-band bucket occupancy stays
    ~TARGET_BUCKET_ROWS no matter the corpus size; a pair is a
    candidate if any of n_bands band keys matches, which keeps recall
    high where a single wide bucket key would shatter true pairs.

    Bucket math (BENCH.md): at 10^9 vectors bits_per_band=20 ->
    ~10^3 rows/band-bucket -> ~5*10^5 within-bucket pairs per bucket,
    linear in corpus at fixed occupancy; the exact-cosine verify then
    filters candidates. P(candidate | cosine=c) = 1-(1-(1-θ/π)^bits)^bands.
    """
    q = quantized(embeddings)
    if bits_per_band is None:
        bits_per_band = auto_plane_count(embeddings.count())
    signed = banded_hyperplane_signs(embeddings, n_bands, bits_per_band, dim=dim)
    left = signed.select(F.col("vec_id").alias("a"), "band", "bucket")
    right = signed.select(F.col("vec_id").alias("b"), "band", "bucket")
    cands = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return _verify_cosine_pairs(cands, q, threshold_milli)


KNN_K = 5
KNN_MAX_EXACT = 2_000


def knn_graph(
    embeddings: DataFrame,
    k: int = KNN_K,
    exact: bool = True,
    max_exact: int = KNN_MAX_EXACT,
    n_bands: int | None = None,
    bits_per_band: int | None = None,
) -> DataFrame:
    """(src, nbr, dot, rank): the directed k-nearest-neighbor graph
    over the embedding table by cosine — the building block of
    graph-based dedup/cluster pipelines (SemDeDup neighborhoods,
    connected-component near-dup groups, kNN-classifier labeling).

    Ranking is integer-exact: per source the norm |a| is constant, so
    cosine order == order of sign(dot) * floor(dot^2 / |b|^2) — all
    bigint (quantized vectors), no sqrt, so Spark and the DuckDB
    oracle agree bit-for-bit. Ties break on nbr ascending. Zero-norm
    vectors are excluded (cosine undefined). Overflow: dot^2 <=
    (dim * quant^2)^2 — fine to dim ~1e3 at the default 1e3
    quantization; drop the quantization scale for wider vectors.

    exact=True is the verification tool: a full self-join, guarded to
    `max_exact` vectors (quadratic — same policy as ngram_jaccard).
    exact=False is the scale path: banded random-hyperplane LSH
    candidates (any-band match, bucket occupancy bounded by
    auto_plane_count's sizing), then the same per-source top-k — an
    APPROXIMATE kNN graph whose recall grows with n_bands; each
    source's window sees only its bucket-mates, never the corpus.
    """
    from pyspark.sql import Window

    q = quantized(embeddings)
    if exact:
        n = q.count()
        if n > max_exact:
            raise ValueError(
                f"exact knn_graph is quadratic: {n} vectors > max_exact="
                f"{max_exact}; use exact=False (banded LSH candidates)"
            )
        cands = (
            q.select(F.col("vec_id").alias("src"), F.col("q").alias("qa"))
            .join(
                q.select(F.col("vec_id").alias("nbr"), F.col("q").alias("qb")),
                F.col("src") != F.col("nbr"),
            )
        )
    else:
        if n_bands is None or bits_per_band is None:
            n = q.count()
            bits_per_band = bits_per_band or auto_plane_count(n)
            n_bands = n_bands or 4
        bands = banded_hyperplane_signs(
            embeddings, n_bands, bits_per_band
        )
        pairs = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") != F.col("y.vec_id")),
            )
            .select(
                F.col("x.vec_id").alias("src"), F.col("y.vec_id").alias("nbr")
            )
            .distinct()
        )
        cands = (
            pairs.join(
                q.select(F.col("vec_id").alias("src"), F.col("q").alias("qa")),
                "src",
            )
            .join(
                q.select(F.col("vec_id").alias("nbr"), F.col("q").alias("qb")),
                "nbr",
            )
        )
    scored = cands.select(
        "src",
        "nbr",
        _dot(F.col("qa"), F.col("qb")).alias("dot"),
        _dot(F.col("qb"), F.col("qb")).alias("nb2"),
    ).filter(F.col("nb2") > 0)
    rkey = F.when(
        F.col("dot") >= 0, F.expr("(dot * dot) DIV nb2")
    ).otherwise(-F.expr("(dot * dot) DIV nb2"))
    w = Window.partitionBy("src").orderBy(
        rkey.desc(), F.col("nbr").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("src", "nbr", F.col("dot").cast("bigint").alias("dot"), "rank")
    )
