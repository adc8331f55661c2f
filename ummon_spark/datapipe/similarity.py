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


def hyperplane_signs(
    embeddings: DataFrame, n_planes: int = 8, dim: int | None = None
) -> DataFrame:
    """(vec_id, q, bucket): sign bits of projections onto the
    plane_weights hyperplanes (random-hyperplane LSH for cosine)."""
    q = quantized(embeddings)
    if dim is None:
        dim = q.select(F.size("q").alias("d")).first()["d"]
    planes = plane_weights(dim, n_planes)
    bits = []
    for p in range(n_planes):
        w = F.array(*[F.lit(v).cast("bigint") for v in planes[p]])
        proj = F.aggregate(
            F.zip_with(F.col("q"), w, lambda x, s: x * s),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return q.select("vec_id", "q", bucket.cast("bigint").alias("bucket"))


def lsh_topk_cosine(
    embeddings: DataFrame, query_vec_id: int, k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket or
    any 1-bit-flip neighbor bucket (multi-probe)."""
    signed = hyperplane_signs(embeddings, n_planes).persist()
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


def cosine_near_duplicates(
    embeddings: DataFrame, threshold_milli: int = 950, n_planes: int = 8
) -> DataFrame:
    """Embedding near-dup pairs: same LSH bucket, quantized cosine
    >= t = threshold_milli/1000. Condition (dot > 0):
      (dot*1.0)*(dot*1.0) >= t*t * ((na2*1.0)*(nb2*1.0))
    evaluated in double with this exact association so the oracle SQL
    reproduces it bit-for-bit. Output ints (a, b, dot, na2, nb2)."""
    signed = hyperplane_signs(embeddings, n_planes)
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
