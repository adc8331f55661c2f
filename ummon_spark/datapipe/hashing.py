"""Cross-engine deterministic hashing primitives.

Every hash here is derived from md5 so the DuckDB oracle computes
bit-identical values (Spark's xxhash64/hash are engine-specific):

  h_k(s) = int64( first 8 hex chars of md5(s || '|' || k) )

Spark:  conv(substr(md5(concat(s,'|',k)), 1, 8), 16, 10)::bigint
DuckDB: CAST(concat('0x', substr(md5(s||'|'||k), 1, 8)) AS BIGINT)

32-bit range keeps sums/mins far from overflow. Good enough spread for
MinHash/SimHash banding; NOT cryptographic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_MINHASH = 16  # signature length
N_BANDS = 4  # LSH bands (4 rows per band)
SIMHASH_BITS = 16


def token_hash(col: Column, k: int) -> Column:
    """h_k over a string column — identical to the DuckDB expression."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"|{k}"))), 1, 8), 16, 10
    ).cast("bigint")


def token_hash_sql(expr: str, k: int) -> str:
    """The DuckDB-side twin of token_hash."""
    return f"CAST(concat('0x', substr(md5({expr} || '|{k}'), 1, 8)) AS BIGINT)"


def minhash_agg_columns() -> list[Column]:
    """MIN(h_k(token)) aggregate list for a groupBy over exploded tokens."""
    return [
        F.min(token_hash(F.col("token"), k)).alias(f"mh{k}")
        for k in range(N_MINHASH)
    ]


def band_columns(n_bands: int = N_BANDS) -> list[Column]:
    """LSH band hashes over an existing mh0..mh15 signature row.
    More bands with fewer rows each = more permissive candidate
    recall (band match prob = jaccard^rows_per_band)."""
    rows = N_MINHASH // n_bands
    out = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * rows + i}").cast("string") for i in range(rows)]
        out.append(F.md5(F.concat_ws(",", *cols)).alias(f"band{b}"))
    return out


def band_sql(prefix: str = "", n_bands: int = N_BANDS) -> list[str]:
    rows = N_MINHASH // n_bands
    out = []
    for b in range(n_bands):
        cols = " || ',' || ".join(
            f"CAST({prefix}mh{b * rows + i} AS VARCHAR)" for i in range(rows)
        )
        out.append(f"md5({cols}) AS band{b}")
    return out


def simhash_agg_column() -> Column:
    """SimHash over exploded tokens: per bit, sign-sum of token hashes'
    bit values; bit set iff the sum is positive. 16-bit, exact in both
    engines (integer arithmetic only)."""
    h = token_hash(F.col("token"), 0)
    bits = []
    for b in range(SIMHASH_BITS):
        bit = F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))
        contrib = F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))
        bits.append(
            F.when(F.sum(contrib) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        )
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out.cast("bigint")


def simhash_sql() -> str:
    h = token_hash_sql("token", 0)
    parts = []
    for b in range(SIMHASH_BITS):
        parts.append(
            f"CASE WHEN SUM(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
            f"THEN {1 << b} ELSE 0 END"
        )
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
