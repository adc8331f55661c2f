"""Distributed cardinality sketches: HyperLogLog over md5.

The approximate-distinct operator a 100 TB corpus needs for cheap
stats (unique URLs, unique shingles, unique users) where an exact
COUNT(DISTINCT) would shuffle the full key set: HLL shuffles exactly
m <= 2^p register rows regardless of input size, and registers merge
by MAX — map-side combinable, and unions across corpora/partitions
are free (pairwise register max).

Cross-engine exactness (the repo invariant): the 60-bit hash is the
first 15 hex chars of md5 (datapipe/hashing.py family — Spark conv ==
DuckDB 0x-cast), the register index is the top p bits via integer
division, and the rank (leading-zero count + 1 of the low 50-bit
field) comes from `length(bin(x))`, which both engines define as the
minimal binary rendering. The register table is therefore bigint-exact
and gate-checkable; only the final scalar estimate involves floats,
and that happens DRIVER-SIDE in Python over the <= 2^p collected
register rows (arbitrary-precision ints, no accumulation-order
dependence), never in a gate-visible column.

Estimator: the classic Flajolet-Fusy-Gandouet-Meunier HLL with the
standard small-range linear-counting correction.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 10  # 2^10 = 1024 registers; relative error ~ 1.04/sqrt(m) ~ 3.3%
_HASH_BITS = 60  # 15 md5 hex chars: fits int64 positive
_REG_NAME = "register"
_RANK_NAME = "max_rank"


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def hll_registers(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """(register, max_rank) — occupied HLL registers for the values of
    `col`. One narrow projection + ONE hash agg of at most 2^p groups
    (map-side partial max); nulls ignored like COUNT(DISTINCT).
    Registers from different frames/partitions union by pairwise MAX
    on register — use `hll_estimate` on the collected rows."""
    low_bits = _HASH_BITS - p
    hashed = df.filter(F.col(col).isNotNull()).select(
        _hash60(F.col(col).cast("string")).alias("h")
    )
    rem = F.col("h") % F.lit(1 << low_bits)
    rank = (
        F.when(rem == 0, F.lit(low_bits + 1))
        .otherwise(F.lit(low_bits + 1) - F.length(F.bin(rem)))
        .cast("bigint")
    )
    return (
        hashed.select(
            F.expr(f"h DIV {1 << low_bits}").cast("bigint").alias(_REG_NAME),
            rank.alias(_RANK_NAME),
        )
        .groupBy(_REG_NAME)
        .agg(F.max(_RANK_NAME).alias(_RANK_NAME))
    )


def hll_registers_sql(expr: str, source: str, p: int = HLL_P) -> str:
    """DuckDB twin of hll_registers over `source` (a table/CTE name)."""
    low_bits = _HASH_BITS - p
    h = _hash60_sql(expr)
    return f"""WITH hll_h AS (
  SELECT {h} AS h FROM {source} WHERE {expr} IS NOT NULL
),
hll_r AS (
  SELECT h // {1 << low_bits} AS {_REG_NAME},
         CASE WHEN h % {1 << low_bits} = 0 THEN {low_bits + 1}
              ELSE {low_bits + 1} - length(bin(h % {1 << low_bits}))
         END AS {_RANK_NAME}
  FROM hll_h
)
SELECT CAST({_REG_NAME} AS BIGINT) AS {_REG_NAME},
       CAST(MAX({_RANK_NAME}) AS BIGINT) AS {_RANK_NAME}
FROM hll_r GROUP BY 1"""


def hll_estimate(register_rows, p: int = HLL_P) -> int:
    """Distinct-count estimate from collected (register, max_rank)
    rows (at most 2^p of them — a driver-side scalar reduction, like
    the corpus counts the other operators collect). Python ints keep
    the 2^-rank sum exact (common denominator 2^max_rank); the single
    float division at the end is the only inexact step.
    """
    m = 1 << p
    ranks = {int(r[0]): int(r[1]) for r in register_rows}
    max_rank = _HASH_BITS - p + 1
    # sum(2^-rank_j) over ALL m registers (empty register -> rank 0)
    num = sum(
        1 << (max_rank - ranks.get(j, 0)) for j in range(m)
    )  # = 2^max_rank * sum(2^-rank_j), exact
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m * (1 << max_rank) / num
    zeros = m - len(ranks)
    if raw <= 2.5 * m and zeros > 0:
        return round(m * math.log(m / zeros))  # linear counting
    return round(raw)
