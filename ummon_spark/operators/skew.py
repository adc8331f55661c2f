"""Skew hardening: hot-key detection + salted repartitioning.

The BASELINE north_rule requires explicit handling of hub entities
(common symbols like 'the'/'get', popular media_refs): at 10^12 docs a
single hub key can swamp one reducer in any join/groupBy on obj/name.

Two layers:
1. AQE (session.py turns on spark.sql.adaptive.skewJoin) — splits
   oversized shuffle partitions at runtime; free.
2. Explicit salting (this module) — for the joins AQE can't fix
   (e.g. a hub key whose rows must meet the SAME dimension row):
   broadcast the hot-key list, scatter hot rows across S salts, and
   replicate the other side S times for hot keys only.

`salted_hot_count` shows the two-phase aggregation pattern (partial on
(key, salt), final on key) for hub-heavy groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def detect_hot_keys(df: DataFrame, key: str, min_count: int = 10000) -> DataFrame:
    """(key, n) for keys whose row count exceeds min_count — run on a
    sample or the full table; the result is tiny and broadcastable."""
    return (
        df.groupBy(F.col(key).alias("hot_key"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with hot keys scattered over n_salts.

    left rows with a hot key get salt = pmod(hash(whole row), S) —
    deterministic; right hot rows are replicated S times (explode).
    Non-hot rows join normally (one shuffle each path); the union is
    the exact join result.
    """
    hot = F.broadcast(hot_keys.select(F.col("hot_key").alias(key)).distinct())
    l_hot = left.join(hot, key, "left_semi")
    l_cold = left.join(hot, key, "left_anti")
    r_hot = right.join(hot, key, "left_semi")
    r_cold = right.join(hot, key, "left_anti")

    l_salted = l_hot.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct(*left.columns)), F.lit(n_salts))
    )
    r_salted = r_hot.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    hot_joined = l_salted.join(r_salted, [key, "_salt"], how).drop("_salt")
    cold_joined = l_cold.join(r_cold, key, how)
    return hot_joined.unionByName(cold_joined)


def salted_hot_count(
    df: DataFrame, key: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Two-phase count per key: partial agg on (key, salt) spreads a
    hub key over n_salts reducers, final agg combines."""
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(n_salts))
        )
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))
