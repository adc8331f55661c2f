"""Table IO: Iceberg when a catalog is on the classpath, parquet
otherwise — one writer interface, identical layout.

The north_rule targets partitioned Iceberg node/edge tables; this
sandbox has no Iceberg runtime jar, so `table_format(spark)` probes for
it and the writer degrades to path-based parquet with the same
partition spec. MERGE-by-deterministic-id semantics hold either way:
edge/node ids are deterministic, so overwrite/append replays are
idempotent after dedupe (the reference's INSERT OR REPLACE analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def table_format(spark: SparkSession) -> str:
    return "iceberg" if iceberg_available(spark) else "parquet"


def write_table(
    df: DataFrame,
    target: str,
    partition_by: tuple[str, ...],
    mode: str = "overwrite",
    fmt: str | None = None,
) -> None:
    """target: an Iceberg table identifier (catalog.db.table) or a
    filesystem path for parquet. Pre-shuffles on (partition cols, id)
    so writers parallelize."""
    spark = df.sparkSession
    fmt = fmt or table_format(spark)
    n_out = max(spark.sparkContext.defaultParallelism, 8)
    spread = [F.col(c) for c in partition_by] + (
        [F.col("id")] if "id" in df.columns else []
    )
    df = df.repartition(n_out, *spread)
    if fmt == "iceberg":
        writer = df.writeTo(target).using("iceberg")
        for c in partition_by:
            writer = writer.partitionedBy(F.col(c))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
    else:
        df.write.mode(mode).partitionBy(*partition_by).parquet(target)


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or table_format(spark)
    if fmt == "iceberg":
        return spark.read.table(target)
    return spark.read.parquet(target)
