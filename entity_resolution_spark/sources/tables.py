"""Table loaders with reference-equivalent type coercion (S1/S4).

``coerce_records`` mirrors ``block_klsh/manager.py:28-33``: name → string,
numerics via ``to_numeric(errors='coerce')`` (→ nulls on failure, same as
Spark's try_cast), dates via ``%d/%m/%Y``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def coerce_records(df: DataFrame) -> DataFrame:
    """Apollo-shaped record table coercion (name,tension_adj,tension,
    resonance,longevity,quality,amt_sold)."""
    return df.select(
        F.col("name").cast("string").alias("name"),
        F.col("tension_adj").try_cast("int").alias("tension_adj"),
        F.col("tension").try_cast("double").alias("tension"),
        F.col("resonance").try_cast("double").alias("resonance"),
        F.try_to_date(F.col("longevity").cast("string"), "dd/MM/yyyy").alias("longevity"),
        F.col("quality").try_cast("int").alias("quality"),
        F.col("amt_sold").try_cast("double").alias("amt_sold"),
    )


def read_records_csv(spark: SparkSession, path: str, encoding: str = "cp1252") -> DataFrame:
    """CSV scan with header + charset, then coercion (reference S1).

    Spark 4 restricts CSV charsets to a short allow-list by default; the
    legacy flag re-enables arbitrary JVM charsets (cp1252 = the reference's
    ``manager.py:28`` encoding).
    """
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    raw = spark.read.option("header", True).option("encoding", encoding).csv(path)
    return coerce_records(raw)


def with_record_id(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """Stable 0-based record index (mirrors the pandas row index the reference
    uses as record identity).  Real pipelines use xxhash64(url).

    zipWithIndex-style assignment: one tiny count-per-partition job feeds a
    per-partition offset, and ranks within each partition come from a
    **partitioned** window — no single-partition global sort.  Pass
    ``order_col`` for a deterministic ordering basis (the data is range-
    repartitioned + sorted on it first); with ``order_col=None`` ids follow
    the source's partition/row order, which is only stable for deterministic
    scans (parquet/CSV fixtures).
    """
    from pyspark.sql.window import Window

    from ..functions.maps import prefix_offset_expr

    if order_col is not None:
        df = df.repartitionByRange(F.col(order_col)).sortWithinPartitions(order_col)
    # The per-partition offset map is a literal expression — bound the
    # partition count so it stays a small plan node (beyond this, id
    # assignment belongs to a content hash like xxhash64(url), not an index).
    if df.rdd.getNumPartitions() > 4096:
        raise ValueError(
            "with_record_id is a fixture-scale helper (creates a literal "
            "offset map with one entry per partition); got "
            f"{df.rdd.getNumPartitions()} partitions > 4096. Coalesce first, "
            "or derive ids as xxhash64(<key column>) at pipeline scale."
        )
    # Pin the partition layout BEFORE the two jobs below: the sizes collect
    # and the window job must see identical partitions, which AQE coalescing
    # or a nondeterministic source would otherwise not guarantee.
    part = df.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    sizes = part.groupBy("_pid").count().collect()  # one row per partition
    off_expr = prefix_offset_expr(
        {r["_pid"]: r["count"] for r in sizes}, F.col("_pid")
    )
    w = Window.partitionBy("_pid").orderBy(
        F.monotonically_increasing_id() if order_col is None else F.col(order_col)
    )
    return part.withColumn(
        "record_id", F.row_number().over(w).cast("long") - 1 + off_expr
    ).drop("_pid")
