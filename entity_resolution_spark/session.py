"""SparkSession factory with scale-oriented defaults.

Single place where shuffle/AQE/Arrow knobs are set so that tests, bench and the
driver contract all run with the same physical configuration.  On a real
cluster these are the same configs you would pass to ``spark-submit``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the sandbox (single JVM, local[N]); on a real cluster the
# same settings scale: AQE coalesces the 2x-overprovisioned shuffle partitions
# and splits skewed ones at runtime.
DEFAULT_CONFS: dict[str, str] = {
    # AQE: runtime re-planning — partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas-UDF crossing; batch size bounded so encoder /
    # TF-IDF batches fit executor memory even with wide array columns.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast small dims aggressively (component maps, scaler params...).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Deterministic timestamps regardless of host zone.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "entity_resolution_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard configs.

    ``shuffle_partitions`` defaults to 2x the core count: AQE coalesces the
    excess, while under-provisioning cannot be fixed at runtime.
    """
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or 2 * cores)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
