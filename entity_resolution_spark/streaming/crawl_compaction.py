"""Streaming crawl-snapshot compaction — latest version per canonical URL,
maintained incrementally over a crawl stream.

``foreachBatch`` pattern: each micro-batch canonicalizes its URLs, runs the
same ``latest_snapshot_per_key`` aggregate over (batch ∪ current state), and
atomically replaces the state table.  Correctness is immediate from the
aggregate's algebra — ``max(struct(ts, -id))`` is associative and
commutative, so folding batches in ANY arrival order yields exactly the
batch-mode result over the union of all inputs (the equality test drives
both paths over the same rows in different orders).

Scale shape: state holds ONE row per canonical URL (not per snapshot), the
per-batch work is one hash aggregate over (batch + state) co-keyed by URL,
and the rewrite is a parquet swap via a temp directory + atomic rename —
the same checkpoint discipline as plans/checkpoint.py.  On a real cluster
the state table would live in a table format with upserts (the aggregate is
a textbook MERGE), but the fold logic is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonical_url
from ..operators.relational import latest_snapshot_per_key


class StreamingCrawlCompactor:
    """Maintains the newest (smallest-id on ties) snapshot per canonical
    URL across micro-batches of ``(url, warc_ts, doc_id)`` rows."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self._state_path = os.path.join(state_dir, "latest")

    def state(self) -> DataFrame | None:
        if not os.path.exists(self._state_path):
            return None
        return self.spark.read.parquet(self._state_path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        snaps = batch.select(
            canonical_url(F.col("url")).alias("canonical_url"),
            F.col("warc_ts"),
            F.col("doc_id"),
        )
        new = latest_snapshot_per_key(
            snaps, "canonical_url", "warc_ts", "doc_id"
        )
        cur = self.state()
        if cur is not None:
            # Fold state into the same aggregate: re-aggregate the union of
            # the state's (1-row-per-url) representatives and the batch
            # winners.  n_versions must SUM across the fold (each side
            # already counted its own versions), while the argmax re-runs
            # on the two representatives — associativity does the rest.
            both = cur.select(
                "canonical_url",
                "n_versions",
                F.col("latest_ts").alias("warc_ts"),
                F.col("keep_doc_id").alias("doc_id"),
            ).unionByName(
                new.select(
                    "canonical_url",
                    "n_versions",
                    F.col("latest_ts").alias("warc_ts"),
                    F.col("keep_doc_id").alias("doc_id"),
                )
            )
            win = F.max(
                F.struct(
                    F.col("warc_ts").alias("ts"),
                    (-F.col("doc_id")).alias("nid"),
                )
            ).alias("w")
            new = (
                both.groupBy("canonical_url")
                .agg(F.sum("n_versions").cast("long").alias("n_versions"), win)
                .select(
                    "canonical_url",
                    "n_versions",
                    F.col("w.ts").alias("latest_ts"),
                    (-F.col("w.nid")).alias("keep_doc_id"),
                )
            )
        tmp = self._state_path + f"._tmp_{batch_id}"
        new.write.mode("overwrite").parquet(tmp)
        old = self._state_path + f"._old_{batch_id}"
        if os.path.exists(self._state_path):
            os.rename(self._state_path, old)
        os.rename(tmp, self._state_path)
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Wire onto a streaming DataFrame of (url, warc_ts, doc_id)."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
