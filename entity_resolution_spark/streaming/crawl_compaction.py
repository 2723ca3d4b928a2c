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
and the rewrite is crash-atomic: each batch writes a fresh versioned
directory ``state_v{batch_id}`` and then atomically renames a one-line
pointer file (``CURRENT``) over the old one — at every instant CURRENT
names a complete, readable state directory, so a crash at any point
resumes from either the pre-batch or post-batch state, never from empty
(a swap that renames the live directory away before renaming the new one
in has a window with NO state; replaying the batch after a crash there
would re-fold n_versions from zero and undercount).  On a real cluster
the state table would live in a table format with upserts (the aggregate
is a textbook MERGE and the pointer file is exactly a snapshot pointer),
but the fold logic is identical.
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
        self._pointer = os.path.join(state_dir, "CURRENT")

    def _pointer_state(self) -> tuple[str | None, int]:
        """(live versioned dir name, last applied batch id) from the
        pointer file; (None, -1) before batch 0."""
        try:
            with open(self._pointer) as fh:
                content = fh.read().strip()
        except FileNotFoundError:
            return None, -1
        if not content:
            return None, -1
        name, _, bid = content.partition(" ")
        try:
            return name, int(bid)
        except ValueError:  # pre-round-4 pointer without a batch id
            return name, -1

    def _current_version(self) -> str | None:
        return self._pointer_state()[0]

    def state(self) -> DataFrame | None:
        name = self._current_version()
        if name is None:
            return None
        return self.spark.read.parquet(os.path.join(self.state_dir, name))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # Idempotent replay: foreachBatch re-delivers a batch when the
        # stream crashed AFTER our pointer flip but BEFORE the streaming
        # offset commit.  The pointer records the last applied batch id, so
        # the replay is a no-op — without this, re-folding the batch onto
        # the post-batch state would double-count n_versions, and writing
        # state_v{batch_id} again would self-overwrite the directory the
        # lazily-read state() DataFrame is scanning.
        prev, last_applied = self._pointer_state()
        if batch_id <= last_applied:
            return
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
        # Crash-atomic swap: write the new state as its own versioned dir,
        # then flip the pointer file with an atomic rename-over (POSIX
        # rename of a file onto an existing file is atomic).  Only after
        # the pointer is durable do we delete superseded versions — a
        # crash at ANY line leaves CURRENT naming a complete directory.
        vname = f"state_v{batch_id}"
        if vname == prev:  # orphan of a half-applied attempt (paranoia)
            vname = f"state_v{batch_id}_retry"
        new.write.mode("overwrite").parquet(os.path.join(self.state_dir, vname))
        ptmp = self._pointer + ".tmp"
        with open(ptmp, "w") as fh:
            fh.write(f"{vname} {batch_id}")
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(ptmp, self._pointer)
        if prev is not None and prev != vname:
            import shutil

            shutil.rmtree(os.path.join(self.state_dir, prev), ignore_errors=True)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Wire onto a streaming DataFrame of (url, warc_ts, doc_id)."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
