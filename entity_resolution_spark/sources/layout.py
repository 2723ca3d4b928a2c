"""Iceberg-style pages-table layout: partition by crawl day, bucket by url.

SCALING.md §Input assumptions describes the 100 TB pages table as
"partitioned by crawl date (`warc_ts` day) + bucketed by `xxhash64(url)`
into 2¹⁶ buckets".  This module is that layout as a plain-parquet write
path + a reader whose filters PRUNE on it — the sandbox stand-in for an
Iceberg table (no snapshot/ACID metadata here; on a real deployment the
same two columns become the Iceberg partition spec ``days(warc_ts),
bucket(65536, url)`` and everything below is metadata-managed).

Why these two dimensions:

* **crawl day** — every incremental job (crawl diff, compaction, "process
  yesterday") is a day-range scan; directory partitioning turns it into
  file-listing, reading 1/365th of a year's table per day.
* **url bucket** — url is the join/dedup key of the whole pipeline
  (canonical-url compaction, URL dedup, crawl diff).  Writing each day
  hash-bucketed by url means (a) a point lookup reads ONE bucket =
  1/n_buckets of a day, and (b) two tables written with the same
  n_buckets can be joined bucket-by-bucket (join on (url_bucket, url) —
  the bucket equality cuts the shuffle's effective width; with a real
  bucketed table format the shuffle disappears entirely).

Layout on disk (Hive-style, readable by every engine):

    <root>/crawl_day=2024-01-01/url_bucket=13/part-*.parquet

Partition values are directory metadata, not row data — the reader
restores them as columns, and Catalyst turns ``crawl_day``/``url_bucket``
predicates into PartitionFilters (pruned at file-listing time, visible in
the scan node — asserted by tests/test_layout.py the same way PLANS.md
asserts scan shapes).

**Snapshots / atomic publish** (:func:`publish_pages_layout`): a bare
``mode=overwrite`` rewrite has a window where a concurrent reader sees a
partial table, and a crash mid-rewrite loses the old data too.  The
publish path therefore reuses the streaming compactor's crash-atomic
pattern (``streaming/crawl_compaction.py``): each publish writes a FRESH
versioned directory ``<root>/v{n}/<hive layout>`` and then atomically
renames a one-line ``CURRENT`` pointer over the old one.  At every
instant ``CURRENT`` names a complete, readable snapshot; readers that
resolved an older snapshot keep scanning its (still present) files; a
crash before the pointer flip leaves an orphan directory the next
publish simply skips past.  Old snapshots remain readable by version
(:func:`read_pages_snapshot` — time travel) until explicitly retired via
``retain_last``.  This is exactly the snapshot/commit half of what
Iceberg metadata buys; the pointer file is the sandbox stand-in for its
catalog swap.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: 2¹⁶ in SCALING.md; tests use small values — one knob, same code path.
DEFAULT_BUCKETS = 1 << 16


def url_bucket_of(url: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Bucket id of a url — the SAME expression writers and readers use,
    so a point lookup can compute its bucket instead of scanning all."""
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def crawl_day_of(warc_ts: Column) -> Column:
    return F.date_format(warc_ts, "yyyy-MM-dd")


def write_pages_layout(
    df: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` in the SCALING.md layout.

    The pre-write ``repartition(crawl_day, url_bucket)`` is what keeps the
    file count sane: without it, every task holding rows of a (day,
    bucket) pair emits its own file — tasks × days × buckets small files,
    the classic partitionBy explosion.  With it, each populated (day,
    bucket) pair is exactly one task → one file, and the shuffle that
    achieves this is the same hash distribution the layout itself wants.
    """
    (
        df.withColumn("crawl_day", crawl_day_of(F.col(ts_col)))
        .withColumn("url_bucket", url_bucket_of(F.col(url_col), n_buckets))
        .repartition("crawl_day", "url_bucket")
        .write.mode(mode)
        .partitionBy("crawl_day", "url_bucket")
        .parquet(path)
    )


_SNAPSHOT_RE = re.compile(r"^v(\d+)$")


def snapshot_versions(root: str) -> list[int]:
    """Sorted snapshot versions present under ``root`` (orphans included —
    presence of a directory does not imply it was ever published)."""
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1)) for n in names if (m := _SNAPSHOT_RE.match(n))
    )


def published_versions(root: str) -> list[int]:
    """Sorted versions that completed a publish: the append-only
    ``PUBLISHED`` log, unioned with whatever ``CURRENT`` names (a crash
    between the pointer flip and the log append loses the log line, so
    the pointer is authoritative for the newest version)."""
    out: set[int] = set()
    try:
        with open(os.path.join(root, "PUBLISHED")) as fh:
            for line in fh:
                m = _SNAPSHOT_RE.match(line.strip())
                if m:
                    out.add(int(m.group(1)))
    except (FileNotFoundError, NotADirectoryError):
        pass
    cur = current_snapshot(root)
    if cur is not None:
        out.add(cur)
    # a log entry whose directory was already expired is stale history
    present = set(snapshot_versions(root))
    return sorted(v for v in out if v in present)


def current_snapshot(root: str) -> int | None:
    """Version the ``CURRENT`` pointer names, or None for a plain
    (non-snapshot) layout directory."""
    try:
        with open(os.path.join(root, "CURRENT")) as fh:
            content = fh.read().strip()
    except (FileNotFoundError, NotADirectoryError):
        return None
    m = _SNAPSHOT_RE.match(content)
    return int(m.group(1)) if m else None


def publish_pages_layout(
    df: DataFrame,
    root: str,
    n_buckets: int = DEFAULT_BUCKETS,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    retain_last: int | None = None,
) -> int:
    """Atomically publish ``df`` as the next snapshot of the table at
    ``root``; returns the new version number.

    Write order is the crash-safety argument: (1) the full Hive layout
    lands in a fresh ``v{n}`` directory nobody reads yet; (2) the pointer
    is REPLACED atomically (write-temp + rename).  A crash during (1)
    leaves the previous snapshot live and an orphan directory whose
    version number the next publish skips (it allocates max+1 over ALL
    ``v*`` directories, published or not — a half-written directory is
    never reused).  Readers holding the previous snapshot keep working
    through and after the flip, because a publish never touches existing
    snapshot directories.

    ``retain_last``: optionally delete all but the newest N snapshots
    AFTER the flip (the new current is always kept).  Deletion breaks
    readers still scanning those old snapshots — same contract as
    expiring Iceberg snapshots — so it runs last and defaults to off.
    """
    os.makedirs(root, exist_ok=True)
    versions = snapshot_versions(root)
    new_v = (versions[-1] + 1) if versions else 0
    write_pages_layout(
        df, os.path.join(root, f"v{new_v}"), n_buckets=n_buckets,
        url_col=url_col, ts_col=ts_col, mode="errorifexists",
    )
    tmp = os.path.join(root, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"v{new_v}\n")
    os.replace(tmp, os.path.join(root, "CURRENT"))
    # append-only publish log — retention must count PUBLISHED snapshots,
    # not directories: a crash-orphan v* dir would otherwise displace a
    # readable snapshot from the retained window
    with open(os.path.join(root, "PUBLISHED"), "a") as fh:
        fh.write(f"v{new_v}\n")
    if retain_last is not None and retain_last >= 1:
        kept = set(published_versions(root)[-retain_last:]) | {new_v}
        cutoff = min(kept)
        # everything older than the oldest kept PUBLISHED version goes —
        # published snapshots outside the window and stale orphans alike;
        # orphans newer than the cutoff are left (a future publish skips
        # their numbers anyway)
        for old in snapshot_versions(root):
            if old < cutoff:
                shutil.rmtree(os.path.join(root, f"v{old}"),
                              ignore_errors=True)
    return new_v


def read_pages_layout(spark: SparkSession, path: str) -> DataFrame:
    """Read the layout back; ``crawl_day`` / ``url_bucket`` come back as
    partition columns, so filters on them prune directories at file-listing
    time (PartitionFilters in the scan, zero data files touched outside the
    selected day/bucket ranges).

    If ``path`` is a snapshot root (has a ``CURRENT`` pointer), the
    current snapshot is resolved at call time and the returned DataFrame
    is pinned to it: later publishes do not change what this DataFrame
    scans (snapshot-isolated reads)."""
    cur = current_snapshot(path)
    if cur is not None:
        path = os.path.join(path, f"v{cur}")
    return spark.read.parquet(path)


def read_pages_snapshot(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Time travel: read a specific published (or retained) snapshot."""
    return spark.read.parquet(os.path.join(root, f"v{version}"))


def point_lookup(
    spark: SparkSession,
    path: str,
    url: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """All versions of one url: bucket-pruned scan + exact url filter.
    Reads 1/n_buckets of the table regardless of table size."""
    bucket = url_bucket_of(F.lit(url), n_buckets)
    return (
        read_pages_layout(spark, path)
        .where(F.col("url_bucket") == bucket)
        .where(F.col("url") == url)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    bucket_col: str = "url",
    mode: str = "overwrite",
) -> None:
    """Catalog-backed bucketed table (``bucketBy`` + ``sortBy``): the
    shuffle-FREE join path the directory layout above only approximates.

    Two tables written with the same ``(n_buckets, bucket_col)`` join on
    ``bucket_col`` with NO Exchange on either side — Spark trusts the
    bucket metadata and runs a co-located sort-merge join (asserted at the
    plan level by tests/test_layout.py).  This is exactly what an Iceberg
    ``bucket(N, url)`` partition transform buys on a real deployment; the
    in-session catalog + parquet warehouse is the sandbox stand-in.

    At 100 TB: every url-keyed stage (canonical-url compaction, URL dedup,
    crawl diff, the blocking table's record side) re-shuffles the full
    table once per join today — bucketed storage pays that shuffle ONCE at
    write time and amortizes it over every downstream join/aggregation on
    the same key.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
