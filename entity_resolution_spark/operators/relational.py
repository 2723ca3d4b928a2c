"""Temporal-join operators Spark's DataFrame API lacks as primitives.

``asof_join`` — for each left row, the latest right row at-or-before it
(per key) — is expressed as a union-marker single window pass: tag the two
sides, union, and carry the last-seen right attributes forward with
``last(..., ignorenulls=True)`` over a per-key window.  One shuffle on the
key, no range join, no per-left-row scan of the right side; at 100 TB this
is the only as-of formulation whose cost is O((|L|+|R|) log p) — a
broadcast or bucketed join can't bound the candidate set without the
time-ordering the window provides.

``bucketed_range_join`` — pairs within a time radius — buckets timestamps
at the radius, explodes each left row to its 3 adjacent buckets, and
equi-joins on (key, bucket) before the exact |Δt| filter: the classic
turn-a-range-join-into-an-equi-join trick, so Catalyst gets a shuffled hash
join instead of a broadcast-nested-loop cartesian.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    right_value_cols: Sequence[str],
    right_tie_col: str,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: latest right row with ``right.ts <= left.ts`` per key.

    Ties on the right timestamp break to the largest ``right_tie_col``
    (deterministic).  Right value columns come back prefixed and NULL when
    no right row precedes the left row.

    All right value columns are carried as ONE struct through a single
    ``last(ignorenulls=True)``, so the output row's ``r_*`` attributes all
    come from the same right row even when some of its value columns are
    NULL (per-column ``last`` would mix attributes across right rows: a
    NULL in one column makes that column skip back to an earlier row).

    Both inputs must share ``key`` and ``ts_col`` names; output keeps every
    left column.
    """
    lcols = left.columns
    rstruct_type = (
        right.select(
            F.struct(
                *[F.col(c).alias(prefix + c) for c in right_value_cols]
            ).alias("_rvals")
        ).schema["_rvals"].dataType
    )
    l = left.withColumn("_is_l", F.lit(1))
    l = l.withColumn("_rvals", F.lit(None).cast(rstruct_type))
    l = l.withColumn("_tie", F.lit(None).cast(right.schema[right_tie_col].dataType))

    r = right.select(
        key,
        ts_col,
        F.lit(0).alias("_is_l"),
        F.struct(
            *[F.col(c).alias(prefix + c) for c in right_value_cols]
        ).alias("_rvals"),
        F.col(right_tie_col).alias("_tie"),
    )
    for c in lcols:
        if c not in (key, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l.select(r.columns).unionByName(r)
    # right rows sort before left at equal ts (at-or-before semantics); the
    # tie column orders equal-ts right rows so `last` picks the max tie
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_is_l", F.coalesce(F.col("_tie"), F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("_rvals", ignorenulls=True).over(w).alias("_rvals")
    return (
        u.select(*lcols, "_is_l", carried)
        .filter(F.col("_is_l") == 1)
        .select(
            *lcols,
            *[F.col("_rvals")[prefix + c].alias(prefix + c)
              for c in right_value_cols],
        )
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    radius_micros: int,
    right_alias: str = "r",
) -> DataFrame:
    """All (left, right) pairs with same key and |Δts| <= radius.

    Returns the left columns plus the right side's columns renamed with
    ``right_alias + '_'``.  Equi-join on (key, time bucket) with the left
    side exploded to its 3 adjacent radius-sized buckets, then the exact
    radius filter — never a cartesian/BNLJ plan.
    """
    # cast NTZ → TIMESTAMP for unix_micros: a uniform timezone shift moves
    # every bucket edge identically and cancels in the Δt filter
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(micros / F.lit(radius_micros))
    l = left.withColumn(
        "_bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    )
    r = right.select(
        F.col(key).alias("_rkey"),
        bucket.alias("_bucket"),
        *[
            F.col(c).alias(f"{right_alias}_{c}")
            for c in right.columns
            if c != key
        ],
    )
    joined = l.join(
        r, (l[key] == r["_rkey"]) & (l["_bucket"] == r["_bucket"]), "inner"
    )
    dt = F.unix_micros(
        F.col(f"{right_alias}_{ts_col}").cast("timestamp")
    ) - F.unix_micros(F.col(ts_col).cast("timestamp"))
    return joined.filter(F.abs(dt) <= radius_micros).drop("_bucket", "_rkey")


def latest_snapshot_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Latest-version-per-key compaction (re-crawl snapshot selection).

    A crawl corpus holds many snapshots of the same page; downstream stages
    want exactly one — the newest, with the smallest ``id_col`` breaking
    timestamp ties deterministically.  One hash aggregate keyed by
    ``key_col``: the argmax travels inside a ``max(struct(ts, -id))`` so
    there is no window, no sort, and no second pass — map-side combinable,
    the same single-shuffle shape at any scale.

    Returns ``<key_col>, n_versions, latest_ts, keep_<id_col>``.
    """
    win = F.max(
        F.struct(F.col(ts_col).alias("ts"), (-F.col(id_col)).alias("nid"))
    ).alias("w")
    return (
        df.groupBy(key_col)
        .agg(F.count("*").cast("long").alias("n_versions"), win)
        .select(
            key_col,
            "n_versions",
            F.col("w.ts").alias("latest_ts"),
            (-F.col("w.nid")).alias(f"keep_{id_col}"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    fp_col: str,
) -> DataFrame:
    """Crawl-to-crawl delta: classify every key as added / removed /
    changed / unchanged between two snapshot tables (one row per key each,
    with a content fingerprint).

    One full-outer shuffle equi-join on the key — keys are unique per side
    by contract, so there is no skew amplification and the output is
    exactly |old ∪ new| rows.  The fingerprint travels instead of the
    content, so at 100 TB the join moves two hash columns, not pages.
    """
    o = old.select(F.col(key_col).alias("k"), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col).alias("k"), F.col(fp_col).alias("new_fp"))
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key_col),
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_fp",
        "new_fp",
    )
