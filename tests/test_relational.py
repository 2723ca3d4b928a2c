"""Unit tests for operators/relational.py (as-of join, bucketed range join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from entity_resolution_spark.operators.relational import (
    asof_join,
    bucketed_range_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows, cols="event_id long, user_id long, ts timestamp_ntz"):
    return spark.createDataFrame(rows, cols)


def test_asof_join_semantics(spark):
    purchases = _events(
        spark,
        [
            (100, 1, _ts("2024-01-01 10:00:00")),  # after two clicks
            (101, 1, _ts("2024-01-01 08:00:00")),  # before any click -> NULL
            (102, 2, _ts("2024-01-01 12:00:00")),  # equal-ts click matches
            (103, 3, _ts("2024-01-01 12:00:00")),  # user with no clicks
        ],
    )
    clicks = _events(
        spark,
        [
            (10, 1, _ts("2024-01-01 09:00:00")),
            (11, 1, _ts("2024-01-01 09:30:00")),  # latest prior for 100
            (12, 1, _ts("2024-01-01 11:00:00")),  # after purchase 100
            (20, 2, _ts("2024-01-01 12:00:00")),  # at-or-before: ties at ts
        ],
        cols="click_id long, user_id long, ts timestamp_ntz",
    )
    out = {
        r["event_id"]: r.asDict()
        for r in asof_join(
            purchases,
            clicks,
            key="user_id",
            ts_col="ts",
            right_value_cols=["click_id", "ts"],
            right_tie_col="click_id",
        ).collect()
    }
    assert out[100]["r_click_id"] == 11
    assert out[101]["r_click_id"] is None and out[101]["r_ts"] is None
    assert out[102]["r_click_id"] == 20  # equal timestamp counts
    assert out[103]["r_click_id"] is None
    assert len(out) == 4  # every left row survives


def test_asof_join_equal_ts_tie_breaks_to_max_tie_col(spark):
    purchases = _events(spark, [(1, 7, _ts("2024-01-01 10:00:00"))])
    clicks = _events(
        spark,
        [
            (50, 7, _ts("2024-01-01 09:00:00")),
            (51, 7, _ts("2024-01-01 09:00:00")),  # same ts -> pick max id
        ],
        cols="click_id long, user_id long, ts timestamp_ntz",
    )
    (row,) = asof_join(
        purchases, clicks, "user_id", "ts", ["click_id"], "click_id"
    ).collect()
    assert row["r_click_id"] == 51


def test_bucketed_range_join_matches_naive(spark):
    import random

    rng = random.Random(42)
    base = _ts("2024-01-01 00:00:00")
    left = _events(
        spark,
        [
            (i, rng.randrange(3), base + dt.timedelta(seconds=rng.randrange(7200)))
            for i in range(60)
        ],
    )
    right = _events(
        spark,
        [
            (1000 + i, rng.randrange(3), base + dt.timedelta(seconds=rng.randrange(7200)))
            for i in range(80)
        ],
        cols="rid long, user_id long, ts timestamp_ntz",
    )
    radius = 300_000_000  # 5 min
    got = {
        (r["event_id"], r["r_rid"])
        for r in bucketed_range_join(
            left, right, key="user_id", ts_col="ts", radius_micros=radius
        ).collect()
    }
    naive = {
        (r["event_id"], r["rid"])
        for r in left.alias("l")
        .join(right.alias("r"), "user_id")
        .where(
            F.abs(
                F.expr("timestampdiff(MICROSECOND, l.ts, r.ts)")
            )
            <= radius
        )
        .collect()
    }
    assert got == naive and len(naive) > 0


def test_asof_join_matches_pandas_merge_asof(spark):
    """Differential oracle: seeded random events vs pandas.merge_asof
    (backward, allow_exact_matches).  Right timestamps are unique per key so
    both implementations' tie rules coincide."""
    import random

    import pandas as pd

    rng = random.Random(7)
    base = _ts("2024-01-01 00:00:00")
    lrows = [
        (i, rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(86400)))
        for i in range(120)
    ]
    # unique (user, ts) on the right: sample offsets without replacement
    rrows = []
    rid = 1000
    for user in range(5):
        for off in rng.sample(range(86400), 150):
            rrows.append((rid, user, base + dt.timedelta(seconds=off)))
            rid += 1
    left = _events(spark, lrows)
    right = _events(
        spark, rrows, cols="click_id long, user_id long, ts timestamp_ntz"
    )
    out = (
        asof_join(left, right, "user_id", "ts", ["click_id"], "click_id")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["click_id", "user_id", "ts"]).sort_values("ts")
    exp = (
        pd.merge_asof(
            lp,
            rp,
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = out["r_click_id"].astype("float64").values
    want = exp["click_id"].astype("float64").values
    assert len(got) == len(want) == 120
    assert ((got == want) | (pd.isna(got) & pd.isna(want))).all()


def test_bucketed_range_join_inclusive_boundary(spark):
    left = _events(spark, [(1, 1, _ts("2024-01-01 10:00:00"))])
    right = _events(
        spark,
        [
            (10, 1, _ts("2024-01-01 10:05:00")),  # exactly +radius: included
            (11, 1, _ts("2024-01-01 10:05:00.000001")),  # just over: excluded
            (12, 2, _ts("2024-01-01 10:00:00")),  # wrong key
        ],
        cols="rid long, user_id long, ts timestamp_ntz",
    )
    rows = bucketed_range_join(
        left, right, key="user_id", ts_col="ts", radius_micros=300_000_000
    ).collect()
    assert [r["r_rid"] for r in rows] == [10]


def test_latest_snapshot_per_key_argmax_and_ties(spark):
    import datetime as dt

    from entity_resolution_spark.operators.relational import (
        latest_snapshot_per_key,
    )

    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # key a: strictly newer wins regardless of id
        ("a", t, 1), ("a", t + 2 * h, 9), ("a", t + h, 2),
        # key b: timestamp tie -> smallest id wins
        ("b", t + h, 7), ("b", t + h, 3), ("b", t, 5),
        # key c: singleton
        ("c", t, 4),
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, doc_id long")
    out = {
        r["url"]: r.asDict()
        for r in latest_snapshot_per_key(df, "url", "ts", "doc_id").collect()
    }
    assert out["a"]["keep_doc_id"] == 9 and out["a"]["latest_ts"] == t + 2 * h
    assert out["b"]["keep_doc_id"] == 3 and out["b"]["latest_ts"] == t + h
    assert out["c"]["n_versions"] == 1 and out["c"]["keep_doc_id"] == 4
    out2 = {
        r["url"]: r.asDict()
        for r in latest_snapshot_per_key(
            df.repartition(7), "url", "ts", "doc_id"
        ).collect()
    }
    assert out == out2


def test_snapshot_diff_statuses(spark):
    from entity_resolution_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [("a", "h1"), ("b", "h2"), ("c", "h3")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("a", "h1"), ("b", "hX"), ("d", "h4")], "url string, fp string"
    )
    got = {
        r["url"]: (r["status"], r["old_fp"], r["new_fp"])
        for r in snapshot_diff(old, new, "url", "fp").collect()
    }
    assert got == {
        "a": ("unchanged", "h1", "h1"),
        "b": ("changed", "h2", "hX"),
        "c": ("removed", "h3", None),
        "d": ("added", None, "h4"),
    }


def test_asof_join_null_right_value_stays_on_one_row(spark):
    """A NULL value column in the latest right row must NOT pull that
    attribute from an EARLIER right row (per-column last(ignorenulls)
    would): all r_* attributes come from the same right row."""
    purchases = _events(spark, [(1, 7, _ts("2024-01-01 10:00:00"))])
    clicks = spark.createDataFrame(
        [
            (50, 7, _ts("2024-01-01 08:00:00"), "early-campaign"),
            (51, 7, _ts("2024-01-01 09:00:00"), None),  # latest; NULL attr
        ],
        "click_id long, user_id long, ts timestamp_ntz, campaign string",
    )
    (row,) = asof_join(
        purchases,
        clicks,
        key="user_id",
        ts_col="ts",
        right_value_cols=["click_id", "ts", "campaign"],
        right_tie_col="click_id",
    ).collect()
    assert row["r_click_id"] == 51
    assert row["r_ts"] == _ts("2024-01-01 09:00:00")
    # the latest click's campaign is NULL — it must come back NULL, not
    # be backfilled from click 50
    assert row["r_campaign"] is None
