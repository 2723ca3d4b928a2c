"""Meta-blocking pair weights, pruning and connected components (G2-G6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators import blocking, components, pairs
from entity_resolution_spark.operators.blocking import BlockingStage


def _blocks(spark, rows):
    return spark.createDataFrame(rows, ["record_id", "block_key"])


def test_edge_weights_count_distinct_blocks(spark):
    blocks = _blocks(
        spark,
        [(1, "a"), (2, "a"), (1, "b"), (2, "b"), (3, "b"), (1, "c"), (3, "c")],
    )
    got = {
        (r["id1"], r["id2"]): r["weight"]
        for r in pairs.edge_weights(blocks).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 2, (2, 3): 1}


def test_provenance_sorted(spark):
    blocks = _blocks(spark, [(1, "b"), (2, "b"), (1, "a"), (2, "a")])
    row = pairs.edge_weights(blocks, with_provenance=True).collect()[0]
    assert row["provenance"] == ["a", "b"]


def test_prune_threshold(spark):
    blocks = _blocks(
        spark, [(1, "a"), (2, "a"), (1, "b"), (2, "b"), (3, "b"), (1, "c"), (3, "c")]
    )
    kept = {
        (r["id1"], r["id2"])
        for r in pairs.prune(pairs.edge_weights(blocks)).collect()
    }
    assert kept == {(1, 2), (1, 3)}  # weight 2 > 1.5; (2,3) weight 1 pruned


def test_salted_pairs_equal_plain(spark):
    rows = [(i, f"k{i % 3}") for i in range(30)] + [(i, "shared") for i in range(10)]
    blocks = _blocks(spark, rows)
    plain = set(
        map(tuple, pairs.candidate_pairs(blocks).select("id1", "id2").collect())
    )
    salted = set(
        map(
            tuple,
            pairs.candidate_pairs_salted(blocks, salt_buckets=4)
            .select("id1", "id2")
            .distinct()
            .collect(),
        )
    )
    assert plain == salted


def _cc(spark, edges, vertices=None):
    e = spark.createDataFrame(edges, ["src", "dst"])
    if vertices is None:
        vertices = sorted({v for p in edges for v in p})
    v = spark.createDataFrame([(x,) for x in vertices], ["record_id"])
    got = components.assign_components(v, e)
    return {r["record_id"]: r["component_id"] for r in got.collect()}


def test_cc_chain(spark):
    # long chain: worst case for naive propagation, fine for large/small-star
    edges = [(i, i + 1) for i in range(1, 20)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}


def test_cc_two_components_and_singleton(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], vertices=[1, 2, 3, 10, 11, 99])
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[99] == 99  # singleton preserved


def test_cc_star_and_deterministic_min_label(spark):
    got = _cc(spark, [(5, 1), (5, 2), (5, 3), (5, 4)])
    assert set(got.values()) == {1}


def test_block_purging_drops_oversized(spark):
    rows = [(i, "hot") for i in range(10)] + [(100, "cold"), (101, "cold")]
    df = spark.createDataFrame(
        [(i, k) for i, k in rows], ["record_id", "title"]
    )
    # build blocks directly to test the cap path
    blocks = _blocks(spark, rows)
    capped = blocks.join(
        F.broadcast(
            blocks.groupBy("block_key")
            .count()
            .where(F.col("count") > 5)
            .select("block_key")
        ),
        "block_key",
        "left_anti",
    )
    assert {r["block_key"] for r in capped.select("block_key").distinct().collect()} == {"cold"}


def test_block_stage_api(spark):
    df = spark.createDataFrame([(1, "Apollo"), (2, "Apolo")], ["record_id", "title"])
    blocks = blocking.block(df, [BlockingStage("title", "phonetic_combination")])
    keys = {
        (r["record_id"], r["block_key"]) for r in blocks.collect()
    }
    # both share the 'a', 'ap', 'apo' prefixed keys
    shared = {k for i, k in keys if i == 1} & {k for i, k in keys if i == 2}
    assert len(shared) == 3


def test_cc_durable_checkpoint_resume(spark, tmp_path):
    """Durable CC: rounds land as parquet with _SUCCESS markers; a re-call
    with the same dir resumes from the last completed round WITHOUT the
    original edge input (proving recovery reads only the checkpoint)."""
    import os

    edges = [(i, i + 1) for i in range(1, 20)]  # chain: needs several rounds
    e = spark.createDataFrame(edges, ["src", "dst"])
    baseline = {
        (r["record_id"], r["component_id"])
        for r in components.connected_components(e).collect()
    }

    # full durable run matches the localCheckpoint run
    d_full = str(tmp_path / "full")
    got = {
        (r["record_id"], r["component_id"])
        for r in components.connected_components(e, checkpoint_dir=d_full).collect()
    }
    assert got == baseline
    rounds = sorted(p for p in os.listdir(d_full) if p.startswith("round_"))
    assert rounds[0] == "round_0000" and len(rounds) >= 2
    for p in rounds:
        assert os.path.exists(os.path.join(d_full, p, "_SUCCESS"))

    # interrupted run: only 1 star round, then "the driver dies"
    d = str(tmp_path / "resume")
    components.connected_components(e, max_iterations=1, checkpoint_dir=d)
    partial_rounds = sorted(p for p in os.listdir(d) if p.startswith("round_"))
    assert partial_rounds == ["round_0000", "round_0001"]

    # resume with an EMPTY edge input: the answer can only come from the
    # persisted rounds.  Result identical to the uninterrupted run, and the
    # loop continued numbering from the persisted round.
    empty = spark.createDataFrame([], "src long, dst long")
    resumed = {
        (r["record_id"], r["component_id"])
        for r in components.connected_components(
            empty, checkpoint_dir=d
        ).collect()
    }
    assert resumed == baseline
    resumed_rounds = sorted(p for p in os.listdir(d) if p.startswith("round_"))
    assert len(resumed_rounds) > 2 and resumed_rounds[2] == "round_0002"
