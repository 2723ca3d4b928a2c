"""E5 threshold metrics + AUROC, two-stage blocking, pipeline determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators import blocking, evaluate
from entity_resolution_spark.operators.blocking import BlockingStage
from entity_resolution_spark.plans import pipeline
from entity_resolution_spark.sources.synthetic import make_pages


def test_threshold_metrics(spark):
    rows = [(0.9, True), (0.8, True), (0.6, True), (0.75, False), (0.1, False)]
    df = spark.createDataFrame(rows, ["score", "is_match"])
    m = evaluate.threshold_metrics(df, threshold=0.7).collect()[0]
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (2, 1, 1, 1)
    assert m["precision"] == round(2 / 3, 6)
    assert m["recall"] == round(2 / 3, 6)
    assert m["accuracy"] == 0.6


def test_auroc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)], ["score", "is_match"]
    )
    assert evaluate.auroc(perfect).collect()[0]["auroc"] == 1.0
    inverted = spark.createDataFrame(
        [(0.1, True), (0.2, True), (0.8, False), (0.9, False)], ["score", "is_match"]
    )
    assert evaluate.auroc(inverted).collect()[0]["auroc"] == 0.0
    ties = spark.createDataFrame(
        [(0.5, True), (0.5, False)], ["score", "is_match"]
    )
    assert evaluate.auroc(ties).collect()[0]["auroc"] == 0.5


def test_two_stage_blocking_composite_keys(spark):
    # stage 1 on title, stage 2 on a date column: child blocks only group
    # records that share a stage-1 key AND a stage-2 key (hierarchical B6)
    import datetime

    rows = [
        (1, "Apollo", datetime.date(2020, 5, 1)),
        (2, "Apollo", datetime.date(2020, 5, 1)),
        (3, "Apollo", datetime.date(1999, 1, 7)),
        (4, "Baldwin", datetime.date(2020, 5, 1)),
    ]
    df = spark.createDataFrame(rows, ["record_id", "title", "d"])
    blocks = blocking.block(
        df,
        [BlockingStage("title", "phonetic_combination"), BlockingStage("d", "two_of_three_date")],
    )
    from entity_resolution_spark.operators import pairs as P

    got = {
        (r["id1"], r["id2"]): r["weight"] for r in P.edge_weights(blocks).collect()
    }
    # Reference weight semantics (block_tree.py:161-199): co-occurrence counts
    # in EVERY hierarchy level's blocks (level 0 skipped).  1,2 share 5
    # stage-1 title blocks + 5x3 stage-2 composites; 3 shares only the 5
    # stage-1 title blocks with each of 1,2 (different date); 4 shares nothing.
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)] == 5 + 5 * 3
    assert got[(1, 3)] == 5 and got[(2, 3)] == 5


def test_pipeline_deterministic_across_partitioning(spark):
    corpus = make_pages(n_entities=40, hot_key_rows=10)
    pages = spark.createDataFrame(corpus.pages)
    a1 = sorted(
        map(tuple, pipeline.resolve(pages.repartition(1)).select("url", "component_id").collect())
    )
    a16 = sorted(
        map(tuple, pipeline.resolve(pages.repartition(16)).select("url", "component_id").collect())
    )
    assert a1 == a16


def test_auroc_null_scores_dropped(spark):
    """NULL scores (e.g. from left joins) must not crash the binned AUROC;
    they are excluded from the ranking."""
    df = spark.createDataFrame(
        [(0.9, True), (0.1, False), (None, True), (0.5, False)],
        "score double, is_match boolean",
    )
    assert evaluate.auroc(df).collect()[0]["auroc"] == 1.0
