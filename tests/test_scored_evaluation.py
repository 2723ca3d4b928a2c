"""End-to-end labeled evaluation: scoring stage → AUROC / threshold metrics
on the corpus's hard-negative label table, plus the max-scale F1 gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators import blocking, evaluate, pairs
from entity_resolution_spark.operators.blocking import BlockingStage
from entity_resolution_spark.plans import pipeline
from entity_resolution_spark.sources.synthetic import make_pages


def test_scored_pairs_auroc_on_labels(spark):
    """TF-IDF cosine + JW should rank labeled positives above hard negatives
    (negatives share >=1 blocking key by construction)."""
    corpus = make_pages(n_entities=50)
    pages = spark.createDataFrame(corpus.pages)
    labels = spark.createDataFrame(corpus.labels)
    ids = pipeline.extract(pages).select("url", "record_id")
    lab = (
        labels.join(ids.withColumnRenamed("url", "url1").withColumnRenamed("record_id", "rid1"), "url1")
        .join(ids.withColumnRenamed("url", "url2").withColumnRenamed("record_id", "rid2"), "url2")
        .select(
            F.least("rid1", "rid2").alias("id1"),
            F.greatest("rid1", "rid2").alias("id2"),
            "is_match",
        )
    )
    scored = pipeline.score(pages, lab.select("id1", "id2"))
    both = scored.join(lab, ["id1", "id2"]).withColumn(
        "score", (F.col("tfidf_cosine") + F.col("jaro_winkler")) / 2
    )
    auroc = evaluate.auroc(both).collect()[0]["auroc"]
    assert auroc > 0.9, auroc
    m = evaluate.threshold_metrics(both, threshold=0.75).collect()[0]
    assert m["precision"] > 0.8
    assert m["recall"] > 0.5


def test_f1_gate_max_scale(spark):
    """Gate corpus at its guaranteed-disjoint maximum (361 entities + hot)."""
    corpus = make_pages(n_entities=361, hot_key_rows=200)
    pages = spark.createDataFrame(corpus.pages)
    truth = spark.createDataFrame(corpus.truth)
    m = pipeline.evaluate_against_truth(pipeline.resolve(pages), truth).collect()[0]
    assert m["f1"] == 1.0
