"""The target's primary correctness gate (BASELINE.json):

pairwise F1 ≥ 0.99 on labeled Common-Crawl-style pairs at the reference
blocking key — plus determinism of extraction across runs and parallelism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import extract_text_py
from entity_resolution_spark.plans import pipeline
from entity_resolution_spark.sources.synthetic import make_pages


def test_f1_gate(spark):
    corpus = make_pages(n_entities=120, hot_key_rows=30)
    pages = spark.createDataFrame(corpus.pages)
    truth = spark.createDataFrame(corpus.truth)
    m = pipeline.evaluate_against_truth(pipeline.resolve(pages), truth).collect()[0]
    assert m["recall"] >= 0.99
    assert m["precision"] >= 0.99
    assert m["f1"] >= 0.99


def test_labels_respect_blocking_key(spark):
    corpus = make_pages(n_entities=40)
    # negatives share >=1 blocking key with each other by construction
    assert (~corpus.labels.is_match).sum() > 0
    assert corpus.labels.is_match.sum() > 0


def test_extraction_byte_identical_per_url(spark):
    corpus = make_pages(n_entities=30)
    pages = spark.createDataFrame(corpus.pages)
    # Spark-side extraction matches the pinned pure function byte-for-byte
    got = (
        pipeline.extract(pages)
        .select("url", "text")
        .collect()
    )
    expect = {
        r["url"]: extract_text_py(bytes(r["html"]))
        for r in pages.select("url", "html").collect()
    }
    assert all(r["text"] == expect[r["url"]] for r in got)


def test_extraction_deterministic_across_parallelism(spark):
    corpus = make_pages(n_entities=30)
    pages = spark.createDataFrame(corpus.pages)
    h1 = (
        pipeline.extract(pages.repartition(1))
        .select(F.md5(F.concat_ws("|", "url", "text")).alias("h"))
        .agg(F.bit_xor(F.conv(F.substring("h", 1, 15), 16, 10).cast("long")))
        .collect()[0][0]
    )
    h8 = (
        pipeline.extract(pages.repartition(8))
        .select(F.md5(F.concat_ws("|", "url", "text")).alias("h"))
        .agg(F.bit_xor(F.conv(F.substring("h", 1, 15), 16, 10).cast("long")))
        .collect()[0][0]
    )
    assert h1 == h8


def test_resolve_empty_and_single_row(spark):
    import pandas as pd

    empty = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    assert pipeline.resolve(empty).count() == 0
    one = make_pages(n_entities=1, max_cluster=1)
    single = spark.createDataFrame(one.pages.iloc[[0]])
    rows = pipeline.resolve(single).collect()
    assert len(rows) == 1 and rows[0]["component_id"] == rows[0]["record_id"]


def test_f1_gate_robust_across_seeds(spark):
    """The gate is not seed-lucky: three different corpus seeds all resolve
    at F1 = 1.0."""
    for seed in (7, 1234, 20260817):
        corpus = make_pages(n_entities=80, seed=seed)
        pages = spark.createDataFrame(corpus.pages)
        truth = spark.createDataFrame(corpus.truth)
        m = pipeline.evaluate_against_truth(pipeline.resolve(pages), truth).collect()[0]
        assert m["f1"] == 1.0, (seed, m)
