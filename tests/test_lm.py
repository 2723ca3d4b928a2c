"""Unit tests for operators/lm.py (corpus-trained bigram LM scoring)."""

from __future__ import annotations

import math
import re
from collections import Counter

from entity_resolution_spark.operators.lm import (
    bigram_cross_entropy,
    lm_bucket,
)


def _expected(corpus: dict[int, str], alpha: int = 1) -> dict[int, tuple]:
    """Independent pure-Python mini-oracle mirroring the documented math."""
    toks = {
        d: [t for t in re.split(r"[^a-z]+", s.lower()) if t]
        for d, s in corpus.items()
    }
    inst = {d: list(zip(t, t[1:])) for d, t in toks.items() if len(t) >= 2}
    c12 = Counter(b for bs in inst.values() for b in bs)
    c1 = Counter(b[0] for bs in inst.values() for b in bs)
    vocab = len({t for ts in toks.values() for t in ts})
    out = {}
    for d, bs in inst.items():
        lp = [
            round(
                math.log((c12[b] + alpha) / (c1[b[0]] + alpha * vocab)) * 1e6
            )
            for b in bs
        ]
        out[d] = (len(bs), -sum(lp) // len(lp))
    return out


def test_bigram_ce_known_values(spark):
    corpus = {
        1: "the cat sat on the mat",
        2: "the cat sat on the cat",
        3: "a dog barked at the cat",
        4: "one",  # <2 tokens: excluded
        5: "Punct, CASE; and 123 digits split: the cat sat",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ce_micro"])
        for r in bigram_cross_entropy(df).collect()
    }
    assert got == _expected(corpus)
    assert 4 not in got
    # repeated bigrams are cheaper: doc 2 re-uses (the,cat) -> lower ce
    assert got[2][1] < got[1][1]


def test_bigram_ce_partition_invariant_exactly(spark):
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta word"),
            F.substring(
                F.lit("abcdefghijklmnopq"),
                (F.col("id") % 17 + 1).cast("int"),
                1,
            ),
            F.lit(" alpha beta epsilon"),
        ).alias("text"),
    )
    a = {
        r["doc_id"]: r["ce_micro"] for r in bigram_cross_entropy(df).collect()
    }
    b = {
        r["doc_id"]: r["ce_micro"]
        for r in bigram_cross_entropy(df.repartition(13)).collect()
    }
    assert a == b  # integer arithmetic: exact at ANY partitioning


def test_lm_bucket_literal_thresholds(spark):
    df = spark.createDataFrame(
        [(1, 500_000), (2, 1_000_000), (3, 2_000_000), (4, 5_000_000)],
        "doc_id long, ce_micro long",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in lm_bucket(df, head=1_000_000, middle=2_000_000).collect()
    }
    assert got == {1: "head", 2: "head", 3: "middle", 4: "tail"}
