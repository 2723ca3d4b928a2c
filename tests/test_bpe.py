"""Real BPE tokenizer: known-merge training, encode/round-trip invariants,
Spark UDF partition invariance, and packing over real BPE budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.functions.bpe import (
    bpe_encode,
    bpe_token_count,
    train_bpe,
    train_bpe_from_corpus,
)


def test_train_bpe_known_merges():
    # words: ('a','b','a','b ') x4, ('a','b ') x2 -> counts (a,b)=4,
    # (b,a)=4, (a,'b ')=6 -> first merge is ('a','b ');
    # then (a,b)=4 ties (b,'ab ')=4 -> lexicographic -> ('a','b');
    # then ('ab','ab ') x4
    texts = ["abab abab abab ab ab", "abab"]
    merges = train_bpe(texts, n_merges=3)
    assert merges == [("a", "b "), ("a", "b"), ("ab", "ab ")]


def test_train_bpe_tie_break_is_lexicographic():
    # 'xy' and 'ab' both appear exactly twice -> lexicographically smaller
    # pair merges first, independent of input order
    m1 = train_bpe(["xy xy ab ab"], n_merges=1)
    m2 = train_bpe(["ab ab xy xy"], n_merges=1)
    assert m1 == m2 == [("a", "b ")]


def test_bpe_encode_reconstructs_text():
    texts = ["the cat sat on the mat", "the mat the cat"]
    merges = train_bpe(texts, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        toks = bpe_encode(t, ranks)
        assert "".join(toks).replace(" ", " ").split() == t.split()
        # concatenation with word-end sentinels reproduces the words
        assert "".join(toks) == " ".join(t.split()) + " "


def test_bpe_compresses_repetitive_text():
    texts = ["banana banana banana bandana"] * 5
    merges = train_bpe(texts, n_merges=100)
    ranks = {p: i for i, p in enumerate(merges)}
    n_chars = len("banana")
    toks = bpe_encode("banana", ranks)
    assert len(toks) < n_chars  # merges actually merged
    # unseen word still encodes (falls back toward characters)
    assert bpe_encode("zzz", ranks)


def test_bpe_udf_partition_invariant(spark):
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("token"), (F.col("id") % 7).cast("string"),
            F.lit(" repeated words words words ids "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    merges = train_bpe_from_corpus(docs, n_merges=200, max_sample_docs=100)
    assert merges  # trained something
    a = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count(F.col("text"), merges).alias("n")
        ).collect()
    }
    b = {
        r["doc_id"]: r["n"]
        for r in docs.repartition(17)
        .select("doc_id", bpe_token_count(F.col("text"), merges).alias("n"))
        .collect()
    }
    assert a == b and all(v > 0 for v in a.values())
    # the trained tokenizer compresses: fewer tokens than characters
    chars = {r["doc_id"]: r["c"] for r in docs.select(
        "doc_id", F.length("text").alias("c")).collect()}
    assert sum(a.values()) < sum(chars.values())


def test_pack_sequences_over_real_bpe_counts(spark):
    from entity_resolution_spark.operators.packing import pack_sequences

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("some document body with words "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    merges = train_bpe_from_corpus(docs, n_merges=100, max_sample_docs=200)
    counted = docs.select(
        "doc_id", bpe_token_count(F.col("text"), merges).alias("n_tokens")
    )
    packed = pack_sequences(counted, budget_tokens=64, n_shards=8)
    rows = packed.collect()
    assert len(rows) == 500
    # next-fit guarantee: pre-assignment total within every pack < budget
    by_pack = {}
    for r in rows:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r["n_tokens"])
    for toks in by_pack.values():
        assert sum(toks[:-1]) < 64
    # partition invariance end-to-end
    rows2 = pack_sequences(
        counted.repartition(13), budget_tokens=64, n_shards=8
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
