"""Unit tests for operators/webtext.py (repetition signals + chunk dedup)."""

from __future__ import annotations

from entity_resolution_spark.operators.webtext import (
    cross_doc_chunk_dups,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_known_values(spark):
    df = _docs(
        spark,
        [
            (1, "a a a b"),  # bigrams: "a a" x2, "a b" -> dup 2/3
            (2, "x"),  # single token, no bigrams
            (3, "p q p q p q"),  # bigrams: pq x3, qp x2 -> all 5 dup
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}

    r1 = out[1]
    assert r1["n_tokens"] == 4 and r1["n_distinct"] == 2
    assert r1["distinct_ratio"] == 0.5
    assert r1["top_token_count"] == 3 and r1["top_token_frac"] == 0.75
    assert r1["n_bigrams"] == 3 and r1["dup_bigram_frac"] == round(2 / 3, 6)

    r2 = out[2]
    assert r2["n_tokens"] == 1 and r2["n_bigrams"] == 0
    assert r2["dup_bigram_frac"] == 0.0

    r3 = out[3]
    assert r3["n_bigrams"] == 5 and r3["dup_bigram_frac"] == 1.0


def test_repetition_signals_empty_doc_absent(spark):
    # an all-whitespace doc tokenizes to [] and produces no output row
    # (a quality filter would drop it regardless)
    df = _docs(spark, [(1, "  "), (2, "a b")])
    ids = [r["doc_id"] for r in repetition_signals(df).collect()]
    assert ids == [2]


def test_chunk_dups_cross_doc_only(spark):
    shared = " ".join(f"w{i}" for i in range(8))
    df = _docs(
        spark,
        [
            (1, shared + " tail1 tail1x"),
            (2, shared + " other suffix here"),
            (3, "unique words only in this document right here now"),
            # same chunk twice within ONE doc -> n_docs=1 -> excluded
            (4, " ".join(["z"] * 16)),
        ],
    )
    rows = cross_doc_chunk_dups(df, chunk_tokens=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 2 and r["n_occurrences"] == 2
    assert r["sample_doc_id"] == 1


def test_chunk_dups_trailing_partial_chunk_counts(spark):
    # 10 tokens -> chunks of 8 + trailing 2; the trailing partial chunk is
    # itself dedup-able across docs
    tokens = [f"t{i}" for i in range(10)]
    df = _docs(
        spark,
        [
            (1, " ".join(tokens)),
            (2, " ".join([f"a{i}" for i in range(8)] + tokens[8:])),
        ],
    )
    rows = cross_doc_chunk_dups(df, chunk_tokens=8).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2  # the shared 2-token tail chunk
