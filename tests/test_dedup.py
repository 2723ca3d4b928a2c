"""Dedup operator family: exact, minhash, simhash, n-gram jaccard, embedding."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from entity_resolution_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark):
    d = _docs(spark, [(1, "A  b"), (2, "a b"), (3, "c")])
    got = {r["keep_doc_id"]: r["dup_count"] for r in dedup.exact_dedup(d).collect()}
    assert got == {1: 2, 3: 1}  # whitespace+case-normalized dup collapsed


def test_char_shingles(spark):
    d = _docs(spark, [(1, "abcd")])
    got = sorted(r["shingle"] for r in dedup.char_shingles(d, "doc_id", "text").collect())
    assert got == ["abc", "bcd"]


def test_minhash_identical_docs_agree(spark):
    d = _docs(spark, [(1, "x y z w"), (2, "x y z w"), (3, "p q r s")])
    sig = dedup.minhash_signatures(d)
    rows = {r["doc_id"]: [r[f"h{i}"] for i in range(8)] for r in sig.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    pairs = {(r["id1"], r["id2"]) for r in dedup.minhash_band_pairs(sig).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs
    est = dedup.minhash_jaccard_estimate(
        sig, spark.createDataFrame([(1, 2), (1, 3)], ["id1", "id2"])
    )
    got = {(r["id1"], r["id2"]): r["jaccard_est"] for r in est.collect()}
    assert got[(1, 2)] == 1.0 and got[(1, 3)] < 0.5


def test_minhash_estimates_jaccard(spark):
    # two docs sharing half their tokens -> estimate near 1/3 (|A∩B|/|A∪B|)
    a = " ".join(f"t{i}" for i in range(50))
    b = " ".join(f"t{i}" for i in range(25, 75))
    d = _docs(spark, [(1, a), (2, b)])
    sig = dedup.minhash_signatures(d, num_hashes=8)
    est = dedup.minhash_jaccard_estimate(
        sig, spark.createDataFrame([(1, 2)], ["id1", "id2"])
    ).collect()[0]["jaccard_est"]
    assert 0.0 < est < 0.8  # true jaccard = 25/75 = 1/3; 8 hashes is coarse


def test_simhash_near_dup(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = base.replace("w3 ", "w3x ")  # one token changed
    far = " ".join(f"z{i}" for i in range(60))
    d = _docs(spark, [(1, base), (2, near), (3, far), (4, base)])
    sig = dedup.simhash_signatures(d)
    rows = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert rows[1] == rows[4]
    h12 = bin(rows[1] ^ rows[2]).count("1")
    h13 = bin((rows[1] ^ rows[3]) & ((1 << 64) - 1)).count("1")
    assert h12 < h13
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in dedup.simhash_near_pairs(sig, max_hamming=8).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 0
    assert (1, 3) not in pairs


def test_ngram_jaccard(spark):
    d = _docs(spark, [(1, "abcd"), (2, "abcd"), (3, "wxyz")])
    pairs_df = spark.createDataFrame([(1, 2), (1, 3)], ["id1", "id2"])
    got = {
        (r["id1"], r["id2"]): r["ngram_jaccard"]
        for r in dedup.ngram_jaccard_pairs(d, pairs_df).collect()
    }
    assert got[(1, 2)] == 1.0 and got[(1, 3)] == 0.0


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    rows = []
    for i in range(10):
        v = rng.normal(size=16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # plant a near-dup pair (ids 100, 101)
    v = base / np.linalg.norm(base)
    rows.append((100, [float(x) for x in v]))
    w = base + rng.normal(scale=0.01, size=16)
    w = w / np.linalg.norm(w)
    rows.append((101, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(emb, threshold=0.95).collect()
    }
    assert (100, 101) in got and got[(100, 101)] > 0.99


def test_dedup_keep_list(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "THE quick   brown fox jumps over the lazy dog today"),  # exact (normalized)
        (3, "the quick brown fox jumps over the lazy cat today"),    # near (1 token)
        (4, "completely different content about spark pipelines"),
        (5, "completely different content about spark pipelines"),   # exact dup of 4
    ]
    d = _docs(spark, rows)
    got = {r["doc_id"]: (r["keep_id"], r["is_kept"]) for r in
           dedup.dedup_keep_list(d, jaccard_threshold=0.7).collect()}
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)   # transitively grouped via near-dup
    assert got[4] == (4, True)
    assert got[5] == (4, False)
    # kept set = one representative per group
    assert sorted(k for k, (kid, kept) in got.items() if kept) == [1, 4]


def test_winnow_fingerprints_guarantee_and_ties(spark):
    """Winnowing guarantee (SIGMOD'03): documents sharing a substring of
    length >= k + window - 1 share >= 1 fingerprint hash; and the per-window
    minimum breaks hash ties by the rightmost position."""
    k, w = 5, 4
    shared = "abcdefgh"  # length 8 = k + w - 1
    rows = [
        (1, "xxxx" + shared + "yyyyyy"),
        (2, "qqqqqqq" + shared + "pppp"),
        (3, "zzzzzzzzzzzzzzzzzz"),
    ]
    d = _docs(spark, rows)
    fp = dedup.winnow_fingerprints(d, k=k, window=w)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # tie-break: an all-identical-gram doc has one hash; selected positions
    # must be the RIGHTMOST of each window -> positions step by 1 from w'th
    sel = sorted(
        (r["fp_pos"]) for r in fp.where("doc_id = 3").collect()
    )
    n_grams = len(rows[2][1]) - (k - 1)
    assert sel == list(range(w, n_grams + 1)), sel


def test_winnow_short_doc(spark):
    """Doc shorter than k+window still yields >= 1 fingerprint (partial
    window), and empty-ish docs yield none."""
    d = _docs(spark, [(1, "abcdef"), (2, "abc")])
    got = dedup.winnow_fingerprints(d, k=5, window=4).collect()
    docs = {r["doc_id"] for r in got}
    assert 1 in docs and 2 not in docs  # len 3 < k -> no grams


def test_minhash_bucket_cap_purges_megabucket(spark):
    """The LSH skew guard: an over-cap bucket emits no pairs, while pairs
    that also agree on another (small) band still surface."""
    from entity_resolution_spark.operators import dedup

    # docs 1..6 share band-0 bucket (h0,h1); docs 1,2 also share band 1
    rows = [(i, 10, 20, (100 if i in (1, 2) else 100 + i), 200, 0, 0, 0, 0)
            for i in range(1, 7)]
    sig = spark.createDataFrame(
        rows, "doc_id long, h0 long, h1 long, h2 long, h3 long, "
              "h4 long, h5 long, h6 long, h7 long")
    full = dedup.minhash_band_pairs(sig)
    assert full.count() == 15  # all C(6,2) via the mega band-0 bucket
    capped = dedup.minhash_band_pairs(sig, max_bucket_size=3)
    got = {(r["id1"], r["id2"]) for r in capped.collect()}
    assert got == {(1, 2)}  # survives via its band-1 bucket of size 2


def test_simhash_bucket_cap(spark):
    from entity_resolution_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(1, 6)]
        + [(10, "totally different words here")],
        ["doc_id", "text"],
    )
    sig = dedup.simhash_signatures(docs)
    full = dedup.simhash_near_pairs(sig, max_hamming=3)
    assert full.count() == 10  # C(5,2) identical docs
    capped = dedup.simhash_near_pairs(sig, max_hamming=3, max_bucket_size=3)
    assert capped.count() == 0  # all 4 bands hold the same 5-doc mega bucket


def test_duplicated_spans_merging_and_thresholds(spark):
    from entity_resolution_spark.operators.dedup import duplicated_spans

    quote = " ".join(f"q{i}" for i in range(12))  # 12 shared tokens
    rows = [
        # docs 1+2 share the 12-token quote at different offsets
        (1, "a b c " + quote + " x y"),
        (2, quote + " z"),
        # doc 3: long unique text, nothing shared
        (3, " ".join(f"u{i}" for i in range(30))),
        # doc 4: shares an 8-gram with doc 5 AND a disjoint one later ->
        # two separate spans
        (4, "s0 s1 s2 s3 s4 s5 s6 s7 GAP1 GAP2 t0 t1 t2 t3 t4 t5 t6 t7"),
        (5, "pre s0 s1 s2 s3 s4 s5 s6 s7 mid t0 t1 t2 t3 t4 t5 t6 t7"),
        # doc 6: shorter than 8 tokens -> no positions at all
        (6, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in duplicated_spans(df, gram_tokens=8).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["start_tok"], r["end_tok"], r["n_grams"])
        )
    for v in out.values():
        v.sort()
    # 12-token quote = 5 consecutive duplicated 8-grams merged into ONE span
    assert out[1] == [(3, 14, 5)]   # tokens 3..14 = the quote
    assert out[2] == [(0, 11, 5)]
    assert 3 not in out and 6 not in out
    # two disjoint spans, not merged across the gap
    assert out[4] == [(0, 7, 1), (10, 17, 1)]
    assert out[5] == [(1, 8, 1), (10, 17, 1)]


def test_duplicated_spans_refined_exact_length(spark):
    """Two docs share a span of exactly L+2 = 10 tokens with differing
    neighbors on both sides: the refined operator reports exactly that
    span (start/end/n_grams), nothing wider."""
    from entity_resolution_spark.operators.dedup import duplicated_spans

    shared = " ".join(f"s{i}" for i in range(10))  # 10 tokens = 3 8-grams
    doc_a = " ".join(f"a{i}" for i in range(6)) + " " + shared + " " + \
        " ".join(f"A{i}" for i in range(6))
    doc_b = " ".join(f"b{i}" for i in range(4)) + " " + shared + " " + \
        " ".join(f"B{i}" for i in range(4))
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["start_tok"], r["end_tok"], r["n_grams"])
        for r in duplicated_spans(
            df, gram_tokens=8, refine_boundaries=True
        ).collect()
    }
    assert got == {1: (6, 15, 3), 2: (4, 13, 3)}


def test_duplicated_spans_refinement_splits_false_merges(spark):
    """Doc A's 8-gram at p duplicates against B, its 8-gram at p+1 against
    C, but NO 9-token string is shared with anyone. Plain islands merge
    p and p+1 into one 9-token span (overstating the duplicate); the
    boundary refinement reports two overlapping 8-token spans instead."""
    from entity_resolution_spark.operators.dedup import duplicated_spans

    t = [f"t{i}" for i in range(9)]  # t0..t8
    doc_a = " ".join([f"a{i}" for i in range(4)] + t
                     + [f"A{i}" for i in range(4)])
    doc_b = " ".join([f"b{i}" for i in range(4)] + t[:8]
                     + [f"B{i}" for i in range(4)])  # t0..t7 then b-junk
    doc_c = " ".join([f"c{i}" for i in range(4)] + t[1:]
                     + [f"C{i}" for i in range(4)])  # c-junk then t1..t8
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )

    plain = {
        (r["doc_id"], r["start_tok"], r["end_tok"], r["n_grams"])
        for r in duplicated_spans(df, gram_tokens=8).collect()
    }
    # unrefined: A's covered positions 4 and 5 merge into ONE claimed
    # 9-token duplicated span even though t0..t8 exists only in A
    assert (1, 4, 12, 2) in plain

    refined = {
        (r["doc_id"], r["start_tok"], r["end_tok"], r["n_grams"])
        for r in duplicated_spans(
            df, gram_tokens=8, refine_boundaries=True
        ).collect()
    }
    assert (1, 4, 11, 1) in refined and (1, 5, 12, 1) in refined
    assert (1, 4, 12, 2) not in refined
    # B and C each still report their genuine 8-token spans
    assert (2, 4, 11, 1) in refined and (3, 4, 11, 1) in refined


def test_duplicated_spans_refined_partition_invariance(spark):
    from entity_resolution_spark.operators.dedup import duplicated_spans

    shared = " ".join(f"s{i}" for i in range(12))
    rows = [(i, f"u{i}x u{i}y " + shared + f" z{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, duplicated_spans(
        df, refine_boundaries=True).collect()))
    b = sorted(map(tuple, duplicated_spans(
        df.repartition(13), refine_boundaries=True).collect()))
    assert a == b and len(a) == 6


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _sem(spark, rows, cents, **kw):
    out = dedup.semantic_dedup(_emb_df(spark, rows), cents, **kw)
    return {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}


def test_semantic_dedup_basic(spark):
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),        # cluster 0, most central
        (11, [0.999, 0.045, 0.0, 0.0]),    # ~same direction -> dropped
        (12, [0.7, 0.0, 0.714, 0.0]),      # cos to 10 = 0.7 < tau -> kept
        (13, [0.0, 1.0, 0.0, 0.0]),        # cluster 1, alone -> kept
    ]
    got = _sem(spark, rows, cents, threshold=0.9)
    assert got == {10: (0, True), 11: (0, False), 12: (0, True), 13: (1, True)}


def test_semantic_dedup_keeps_most_central_not_lowest_id(spark):
    cents = [[1.0, 0.0, 0.0, 0.0]]
    rows = [
        (1, [0.95, 0.312, 0.0, 0.0]),  # farther from centroid, LOWER id
        (2, [1.0, 0.0, 0.0, 0.0]),     # most central, higher id
    ]
    got = _sem(spark, rows, cents, threshold=0.9)
    assert got == {1: (0, False), 2: (0, True)}


def test_semantic_dedup_max_over_earlier_not_only_kept(spark):
    # a at 0deg, b at 25deg, c at 50deg; tau = cos(30deg): b drops against
    # a, and c drops against b EVEN THOUGH b itself was dropped (SemDeDup's
    # max-over-the-upper-triangle rule) - cos(a,c) alone is below tau.
    import math

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    cents = [[1.0, 0.0, 0.0, 0.0]]
    got = _sem(
        spark, [(1, v(0)), (2, v(25)), (3, v(50))], cents,
        threshold=math.cos(math.radians(30)),
    )
    assert got == {1: (0, True), 2: (0, False), 3: (0, False)}


def test_semantic_dedup_max_cluster_size_purges_pairwise(spark):
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    near = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.045, 0.0, 0.0]),
        (3, [0.998, 0.063, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    # cluster 0 has 3 mutual near-dups but exceeds the cap -> all kept
    got = _sem(spark, near, cents, threshold=0.9, max_cluster_size=2)
    assert got == {1: (0, True), 2: (0, True), 3: (0, True), 4: (1, True)}
    # without the cap the two tails drop
    got = _sem(spark, near, cents, threshold=0.9)
    assert got == {1: (0, True), 2: (0, False), 3: (0, False), 4: (1, True)}


def test_semantic_dedup_partition_invariant(spark):
    import math

    rows = [
        (i, [math.cos(i / 7.0), math.sin(i / 7.0),
             math.cos(i / 3.0) * 0.2, 0.1])
        for i in range(40)
    ]
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.5, 0.5, 0.5, 0.0]]
    a = _sem(spark, rows, cents, threshold=0.98)
    df = _emb_df(spark, rows).repartition(7)
    out = dedup.semantic_dedup(df, cents, threshold=0.98)
    b = {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert a == b and len(a) == 40 and not all(k for _, k in a.values())
