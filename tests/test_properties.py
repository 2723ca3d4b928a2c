"""Property-based tests (hypothesis) for pure functions + randomized
Spark-vs-oracle comparisons for the distributed operators."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_spark.functions.similarity import jaro_winkler_py
from entity_resolution_spark.functions.text import extract_text_py
from entity_resolution_spark.ml.kmeans import kmeans_fit_predict

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöüß ", min_size=0, max_size=20)


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_jaro_winkler_properties(a, b):
    s = jaro_winkler_py(a, b)
    assert 0.0 <= s <= 1.0
    assert jaro_winkler_py(b, a) == s            # symmetric
    assert jaro_winkler_py(a, a) == 1.0 or a == ""


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_extract_text_total_and_deterministic(data):
    # never raises, always returns a string, pure function of the bytes
    out1 = extract_text_py(data)
    out2 = extract_text_py(data)
    assert isinstance(out1, str) and out1 == out2
    assert "\n" in out1


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=40))
@settings(max_examples=100, deadline=None)
def test_union_find_oracle_properties(edges):
    """The pandas-oracle union-find used in parity tests is itself verified:
    same-component iff connected (BFS ground truth)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from pandas_oracle import components_py

    nodes = sorted({v for e in edges for v in e} | {99})
    comp = components_py(nodes, edges)
    # BFS ground truth
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def reachable(s):
        seen, stack = {s}, [s]
        while stack:
            for nb in adj[stack.pop()]:
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        return seen

    for n in nodes:
        r = reachable(n)
        assert comp[n] == min(r)


@given(
    st.integers(2, 5),
    st.integers(10, 40),
    st.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None)
def test_kmeans_properties(k, n, seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    labels, inertia = kmeans_fit_predict(X, k)
    assert len(labels) == n
    assert inertia >= 0
    assert set(labels) <= set(range(min(k, n)))
    # labels are first-appearance ordered: label of row 0 is always 0
    assert labels[0] == 0


def test_spark_cc_vs_union_find_randomized(spark):
    """5 random graphs: large/small-star CC == union-find oracle."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from pandas_oracle import components_py

    from entity_resolution_spark.operators import components

    rng = np.random.default_rng(42)
    for trial in range(5):
        n = int(rng.integers(5, 60))
        m = int(rng.integers(0, 3 * n))
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        vertices = list(range(n))
        exp = components_py(vertices, edges)
        v = spark.createDataFrame([(x,) for x in vertices], ["record_id"])
        if edges:
            e = spark.createDataFrame(edges, ["src", "dst"])
        else:
            e = spark.createDataFrame([], "src long, dst long")
        got = {
            r["record_id"]: r["component_id"]
            for r in components.assign_components(v, e).collect()
        }
        assert got == exp, f"trial {trial}: mismatch"


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.booleans()), min_size=2, max_size=60
    ).filter(lambda xs: len({y for _, y in xs}) == 2)
)
@settings(max_examples=30, deadline=None)
def test_auroc_binned_equals_naive_ranksum(spark, pairs):
    """The binned, partitioned-window AUROC must equal the naive tie-corrected
    rank-sum on arbitrary (score, label) multisets."""
    from entity_resolution_spark.operators.evaluate import auroc

    scores = np.array([s / 10.0 for s, _ in pairs])
    ys = np.array([1 if y else 0 for _, y in pairs])
    # naive: average ranks (scipy-free)
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=float)
    sorted_s = scores[order]
    i = 0
    while i < len(sorted_s):
        j = i
        while j < len(sorted_s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    npos, nneg = ys.sum(), (1 - ys).sum()
    expect = (ranks[ys == 1].sum() - npos * (npos + 1) / 2.0) / max(npos * nneg, 1)
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in zip(scores, ys)], "score double, is_match boolean"
    )
    got = auroc(df, n_bins=4).collect()[0]["auroc"]
    assert abs(got - round(float(expect), 6)) <= 1e-6, (got, expect)


@given(st.integers(0, 16), st.integers(0, 2**60 - 1), st.integers(0, 2**60 - 1))
@settings(max_examples=200, deadline=None)
def test_simhash_banding_pigeonhole(k, a, b):
    """For any two signatures within Hamming distance k, the (k+1)-band split
    from simhash_bands guarantees at least one identical band."""
    from entity_resolution_spark.operators.dedup import simhash_bands

    # force hamming(a, b) <= k by copying a and flipping at most k bits
    rng = np.random.default_rng((a ^ b) % (2**32))
    b2 = a
    for bit in rng.choice(60, size=min(k, 60), replace=False):
        if rng.random() < 0.7:
            b2 ^= 1 << int(bit)
    hamming = bin(a ^ b2).count("1")
    assert hamming <= k
    bands = simhash_bands(max_hamming=k)
    shared = any(
        (a >> off) & ((1 << w) - 1) == (b2 >> off) & ((1 << w) - 1)
        for off, w in bands
    )
    assert shared


def test_klsh_lloyd_parallelism_invariant(spark):
    """Distributed fixed-iteration Lloyd must produce the identical
    assignment at any partitioning — the determinism contract that makes
    its oracle (and a 1000-executor run) reproducible."""
    import numpy as np
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.klsh import klsh_lloyd

    rng = np.random.default_rng(3)
    rows = [
        (int(i % 7), int(i), float(round(rng.normal(), 6)),
         float(round(rng.normal(), 6)))
        for i in range(140)
    ]
    base = spark.createDataFrame(
        rows, "component_id long, record_id long, f1 double, f2 double"
    )
    results = []
    for parts in (1, 4, 13):
        df = base.repartition(parts)
        got = {
            (r["component_id"], r["record_id"]): r["cluster_id"]
            for r in klsh_lloyd(df, ["f1", "f2"], k=3, iters=4).collect()
        }
        results.append(got)
    assert results[0] == results[1] == results[2]
    assert len(results[0]) == 140
    # every component actually split (k=3 over 20 members)
    comps = {c for c, _ in results[0]}
    for c in comps:
        assert len({v for (cc, _), v in results[0].items() if cc == c}) > 1


# --- codec properties (round 4) ---------------------------------------------

_img_shapes = st.tuples(st.integers(1, 24), st.integers(1, 24))


@given(_img_shapes, st.integers(1, 4), st.randoms(use_true_random=False))
@settings(max_examples=40, deadline=None)
def test_png_round_trip_property(shape, nch, rnd):
    from entity_resolution_spark.operators.multimodal import (
        decode_image_bytes,
        encode_png,
        _luma,
    )

    h, w = shape
    rng = np.random.default_rng(rnd.randrange(2**32))
    if nch == 1:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        want = px
    else:
        px = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
        if nch == 2:
            want = px[:, :, 0]
        else:
            want = _luma(px[:, :, 0], px[:, :, 1], px[:, :, 2])
    w2, h2, got = decode_image_bytes(encode_png(px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(got, want)


@given(_img_shapes, st.randoms(use_true_random=False))
@settings(max_examples=25, deadline=None)
def test_jpeg_gray_round_trip_property(shape, rnd):
    from entity_resolution_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    h, w = shape
    rng = np.random.default_rng(rnd.randrange(2**32))
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    w2, h2, got = decode_jpeg(encode_jpeg_gray(px, quant=1))
    assert (w2, h2) == (w, h)
    # quant=1 pipeline exact up to DCT float rounding
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


@given(st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=30), min_size=1,
    max_size=8,
))
@settings(max_examples=60, deadline=None)
def test_bpe_encode_join_invariant(texts):
    """For ANY trained merge table, concatenating a text's tokens
    reproduces its whitespace-normalized words + end sentinels — BPE only
    regroups characters, never alters them."""
    from entity_resolution_spark.functions.bpe import bpe_encode, train_bpe

    merges = train_bpe(texts, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        toks = bpe_encode(t, ranks)
        want = "".join(w + " " for w in t.split())
        assert "".join(toks) == want
        # token count never exceeds character count of the normalized text
        assert len(toks) <= max(len(want), 1)


@given(_img_shapes, st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None)
def test_gif_round_trip_property(shape, rnd):
    from entity_resolution_spark.operators.gif import decode_gif, encode_gif

    h, w = shape
    rng = np.random.default_rng(rnd.randrange(2**32))
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    w2, h2, got = decode_gif(encode_gif(px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(got, px)  # identity gray palette ⇒ exact


@given(_img_shapes, st.integers(1, 6), st.randoms(use_true_random=False))
@settings(max_examples=25, deadline=None)
def test_jpeg_progressive_equals_baseline_property(shape, quant, rnd):
    """For ANY image and quant, the progressive scan script reconstructs
    the same quantized coefficients as the sequential encoding, so the two
    decodes must agree byte-for-byte."""
    from entity_resolution_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    h, w = shape
    rng = np.random.default_rng(rnd.randrange(2**32))
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(px, quant=quant))
    prog = decode_jpeg(encode_jpeg_progressive_gray(px, quant=quant))
    assert base[:2] == prog[:2] == (w, h)
    assert np.array_equal(base[2], prog[2])


@given(
    st.integers(64, 900), st.sampled_from([1, 2]),
    st.sampled_from(["independent", "mid_side", "left_side", "right_side"]),
    st.integers(0, 2), st.randoms(use_true_random=False),
)
@settings(max_examples=25, deadline=None)
def test_flac_round_trip_property(n, n_ch, stereo_mode, porder, rnd):
    """Losslessness is unconditional: any PCM, any length/channel/stereo
    mode/partition order, decode(encode(x)) == x exactly."""
    from entity_resolution_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(rnd.randrange(2**32))
    pcm = rng.integers(-32768, 32768, size=(n, n_ch)).astype(np.int64)
    if n_ch == 1:
        pcm = pcm[:, 0]
        stereo_mode = "independent"
    data = encode_flac(16000, pcm, block_size=256, stereo_mode=stereo_mode,
                       partition_order=porder)
    sr, bps, out = decode_flac(data)
    want = pcm if pcm.ndim == 2 else pcm[:, None]
    assert sr == 16000 and np.array_equal(out, want)
