"""Multimodal binary-column plumbing + resumable stage checkpoints."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators import multimodal as MM
from entity_resolution_spark.plans.checkpoint import StageCheckpointer, resolve_checkpointed
from entity_resolution_spark.sources.synthetic import make_pages


def _image_df(spark, n=6):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        px = rng.integers(0, 256, size=(8, 10), dtype=np.uint8)
        rows.append((i, bytearray(MM.encode_image(10, 8, px))))
    return spark.createDataFrame(rows, "doc_id long, image binary"), rows


def test_image_features_and_resize(spark):
    df, rows = _image_df(spark)
    feats = {r["doc_id"]: r for r in MM.image_features(df).collect()}
    assert len(feats) == 6
    for r in feats.values():
        assert (r["width"], r["height"], r["channels"]) == (10, 8, 1)
        assert 0 <= r["mean_luma"] <= 255
    small = MM.image_resize(df, 5, 4).collect()
    w, h, px = MM.decode_image_bytes(bytes(small[0]["image"]))
    assert (w, h) == (5, 4) and px.shape == (4, 5)


def test_audio_features(spark):
    sr = 16000
    t = np.arange(sr)
    wave = (np.sin(2 * np.pi * 440 * t / sr) * 10000).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(MM.encode_audio(sr, wave)))], "doc_id long, audio binary"
    )
    r = MM.audio_features(df).collect()[0]
    assert r["sample_rate"] == sr and r["n_samples"] == sr
    assert abs(r["duration_s"] - 1.0) < 1e-9
    assert abs(r["rms"] - 10000 / np.sqrt(2)) / (10000 / np.sqrt(2)) < 0.01


def test_video_frame_sample(spark):
    frames = [np.full((4, 4), i, dtype=np.uint8) for i in range(6)]
    df = spark.createDataFrame(
        [(7, bytearray(MM.encode_video(4, 4, frames)))], "doc_id long, video binary"
    )
    got = MM.video_frame_sample(df, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in got) == [0, 2, 4]
    _, _, px = MM.decode_image_bytes(bytes(sorted(got, key=lambda r: r["frame_idx"])[1]["frame"]))
    assert px[0, 0] == 2


def test_real_codec_hook_raises(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_image_bytes(b"\x89PNG\r\n\x1a\n....")


def test_checkpoint_resume(spark, tmp_path):
    corpus = make_pages(n_entities=25)
    pages = spark.createDataFrame(corpus.pages)
    ckpt = StageCheckpointer(spark, str(tmp_path), "run1")
    out1 = resolve_checkpointed(pages, ckpt).collect()
    assert ckpt.is_done("04_components")
    metrics = ckpt.metrics()
    assert {m["stage"] for m in metrics} == {
        "00_extract", "01_block", "02_edges", "03_pruned", "04_components",
    }
    assert all(m["rows"] > 0 for m in metrics[:3])
    lin = ckpt.lineage("01_block")
    assert lin.agg(F.sum("n_rows")).collect()[0][0] == next(
        m["rows"] for m in metrics if m["stage"] == "01_block"
    )

    # resume: pass an EMPTY input — stages must come from the snapshots, so
    # the result is identical without recomputation
    empty = spark.createDataFrame([], pages.schema)
    out2 = resolve_checkpointed(empty, ckpt).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))

    # invalidate a mid stage: downstream snapshot still present -> final
    # output unchanged; the invalidated stage alone is rebuilt lazily
    ckpt.invalidate("03_pruned")
    assert not ckpt.is_done("03_pruned")
    out3 = resolve_checkpointed(pages, ckpt).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out3))
