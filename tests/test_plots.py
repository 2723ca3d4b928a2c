"""S7 plot sinks: valid PNG output, bounded collects, determinism."""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F

from entity_resolution_spark.operators import blocking, components, pairs
from entity_resolution_spark.operators.blocking import BlockingStage
from entity_resolution_spark.plans import plots
from entity_resolution_spark.sources.synthetic import make_pages


def _png_size(path: str) -> tuple[int, int]:
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    assert len(raw) == h * (1 + 3 * w)  # filter byte + RGB per row
    return w, h


def test_metric_curves_png(tmp_path):
    p = str(tmp_path / "curves.png")
    plots.plot_metric_curves(
        {"loss": [1.0, 0.6, 0.4, 0.3], "aux": [2.0, 1.0, 0.8, 0.7]}, p
    )
    assert _png_size(p) == (640, 400)
    # deterministic bytes
    p2 = str(tmp_path / "curves2.png")
    plots.plot_metric_curves(
        {"loss": [1.0, 0.6, 0.4, 0.3], "aux": [2.0, 1.0, 0.8, 0.7]}, p2
    )
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_score_histogram_png(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 5), (1, 12), (2, 3)], "bin long, n_pairs long"
    )
    p = str(tmp_path / "hist.png")
    plots.plot_score_histogram(df, p)
    assert _png_size(p) == (640, 400)


def test_component_graph_png(spark, tmp_path):
    corpus = make_pages(n_entities=20)
    pages = spark.createDataFrame(corpus.pages)
    from entity_resolution_spark.plans import pipeline

    recs = pipeline.extract(pages)
    blocks = blocking.block(
        recs.select(F.col("record_id"), F.col("title")),
        [BlockingStage("title", "phonetic_combination")],
    )
    pruned = pairs.prune(pairs.edge_weights(blocks))
    assignment = components.assign_components(
        recs.select("record_id"),
        pruned.select(F.col("id1").alias("src"), F.col("id2").alias("dst")),
    )
    p = str(tmp_path / "graph.png")
    plots.plot_component_graph(pruned, assignment, p)
    assert _png_size(p) == (800, 600)
