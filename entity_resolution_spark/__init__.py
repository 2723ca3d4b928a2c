"""entity_resolution_spark — a PySpark-native record-linkage (entity-resolution) engine.

A from-scratch re-expression of the capabilities of the reference pipeline
``sergiosolorzano/entity_resolution`` (single-node pandas/sklearn/networkx/torch)
as an idiomatic Spark DataFrame pipeline over Common-Crawl-style web-page tables
``(url, warc_ts, html, text, lang)``:

    extract -> block -> pairs (meta-blocking weight + prune) -> connected
    components -> per-component KLSH clustering / pairwise scoring -> evaluate

Designed for a multi-executor cluster at ~10^12-document scale: long-form
``(block_key, record_id)`` tables (never collected lists), skew-aware block-size
caps + salting, broadcast of small dimension tables, iterative
large-star/small-star connected components with per-iteration checkpointing,
and Arrow-batched pandas UDFs for every Python crossing.
"""

__version__ = "0.1.0"
