"""Web-corpus quality/repetition operators for LLM training-data pipelines.

Gopher-style repetition signals (Rae et al., arXiv:2112.11446 §A1.1) and
CCNet-style cross-document chunk deduplication (Wenzek et al.,
arXiv:1911.00359) over the ``documents`` table.  Both are pure relational
plans: tokenization and chunking happen JVM-side as array expressions, the
per-(doc,token) / per-chunk counting is a hash aggregate with map-side
partial combine, so each operator is one shuffle keyed by (doc_id, token) /
chunk hash — no Python crossing, no window over an unpartitioned frame, no
per-row quadratic array scans (a 10k-token page costs O(n) rows, not O(n²)
higher-order-function steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition/diversity signals (Gopher filter family).

    Returns one row per document:
      n_tokens, n_distinct, distinct_ratio      — vocabulary diversity
      top_token_count, top_token_frac           — most-frequent-token mass
      n_bigrams, dup_bigram_frac                — fraction of bigram
                                                  occurrences whose bigram
                                                  appears more than once
    Ratios are single int/int double divisions rounded to 6dp (exact and
    engine-independent: both operands are integers < 2^53).

    Scale shape: two hash aggregates keyed by (doc, token) and (doc,
    bigram) — partially combined map-side — then a per-doc rollup and one
    doc-keyed join.  Bigrams are built JVM-side with ``zip_with`` over two
    array slices, so no self-join on token position is needed.
    """
    toks = tokens(F.col(text_col))
    tok = docs.select(id_col, F.explode(toks).alias("tok"))

    tc = tok.groupBy(id_col, "tok").agg(F.count("*").alias("cnt"))
    per_doc = tc.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_token_count"),
    )

    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select(id_col, F.explode(bigrams).alias("bg"))
    bc = bg.groupBy(id_col, "bg").agg(F.count("*").alias("cnt"))
    bg_doc = bc.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_occ"),
    )

    joined = per_doc.join(bg_doc, id_col, "left")
    n_bigrams = F.coalesce(F.col("n_bigrams"), F.lit(0))
    dup_occ = F.coalesce(F.col("dup_occ"), F.lit(0))
    return joined.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
        F.col("top_token_count").cast("long").alias("top_token_count"),
        F.round(F.col("top_token_count") / F.col("n_tokens"), 6).alias(
            "top_token_frac"
        ),
        n_bigrams.cast("long").alias("n_bigrams"),
        F.round(dup_occ / F.greatest(n_bigrams, F.lit(1)), 6).alias(
            "dup_bigram_frac"
        ),
    )


def benchmark_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appx C / Gopher §A1.2 style): flag
    training documents that share any overlapping ``n``-token gram with a
    benchmark/eval document.

    Returns one row per contaminated training doc:
    ``(doc_id, n_contaminated_grams, n_bench_docs)`` — how many distinct
    grams hit and how many distinct benchmark docs they came from.

    Scale shape: grams are built JVM-side (``transform`` over a ``sequence``
    of start offsets + ``slice``) and reduced to md5 hashes *inside the
    projection* — gram text never leaves the scan.  The benchmark side
    (eval suites are tiny next to a 100-TB training corpus) is
    distinct-reduced and broadcast, so the probe is a broadcast hash join
    on the gram hash followed by one per-doc aggregate: zero shuffles of
    the training grams beyond the final doc-keyed combine.
    """
    def grams(df: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
        sz = F.size(toks)
        g = F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(1), sz - F.lit(n - 1)),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(id_col, F.explode(F.array_distinct(g)).alias("gram"))

    bench_grams = grams(bench).select(
        F.col("gram"), F.col(id_col).alias("bench_doc_id")
    ).distinct()
    return (
        grams(train)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_contaminated_grams"),
            F.countDistinct("bench_doc_id").alias("n_bench_docs"),
        )
    )


# PII patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, \b supported by both.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII detection + redaction (C4/CCNet-style scrub stage):
    counts of email / IPv4 / phone matches and the md5 of the text with all
    three classes replaced by class tags.

    Pure JVM column expressions (``regexp_count`` / chained
    ``regexp_replace``) — one narrow projection, no shuffle, no Python.
    The redacted text itself is reduced to a fingerprint so only ~50 bytes
    per row leave the scan; a real scrub pipeline would write the redacted
    column to the sink instead.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        id_col,
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


def cross_doc_chunk_dups(
    docs: DataFrame,
    chunk_tokens: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated chunks (CCNet paragraph-dedup analog).

    Documents are cut into non-overlapping ``chunk_tokens``-token chunks
    (the trailing partial chunk is kept); a chunk duplicated across >=
    ``min_docs`` distinct documents is reported with its occurrence counts
    and the smallest containing doc id.

    Scale shape: chunking is a pure array projection (``transform`` over a
    ``sequence`` of chunk indices + ``slice``), then a single hash aggregate
    keyed by the chunk's md5 — the chunk *text* never shuffles, only its
    hash.  Output is bounded by the number of duplicated chunks.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.floor((n + F.lit(chunk_tokens - 1)) / F.lit(chunk_tokens)).cast("int")
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    c = docs.select(id_col, F.explode(chunks).alias("chunk"))
    return (
        c.groupBy(F.md5("chunk").alias("chunk_md5"))
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min(id_col).alias("sample_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    pages: DataFrame,
    min_docs: int = 5,
    text_col: str = "page",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Line-level boilerplate removal (RefinedWeb / CCNet line-dedup stage).

    A line whose trimmed form occurs in >= ``min_docs`` distinct documents
    of the same ``group_col`` (site/domain) is boilerplate — cookie banners,
    nav bars, copyright footers — and is dropped; the page is reassembled
    from the surviving lines in original order.

    Returns one row per input page: ``doc_id, n_lines, n_boiler, cleaned``
    (the reassembled text; hash it downstream if only identity is needed).

    Scale shape: lines are a ``posexplode`` projection; the boilerplate set
    is one hash aggregate keyed by (group, trimmed line) with map-side
    partial distinct; membership is a shuffle equi-join on that same key
    (the aggregate output is far smaller than the line table; a deployment
    that knows its boiler set is small can broadcast it).  Reassembly sorts
    (pos, line) structs *within* each doc group — no global or unpartitioned
    window.  All string/integer ops: deterministic across engines.
    """
    lines = pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.col("line")))
    boiler = (
        lines.where(F.col("norm") != "")
        .groupBy("grp", "norm")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("grp", "norm", F.lit(True).alias("is_boiler"))
    )
    flagged = lines.join(boiler, ["grp", "norm"], "left").withColumn(
        "is_boiler", F.coalesce(F.col("is_boiler"), F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("is_boiler"), F.struct(F.col("pos"), F.col("line"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("is_boiler").cast("long")).cast("long").alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["line"]
            ),
            "\n",
        ).alias("cleaned"),
    )
