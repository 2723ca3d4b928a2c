"""Corpus-trained n-gram LM cross-entropy scoring (CCNet-style LM filter).

CCNet (Wenzek et al., arXiv:1911.00359 §3.3) buckets web pages by the
perplexity a language model assigns them and keeps the low-perplexity head.
The reference pipeline has no LM stage (it scores pair similarity), but any
web-corpus deployment of it needs this filter upstream; here it is
re-expressed as a pure relational plan: a Laplace-smoothed bigram LM is
*trained on the corpus itself* (token/bigram hash aggregates), then each
document is scored by its average negative log-probability under that LM.

Scale design (100 TB):
  * Tokenization is a JVM array expression; bigram instances are produced by
    ``posexplode`` of the token array — O(n) rows per n-token page.
  * Corpus counts are two hash aggregates (map-side combinable).  The LM is
    NOT broadcast — at web scale the bigram vocabulary is billions of rows —
    documents join their (pre-aggregated, per-doc-distinct) bigrams against
    the count tables on the bigram key: plain shuffle hash joins, skew-safe
    because per-doc aggregation caps any one doc's contribution first.
  * Vocabulary size V is an exact distinct count (one extra shuffle); a real
    deployment can swap in ``approx_count_distinct``/KMV — the smoothing
    constant only needs ~1% accuracy — but exactness keeps the DuckDB oracle
    byte-comparable.

Cross-engine determinism: counts and V are integers (bit-exact), the smoothed
probability is one IEEE division (correctly rounded, identical), and each
bigram's ln(p) is quantized to an INTEGER count of micro-nats
(``round(ln(p) * 1e6)`` as BIGINT) before any aggregation.  From there the
pipeline never touches a float: per-doc sums of ``m * lp_micro`` are exact
integer arithmetic (order-insensitive), and the per-doc mean is an integer
division (``div`` / ``//``).  The score column ``ce_micro`` is the mean
negative log-probability in micro-nats, floor-divided — compare/threshold it
as an integer; divide by 1e6 only for display.

Why not a rounded float mean: per-bigram values sitting exactly on the 1e-6
decimal grid make the mean over small n land exactly ON 4dp midpoints with
~1% probability, where Spark (HALF_UP on shortest repr) and any
binary-rounding engine disagree — and worse, the raw float sum is partition-
order sensitive, so the same engine can flip its own output across runs.
Caught by the test suite as a suite-order-dependent 1-ulp flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Tokenizer: lowercase alpha runs.  Mirrored in the DuckDB oracle as
#: ``string_split_regex(lower(text), '[^a-z]+')`` with empties filtered.
_SPLIT = r"[^a-z]+"


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _SPLIT), lambda t: t != F.lit("")
    )
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))


def _bigram_instances(tok: DataFrame) -> DataFrame:
    """One row per bigram occurrence: (doc_id, w1, w2)."""
    pairs = F.arrays_zip(
        F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("w1"),
        F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("w2"),
    )
    return (
        tok.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(pairs).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def bigram_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: int = 1,
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained bigram LM.

    ``p(w2|w1) = (c(w1,w2) + alpha) / (c_prefix(w1) + alpha * V)`` with
    ``c_prefix`` the count of w1 as a bigram prefix and V the corpus
    vocabulary size; ``ce_micro = floor(-(sum of ln p in micro-nats) / n)``
    over the doc's n bigram occurrences.  Docs with <2 tokens are excluded
    (no bigrams to score).

    Returns ``doc_id, n_bigrams, ce_micro`` — an exact BIGINT in micro-nats
    (integer arithmetic end-to-end after the per-bigram quantization, so
    partition- and engine-invariant; see module docstring).
    """
    tok = _doc_tokens(docs, text_col, id_col)
    inst = _bigram_instances(tok)
    # Corpus-level model: two hash aggregates + one scalar distinct count.
    c12 = inst.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = inst.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        tok.select(F.explode("toks").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    # Per-doc distinct bigrams with multiplicity, then join the LM.
    doc_big = inst.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m"))
    scored = (
        doc_big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp_micro",
            F.round(
                F.log(
                    (F.col("c12") + F.lit(alpha))
                    / (F.col("c1") + F.lit(alpha) * F.col("v"))
                )
                * F.lit(1_000_000),
                0,
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("m") * F.col("lp_micro"))).alias("_neg_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("_neg_sum div n_bigrams").alias("ce_micro"),
        )
    )


def lm_bucket(
    scored: DataFrame,
    head: int,
    middle: int,
    ce_col: str = "ce_micro",
) -> DataFrame:
    """CCNet head/middle/tail split at LITERAL integer micro-nat thresholds
    (data-dependent thresholds belong to the caller; integer compares are
    exact, so any oracle comparison is trivially stable)."""
    c = F.col(ce_col)
    return scored.withColumn(
        "bucket",
        F.when(c <= F.lit(head), F.lit("head"))
        .when(c <= F.lit(middle), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
