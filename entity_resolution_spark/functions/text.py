"""Deterministic text extraction + text-analysis functions for web pages.

The reference has no HTML path (its records are CSV rows), so the "reference"
for extraction is this repo's own pinned pure function ``extract_text_py`` —
the per-row invariant required by the target is that extracted ``text`` is
byte-identical per ``url`` across runs and parallelism levels.  The Spark-side
implementation is an Arrow-batched pandas UDF applying exactly that function.

Also hosts the training-data-pipeline text operators (language-ID heuristic,
quality scoring, token counting, fingerprinting) — expressed as JVM-side
column functions wherever possible.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_BODY_RE = re.compile(rb"<body>(.*?)</body>", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(rb"[ \t\r\f\v]+")


def extract_text_py(html: bytes) -> str:
    """Pinned, pure extraction: title + '\\n' + tag-stripped body.

    Byte-level regexes so the output is a deterministic function of the input
    bytes; whitespace runs collapse to single spaces, lines are stripped.
    """
    if html is None:
        return ""
    title_m = _TITLE_RE.search(html)
    body_m = _BODY_RE.search(html)
    title = title_m.group(1) if title_m else b""
    body = body_m.group(1) if body_m else b""
    body = _TAG_RE.sub(b" ", body)
    parts = []
    for chunk in (title, body):
        chunk = _WS_RE.sub(b" ", chunk).strip()
        parts.append(chunk.decode("utf-8", errors="replace"))
    return parts[0] + "\n" + parts[1]


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction UDF (the only Python crossing in `extract`)."""
    return html.map(extract_text_py)


def title_of(text_col: Column) -> Column:
    """First line of extracted text = the page title (JVM-side)."""
    return F.split_part(text_col, F.lit("\n"), F.lit(1))


# ---------------------------------------------------------------------------
# Text-analysis operators (training-data pipeline layer)
# ---------------------------------------------------------------------------

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "los", "una", "con", "por", "para", "es"],
}


def tokens(text_col: Column) -> Column:
    """Whitespace tokenization, empty tokens removed (JVM-side).

    Boundary is the explicit class ``[ \\t\\n\\r\\f]+`` rather than
    ``\\s+``: Java regex ``\\s`` matches ``\\x0B`` (vertical tab) while
    DuckDB's RE2 ``\\s`` does not, and every oracle pair must agree on
    token boundaries for ANY input, not just the synthetic corpora."""
    return F.filter(
        F.split(text_col, r"[ \t\n\r\f]+"), lambda t: t != F.lit("")
    )


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


def distinct_token_count(text_col: Column) -> Column:
    return F.size(F.array_distinct(tokens(text_col)))


def bpe_ish_token_count(text_col: Column) -> Column:
    """Sub-word-ish token count: words, numbers and punctuation runs counted
    separately (a cheap BPE proxy; JVM regexp)."""
    arr = F.regexp_extract_all(
        text_col, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), F.lit(1)
    )
    return F.size(arr)


def stopword_ratio(text_col: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(text_col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text_col: Column) -> Column:
    punct = F.length(F.regexp_replace(text_col, r"[^\p{Punct}]", ""))
    return punct / F.greatest(F.length(text_col), F.lit(1))


def uppercase_ratio(text_col: Column) -> Column:
    upper = F.length(F.regexp_replace(text_col, r"[^A-Z]", ""))
    return upper / F.greatest(F.length(text_col), F.lit(1))


def quality_score(text_col: Column) -> Column:
    """Heuristic [0,1] quality: length sweet-spot, low punctuation, has stopwords.

    Deterministic closed-form so the DuckDB oracle can reproduce it exactly.
    """
    n = F.length(text_col)
    length_term = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(text_col) * 4.0, F.lit(1.0))
    sw_term = F.least(stopword_ratio(text_col) * 5.0, F.lit(1.0))
    return (length_term + punct_term + sw_term) / 3.0


def lang_guess(text_col: Column) -> Column:
    """Stopword-vote language ID over the supported language set (JVM-side).

    Score per language = #tokens in that language's stopword list; ties break
    by language code order (deterministic).
    """
    toks = tokens(F.lower(text_col))
    scores = []
    for code in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("score"),
                F.lit(code).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """Document fingerprint: 64-bit hash of the normalized text
    (lowercase, whitespace collapsed) — exact-dup detection key."""
    norm = F.trim(F.regexp_replace(F.lower(text_col), r"[ \t\n\r\f]+", " "))
    return F.xxhash64(norm)


def md5_fingerprint(text_col: Column) -> Column:
    """md5 variant of the fingerprint (shared with the DuckDB oracle)."""
    norm = F.trim(F.regexp_replace(F.lower(text_col), r"[ \t\n\r\f]+", " "))
    return F.md5(norm)
