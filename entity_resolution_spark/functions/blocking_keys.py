"""Blocking-key generation — the reference's "scalar function" layer.

Reference semantics (re-derived, not ported):

* ``phonetic_combination`` — reference ``block_klsh/blocking/rule_methods.py:25-46``:
  for a lowercased value emit ``[first_char, first_two, first_three, last_three,
  consonants]``.  ``last_three`` is Python ``x[-3:]`` (whole string when shorter);
  ``consonants`` keeps *unicode* letters that are not in ``'aeiou'`` (so ``ö``
  survives).  The reference applies this row-at-a-time with ``pd.Series.apply``;
  here every key is a JVM-side Catalyst expression (whole-stage codegen, no
  Python at all).
* ``two_of_three_date`` — ``rule_methods.py:48-67``: three composite keys per
  date; note the reference's third key uses ``day`` where its name says
  month-year (``my_{day}_{year}_dm_{day}_{month}``) — reproduced faithfully.
* ``sliding_window`` — ``rule_methods.py:69-72``: ``days_since_epoch //
  window_days`` as a string bucket.
* ``soundex`` — reference uses ``jellyfish.soundex`` (``rule_methods.py:11-23``);
  Spark ships a built-in ``soundex`` expression so the phonetic rule stays
  JVM-side too.  ``metaphone`` has no JVM builtin; a pure-Python implementation
  of the classic algorithm runs inside an Arrow-batched pandas UDF.

All functions return ``Column``s so they compose with ``F.explode`` for the
(record_id, block_key) long form — blocks are never materialised as index lists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

VOWELS = "aeiou"


def _lower(col: Column) -> Column:
    return F.lower(col.cast("string"))


def first_chars(col: Column, n: int) -> Column:
    """First ``n`` characters of the lowercased value (shorter → whole value)."""
    return F.substring(_lower(col), 1, n)


def last_chars(col: Column, n: int) -> Column:
    """Last ``n`` characters, Python ``x[-n:]`` semantics (shorter → whole value).

    Expressed as ``substr(s, greatest(len-n+1, 1), n)`` so the same SQL holds in
    Spark and in the DuckDB oracle.
    """
    s = _lower(col)
    return F.substring(s, F.greatest(F.length(s) - (n - 1), F.lit(1)), F.lit(n))


def consonant_skeleton(col: Column) -> Column:
    """Unicode letters that are not ASCII vowels, in order.

    Two-step regex: drop non-letters (``\\p{L}``), then drop ``aeiou`` — matches
    the reference's ``c.isalpha() and c not in 'aeiou'`` including non-ASCII
    letters such as ``ö``.
    """
    s = _lower(col)
    return F.regexp_replace(F.regexp_replace(s, r"[^\p{L}]", ""), "[aeiou]", "")


def phonetic_combination(col: Column) -> Column:
    """Array of the five phonetic-combination keys (duplicates NOT removed here;
    dedup happens once at the (record_id, block_key) level, mirroring the
    reference's per-block ``frozenset``)."""
    return F.array(
        first_chars(col, 1),
        first_chars(col, 2),
        first_chars(col, 3),
        last_chars(col, 3),
        consonant_skeleton(col),
    )


def soundex_key(col: Column) -> Column:
    """Spark's built-in soundex (JVM expression)."""
    return F.soundex(F.trim(col.cast("string")))


def two_of_three_date(col: Column) -> Column:
    """Three 2-of-3 date-component keys per timestamp/date value.

    Reference format strings use ``%02d`` for the year as well — Python's
    ``f"{x.year:02d}"`` prints the full year when it has >2 digits, so a plain
    unpadded year reproduces it for all real years.
    """
    d, m, y = (
        F.format_string("%02d", F.dayofmonth(col)),
        F.format_string("%02d", F.month(col)),
        F.year(col).cast("string"),
    )
    return F.array(
        F.concat_ws("_", F.lit("my"), m, y, F.lit("dy"), d, y),
        F.concat_ws("_", F.lit("my"), m, y, F.lit("dm"), d, m),
        F.concat_ws("_", F.lit("my"), d, y, F.lit("dm"), d, m),
    )


def hash_date_features(col: Column) -> list[Column]:
    """B7 (``features_engineering.py:61-83`` semantics): per date, three
    deterministic md5-based features in [0,1) — md5("seed42_" + component
    pair) % 1000 / 1000 for month-year, day-year, day-month.

    The reference hashes the full hex digest as one big int; taking the low
    64 bits (last 15 hex chars) preserves the value of ``% 1000`` only when
    the higher bits contribute a multiple-of-8 factor — so instead we define
    the pinned hash as low-60-bit md5 (same scheme as the MinHash layer),
    which keeps the feature deterministic, uniform and SQL-reproducible.
    """
    d = F.format_string("%02d", F.dayofmonth(col))
    m = F.format_string("%02d", F.month(col))
    y = F.format_string("%04d", F.year(col))
    outs = []
    for pair in (F.concat(m, F.lit("_"), y), F.concat(d, F.lit("_"), y), F.concat(d, F.lit("_"), m)):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit("seed42_"), pair)), 1, 15), 16, 10
        ).cast("long")
        outs.append((F.pmod(h, F.lit(1000)) / F.lit(1000.0)))
    return outs


def sliding_window_key(col: Column, window_days: int = 7) -> Column:
    """``days_since_epoch // window_days`` bucket as a string."""
    days = F.datediff(col.cast("date"), F.to_date(F.lit("1970-01-01")))
    return F.floor(days / F.lit(window_days)).cast("long").cast("string")


# --------------------------------------------------------------------------
# Metaphone (classic 1990 algorithm) — pure Python inside an Arrow-batched UDF.
# --------------------------------------------------------------------------

def _metaphone_one(word: str) -> str:
    """Classic Metaphone of ``word`` (public algorithm, Lawrence Philips 1990)."""
    w = "".join(c for c in str(word).upper() if c.isalpha())
    if not w:
        return ""
    # Initial-letter exceptions.
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[:1] == "X":
        w = "S" + w[1:]
    elif w[:2] == "WH":
        w = "W" + w[2:]
    out = []
    i, n = 0, len(w)
    vowels = "AEIOU"
    while i < n:
        c = w[i]
        if i > 0 and c == w[i - 1] and c != "C":
            i += 1
            continue
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        if c in vowels:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and i > 0 and w[i - 1] == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                out.append("K" if i > 0 and w[i - 1] == "S" else "X")
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EIY":
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                if i + 2 >= n or w[i + 2] in vowels:
                    out.append("K")
                    i += 1
                # silent gh otherwise
                else:
                    i += 1
            elif nxt == "N":
                pass  # silent
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if i > 0 and w[i - 1] in vowels and nxt not in vowels:
                pass
            elif i > 0 and w[i - 1] in "CSPTG":
                pass
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if not (i > 0 and w[i - 1] == "C"):
                out.append("K")
        elif c == "P":
            out.append("F" if nxt == "H" else "P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "H":
                out.append("0")
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in vowels:
                out.append("W")
        elif c == "X":
            out.append("KS")
        elif c == "Y":
            if nxt in vowels:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out)


@pandas_udf(StringType())
def metaphone_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched metaphone; per-row Python only inside the batch."""
    return s.astype(str).str.strip().map(_metaphone_one)


def phonetic_key(col: Column, use_soundex: bool = True, use_metaphone: bool = False) -> Column:
    """Reference ``_phonetic``: '_'-joined soundex/metaphone keys."""
    parts = []
    if use_soundex:
        parts.append(soundex_key(col))
    if use_metaphone:
        parts.append(metaphone_udf(col))
    return F.concat_ws("_", *parts)
