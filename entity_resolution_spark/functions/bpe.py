"""Real byte-pair-encoding tokenizer (deterministic, dependency-free).

``bpe_ish_token_count`` (functions/text.py) is a regex heuristic — fine for
oracle parity but not a token BUDGET a training run can trust.  This module
trains an actual BPE merge table (Sennrich et al. 2016 word-level variant:
greedy highest-count pair merges with a full deterministic tie order) on a
bounded, hash-ordered sample of the corpus, and applies it at scale through
one Arrow-batched pandas UDF.

Scale shape:

* **training is driver-side and bounded** — like IVF/PQ centroid training
  (operators/ann.py), the sample is ``max_sample_docs`` hash-ordered docs,
  so the collect is O(sample), never O(corpus).  BPE training is a global
  sequential algorithm (merge i+1 depends on merge i); parallelizing it
  buys nothing at a 10-50k vocab, and the industry pattern is identical:
  train once, ship the frozen vocab to every worker.
* **encoding is embarrassingly parallel** — the merge table broadcasts by
  closure (~vocab_size small tuples) and each Arrow batch encodes
  independently.  Token counts are a pure function of (text, merges):
  partition-layout invariant by construction.

Determinism: ties on pair count break on the lexicographic pair itself —
no dict-order, hash-seed, or sample-order dependence; the same corpus
sample always yields byte-identical merge tables.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_WORD_END = " "  # sentinel glued to each word's last symbol


def _word_freqs(texts) -> dict[tuple[str, ...], int]:
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        if not t:
            continue
        for w in t.split():
            key = tuple(w[:-1]) + (w[-1] + _WORD_END,)
            freqs[key] = freqs.get(key, 0) + 1
    return freqs


def train_bpe(texts, n_merges: int = 2000) -> list[tuple[str, str]]:
    """Greedy BPE merge list from an iterable of texts (driver-side).

    Returns ``[(left, right), ...]`` in merge order.  Stops early when no
    pair occurs twice (merging singletons is pure vocab bloat).
    """
    freqs = _word_freqs(texts)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for word, n in freqs.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # deterministic argmax: max count, then lexicographically smallest
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, n in freqs.items():
            out, i = [], 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + n
        freqs = new_freqs
    return merges


def bpe_encode(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a merge table to one text (word-local, order = merge rank)."""
    out: list[str] = []
    for w in (text or "").split():
        syms = list(w[:-1]) + [w[-1] + _WORD_END]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out.extend(syms)
    return out


def train_bpe_from_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 2000,
    max_sample_docs: int = 10_000,
) -> list[tuple[str, str]]:
    """Train a merge table on a bounded hash-ordered corpus sample.

    The sample is the ``max_sample_docs`` docs with the smallest
    ``md5(id)`` — deterministic at any partitioning (same trick as the
    Lloyd seeding in operators/klsh.py), and a TakeOrdered job, never a
    full collect.
    """
    rows = (
        docs.select(F.col(text_col).alias("t"),
                    F.md5(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h")
        .limit(max_sample_docs)
        .collect()
    )
    return train_bpe([r["t"] for r in rows], n_merges=n_merges)


def bpe_token_count(
    text_col: Column, merges: list[tuple[str, str]]
) -> Column:
    """Arrow-batched token count under a frozen merge table.

    The merge table ships inside the UDF closure (cloudpickle by value) —
    at 50k merges that is ~1 MB per executor, the standard frozen-vocab
    deployment.  Output is a pure function of the text: any partitioning
    yields identical counts.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(bpe_encode(t, ranks))).astype("int64")

    return _count(text_col)
