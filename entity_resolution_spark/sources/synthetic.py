"""Deterministic synthetic corpora (seed 42) — no external data.

Two fixtures per FIXTURES.md:

* ``pages`` — Common-Crawl-style table ``(url, warc_ts, html, text, lang)``
  (shape mandated by BASELINE.json ``input_hint``) with planted entity
  clusters of size 1-6.  Within a cluster the page *title* is a near-duplicate
  variant of a base name using the perturbation families observed in the
  reference's apollo dataset (truncation, vowel doubling, diacritic folding,
  suffix, typo) — chosen so every variant shares ≥2 phonetic-combination keys
  with its base (edge survives the weight>1.5 prune) while distinct entities
  share ≤1 key (no false merges).  Truth table ``(url, entity_id)`` is
  returned separately so the pages table stays exactly input_hint-shaped.

* ``apollo`` — a 21-row record table with the reference's column shape
  ``(name, tension_adj, tension, resonance, longevity, quality, amt_sold)``
  and the same 3-entity near-duplicate structure, synthesized here (values are
  our own; the parity oracle is our in-process pandas re-implementation).

All randomness comes from ``numpy.random.Generator(PCG64(seed))`` — identical
output across runs, hosts and parallelism levels.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 42

_CONSONANTS = "bcdfgjklmnprstvz"
_VOWELS = "aeiou"
_ACCENT_MAP = {"o": "ö", "e": "é", "u": "ü", "a": "á"}

_BODY_VOCAB = [
    "grand", "piano", "model", "series", "concert", "upright", "string",
    "hammer", "soundboard", "pedal", "octave", "tuning", "maple", "spruce",
    "ebony", "ivory", "action", "felt", "bridge", "pin", "frame", "cast",
    "iron", "tone", "bright", "warm", "mellow", "rich", "resonant", "vintage",
    "restored", "workshop", "craft", "keyboard", "bass", "treble", "scale",
]


_C1 = "bcdfghjklmnpqrstvwx"  # 19 first-letter consonants; 'z' reserved for hot keys
_A26 = "abcdefghijklmnopqrstuvwxyz"


def _base_name(rng: np.random.Generator, k: int) -> str:
    """Brand-like name whose phonetic-combination keys are entity-disjoint.

    Key fact about the reference rule: the 1-char and 2-char prefixes are two
    *separate* blocking keys, so two entities sharing their first TWO
    characters already co-occur in 2 blocks → weight 2 → false merge (the
    apollo entities differ at char 2 for the same reason).  Deterministic
    mixed-radix letter assignment guarantees for distinct entities k, k' ≤ 385:

    * (char1, char2) unique (19·26 = 494) → first_two/first_one collide never
      together; (char1..3) unique below 12,844 → first_three never collides;
    * the tail trigram (radix 11·5·7 = 385) is unique → last_three never
      collides; the consonant skeleton embeds char1 + the tail consonants so
      skeleton collisions imply a first-char difference elsewhere.

    ⇒ any cross-entity pair shares at most ONE key → pruned at weight>1.5,
    while every ``_variant`` keeps ≥3 keys shared within its cluster.  Beyond
    385 entities keys wrap — fine for throughput benches, not for the F1 gate.
    """
    # Character-class layout makes the three trigram key spaces disjoint:
    #   first_three      = c1·x2·x3 → Consonant-Consonant-Vowel
    #   last_three(tail) = t1·t2·t3 → Consonant-Vowel-Consonant
    #   truncation last3 = x2·x3·vm → Consonant-Vowel-Vowel
    # so a key of one type can never string-equal a key of another type, and
    # within each type the mixed-radix digits keep entities unique (≤361).
    c1 = _C1[k % 19]
    x2 = _C1[(k // 19) % 19]
    x3 = _VOWELS[(k // 361) % 5]
    vm = rng.choice(list(_VOWELS))
    tail = (
        _CONSONANTS[k % 11]
        + _VOWELS[(k // 11) % 5]
        + _CONSONANTS[5 + (k // 55) % 7]
    )
    return (c1 + x2 + x3 + vm + tail).capitalize()


def _variant(rng: np.random.Generator, base: str) -> str:
    """Apollo-style perturbation; every kind keeps ≥3 of the 5 keys shared
    with the base (and with every sibling variant), so within-cluster edges
    always survive the weight>1.5 prune."""
    kind = int(rng.integers(0, 5))
    if kind == 1:  # vowel doubling at an interior position (keeps all 5 keys)
        for i in range(3, len(base) - 3):
            if base[i].lower() in _VOWELS:
                return base[:i] + base[i] + base[i:]
        return base
    if kind == 2:  # suffix echoing the tail (keeps first1/2/3 + last3)
        return base + base[-3:]
    if kind == 3:  # truncation to 4 chars (keeps first1/2/3)
        return base[:4]
    if kind == 4:  # diacritic accent on an interior vowel (keeps 4 keys)
        for i in range(3, max(3, len(base) - 3)):
            ch = base[i].lower()
            if ch in _ACCENT_MAP:
                return base[:i] + _ACCENT_MAP[ch] + base[i + 1 :]
        return base
    return base  # identical copy


@dataclass
class SyntheticCorpus:
    pages: pd.DataFrame       # url, warc_ts, html, text, lang
    truth: pd.DataFrame       # url, entity_id
    labels: pd.DataFrame      # url1, url2, is_match (canonical url1 < url2)


def make_pages(
    n_entities: int = 60,
    seed: int = SEED,
    hot_key_rows: int = 0,
    max_cluster: int = 6,
) -> SyntheticCorpus:
    """Build the pages corpus with planted clusters.

    ``hot_key_rows`` appends that many *distinct* entities whose names all
    start with the same 3 characters ("zzz…") — a planted hot blocking key for
    skew tests; they share only prefix keys (weight ≤ 3 between distinct hot
    names is avoided by differing after char 1: we give them distinct char-2)
    — they stress block size, not correctness (they are all singletons).
    """
    rng = np.random.default_rng(seed)
    rows, truth_rows = [], []
    t0 = datetime(2020, 1, 1)
    langs = ["en"] * 9 + ["de", "fr", "es"]
    urlseq = 0

    def emit(entity_id: int, title: str, body_words: list[str]) -> None:
        nonlocal urlseq
        url = f"https://site{entity_id % 97}.example.com/p/{urlseq}"
        urlseq += 1
        body = " ".join(body_words)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{body}</p></body></html>"
        ).encode("utf-8")
        # text column left to the Spark extractor in `extract`; store the
        # pinned extraction here for generator-side convenience (title\nbody)
        text = title + "\n" + body
        ts = t0 + timedelta(seconds=int(rng.integers(0, 6 * 365 * 24 * 3600)))
        lang = str(rng.choice(langs))
        rows.append((url, ts, html, text, lang))
        truth_rows.append((url, entity_id))

    for e in range(n_entities):
        base = _base_name(rng, e)
        cluster_size = int(rng.integers(1, max_cluster + 1))
        base_body = list(rng.choice(_BODY_VOCAB, size=40))
        for _ in range(cluster_size):
            title = _variant(rng, base)
            body = list(base_body)
            for _ in range(int(rng.integers(0, 5))):  # token-level noise
                body[int(rng.integers(0, len(body)))] = str(rng.choice(_BODY_VOCAB))
            emit(e, title, body)

    if hot_key_rows:
        # Hot blocking key: one mega-entity whose rows all start "Zyz…" —
        # the "z"/"zy"/"zyz" blocks each hold every hot row (quadratic
        # pair-gen stress, weight 3 → correctly clustered together).  Normal
        # names never start with 'z' and their tails contain no 'z', so hot
        # and organic rows share no key at all.
        hot_body = list(rng.choice(_BODY_VOCAB, size=30))
        for h in range(hot_key_rows):
            name = "Zyz" + _base_name(rng, h).lower()
            emit(n_entities, name, hot_body)

    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    truth = pd.DataFrame(truth_rows, columns=["url", "entity_id"])

    # Labels: all within-cluster pairs positive; hard negatives = cross-cluster
    # pairs sharing ≥1 phonetic-combination key of the title.
    from ..functions.blocking_keys import VOWELS  # noqa: F401 (doc link)

    def py_keys(name: str) -> set[str]:
        s = name.lower()
        cons = "".join(c for c in s if c.isalpha() and c not in "aeiou")
        return {s[:1], s[:2], s[:3], s[-3:], cons}

    by_url = dict(zip(truth["url"], truth["entity_id"]))
    titles = {u: t.split("\n", 1)[0] for u, t in zip(pages["url"], pages["text"])}
    key_index: dict[str, list[str]] = {}
    for u, t in titles.items():
        for k in py_keys(t):
            key_index.setdefault(k, []).append(u)

    pos, neg = set(), set()
    for e, grp in truth.groupby("entity_id"):
        us = sorted(grp["url"])
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                pos.add((us[i], us[j]))
    for k, us in key_index.items():
        if len(us) > 50:
            continue
        us = sorted(set(us))
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                a, b = us[i], us[j]
                if by_url[a] != by_url[b]:
                    neg.add((a, b))
    labels = pd.DataFrame(
        [(a, b, True) for a, b in sorted(pos)]
        + [(a, b, False) for a, b in sorted(neg)],
        columns=["url1", "url2", "is_match"],
    )
    return SyntheticCorpus(pages=pages, truth=truth, labels=labels)


# ---------------------------------------------------------------------------
# Apollo-shaped parity fixture (structure of the reference dataset, own values)
# ---------------------------------------------------------------------------

def make_apollo(seed: int = SEED) -> tuple[pd.DataFrame, list[set[int]]]:
    """21-row record table + expected entity groups (list of index sets).

    3 base entities × near-duplicate variants + perturbed names; mirrors the
    *structure* of ``block_klsh/data/example_apollo_0.csv`` (two of the
    entities share a first letter so their pruned components can interact,
    exercising the same blocking behavior).
    """
    rng = np.random.default_rng(seed)
    specs = [
        # (names, quality_range, amt)
        (["Marvelo", "Marvelo", "Marvelo", "Marv", "Marveloo", "Marvelorium",
          "Marvelo", "Marvelo", "Marvelo", "Marvelo"], (0, 1), 4000),
        # shares only the first letter with Marvelo (like Apollo/August in the
        # reference data — differs at char 2, so weight 1 → pruned)
        (["Morten Vogel", "Morten Vögel", "Morten V", "Morten Vogel",
          "Morten Vogel", "Mortin Vogel"], (2, 3), 5000),
        (["Koralin", "Koralin", "Koralin", "Koralin", "Koralin"], (6, 8), 15000),
    ]
    rows = []
    groups: list[set[int]] = []
    idx = 0
    for names, qr, amt in specs:
        grp = set()
        for nm in names:
            rows.append(
                {
                    "name": nm,
                    "tension_adj": int(rng.integers(0, 2)),
                    "tension": float(np.round(rng.normal(3.0, 1.0), 6)),
                    "resonance": float(np.round(rng.normal(110.0, 8.0), 6)),
                    "longevity": (
                        datetime(2025, 1, 1)
                        + timedelta(days=int(rng.integers(0, 3000)))
                    ).strftime("%d/%m/%Y"),
                    "quality": int(rng.integers(qr[0], qr[1] + 1)),
                    "amt_sold": float(amt + int(rng.integers(-5, 6)) * 100),
                }
            )
            grp.add(idx)
            idx += 1
        groups.append(grp)
    return pd.DataFrame(rows), groups
