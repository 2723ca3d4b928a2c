"""End-to-end webtext pipeline plan: every stage observable in one run."""

from __future__ import annotations

import datetime as dt

from entity_resolution_spark.plans.webtext_pipeline import (
    WebtextConfig,
    prepare_corpus,
)

T0 = dt.datetime(2024, 1, 1)
BANNER = "Accept cookies to continue"
FOOTER = "(c) 2024 example"
def _body(i: int) -> str:
    """English-looking page with a vocabulary DISTINCT per i, so different
    pages are far below the near-dup Jaccard threshold while still long
    enough and stopword-rich enough to pass the quality/language gates."""
    uniq = " ".join(f"w{i}n{j}" for j in range(60))
    return (
        f"the quick brown fox number {i} runs over the hill and "
        + uniq
        + " and the day is long with many small things to see there"
    )
BODY_FR = (
    "le renard brun saute par dessus le chien et je ne pas savoir "
    "pourquoi mais les oiseaux chantent dans la lumiere du soir et "
    "la riviere coule lentement vers la mer pendant que le soleil "
)


def _page(body: str) -> str:
    return f"{BANNER}\n{body}\n{FOOTER}"


def _rows():
    rows = []
    # source s0: six distinct pages (banner/footer recur -> boilerplate)
    for i in range(6):
        rows.append(
            (
                f"https://s0.example.com/p/{i}?a=1",
                T0 + dt.timedelta(hours=i),
                10 + i,
                "s0",
                _page(_body(i)),
            )
        )
    # re-crawl of p/0: same canonical url (spelling differs), newer ts,
    # larger doc_id -> compaction must keep THIS one
    rows.append(
        (
            "HTTPS://WWW.S0.example.com/p/0?utm_source=x&a=1",
            T0 + dt.timedelta(days=2),
            30,
            "s0",
            _page(_body(99) + " recrawled body zero"),
        )
    )
    # near-dup pair inside s0: token-identical to doc 11's body (shuffled
    # word order -> not an exact dup, jaccard == 1.0) -> larger id dropped
    rows.append(
        (
            "https://s0.example.com/p/neardup?a=1",
            T0,
            31,
            "s0",
            _page(" ".join(reversed(_body(1).split()))),
        )
    )
    # low-quality page in s0 (short, no stopwords) -> filtered
    rows.append(
        (
            "https://s0.example.com/p/short?a=1",
            T0,
            32,
            "s0",
            _page("tiny"),
        )
    )
    # French page in s0 -> language-filtered
    rows.append(
        (
            "https://s0.example.com/p/fr?a=1",
            T0,
            33,
            "s0",
            _page(BODY_FR),
        )
    )
    # source s1: five good pages, excluded by the mix (rate 0.0)
    for i in range(5):
        rows.append(
            (
                f"https://s1.example.com/p/{i}?a=1",
                T0,
                50 + i,
                "s1",
                _page(_body(100 + i)),
            )
        )
    return rows


def test_prepare_corpus_end_to_end(spark):
    pages = spark.createDataFrame(
        _rows(),
        "url string, warc_ts timestamp, doc_id long, source string,"
        " page string",
    )
    cfg = WebtextConfig(
        boiler_min_docs=5,
        min_quality=0.3,
        keep_langs=("en",),
        mix_rates={"s0": 1.0, "s1": 0.0},
        mix_default_rate=1.0,
    )
    out = {r["doc_id"]: r.asDict() for r in prepare_corpus(pages, cfg).collect()}

    # compaction: canonical p/0 resolved to the re-crawl (doc 30, 2 versions)
    assert 10 not in out and 30 in out
    assert out[30]["n_versions"] == 2
    assert "recrawled body zero" in out[30]["text"]
    # boilerplate stripped from every surviving page
    for r in out.values():
        assert BANNER not in r["text"] and FOOTER not in r["text"]
        assert r["n_boiler"] >= 2
    # near-dup: doc 31 (token-identical to 11, higher id) dropped, 11 kept
    assert 11 in out and 31 not in out
    # quality and language filters
    assert 32 not in out and 33 not in out
    # mix: all of s1 sampled out at rate 0.0
    assert all(r["source"] == "s0" for r in out.values())
    # survivors: 11..15 (12,13,14,15 unique bodies) + 30
    assert sorted(out) == [11, 12, 13, 14, 15, 30]


def test_prepare_corpus_defaults_pass_through_mix(spark):
    pages = spark.createDataFrame(
        _rows(),
        "url string, warc_ts timestamp, doc_id long, source string,"
        " page string",
    )
    out = prepare_corpus(pages, WebtextConfig(boiler_min_docs=5))
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs == {"s0", "s1"}  # no rates -> no sampling stage
