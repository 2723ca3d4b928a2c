"""WARC source: member-gzip parse, record filtering, distributed read."""

from __future__ import annotations

import datetime as dt
import gzip

from entity_resolution_spark.sources.warc import (
    parse_warc_stream,
    read_warc,
    write_warc,
)


def _fixture_records(n=5):
    return [
        (
            f"https://site{i}.example.com/p/{i}",
            f"2024-01-0{i + 1}T06:00:00Z",
            f"<html><body>page {i}</body></html>".encode(),
        )
        for i in range(n)
    ]


def test_parse_warc_stream_round_trip(tmp_path):
    p = tmp_path / "a.warc.gz"
    recs = _fixture_records()
    write_warc(recs, str(p))
    got = list(parse_warc_stream(p.read_bytes(), "a.warc.gz"))
    assert [(u, h) for u, _, h, _ in got] == [(u, h) for u, _, h in recs]
    assert all(s == "a.warc.gz" for _, _, _, s in got)


def test_parse_skips_non_response_and_non_200(tmp_path):
    html = b"<html>x</html>"
    http_ok = b"HTTP/1.1 200 OK\r\n\r\n" + html
    http_404 = b"HTTP/1.1 404 Not Found\r\n\r\n" + b"nope"

    def rec(wtype, body, url="https://a.io/"):
        return (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {wtype}\r\n".encode()
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n" + body + b"\r\n\r\n"
        )

    data = (
        rec("request", b"GET / HTTP/1.1\r\n\r\n")
        + rec("response", http_404, "https://a.io/404")
        + rec("response", http_ok, "https://a.io/ok")
        + rec("metadata", b"k: v\r\n\r\n")
    )
    got = list(parse_warc_stream(data, "x"))
    assert [(u, h) for u, _, h, _ in got] == [("https://a.io/ok", html)]


def test_parse_tolerates_truncated_tail(tmp_path):
    recs = _fixture_records(3)
    members = []
    for i, r in enumerate(recs):
        p = tmp_path / f"m{i}.warc.gz"
        write_warc([r], str(p))
        members.append(p.read_bytes())
    # cut into the MIDDLE of the third member: the two complete members
    # must come back, no exception
    data = members[0] + members[1] + members[2][: len(members[2]) // 2]
    got = list(parse_warc_stream(data, "t"))
    assert [u for u, _, _, _ in got] == [u for u, _, _ in recs[:2]]


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    all_recs = []
    for f in range(3):
        recs = [
            (
                f"https://s{f}.example.com/p/{i}",
                f"2024-02-0{f + 1}T0{i}:00:00Z",
                f"<html>f{f} p{i}</html>".encode(),
            )
            for i in range(4)
        ]
        write_warc(recs, str(d / f"seg{f}.warc.gz"))
        all_recs.extend(recs)

    df = read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 12
    got = {r["url"]: (r["warc_ts"], bytes(r["html"])) for r in rows}
    for url, ts, html in all_recs:
        want_ts = dt.datetime.fromisoformat(ts.replace("Z", ""))
        assert got[url] == (want_ts, html), url
    # source_file carries lineage back to the segment
    assert all(r["source_file"].endswith(".warc.gz") for r in rows)
    # feeds the canonical pages shape downstream (extract expects url/html)
    assert {"url", "warc_ts", "html"} <= set(df.columns)


def test_warc_to_resolution_end_to_end(spark, tmp_path):
    """Crawl bytes → pages → full ER pipeline: write the synthetic corpus
    AS WARC segments, read them back with the connector, and resolve —
    F1 = 1.0 against the planted truth, proving the connector produces the
    exact pages shape the pipeline contract expects."""
    from pyspark.sql import functions as F

    from entity_resolution_spark.plans import pipeline
    from entity_resolution_spark.sources.synthetic import make_pages

    corpus = make_pages(n_entities=30)
    d = tmp_path / "crawl"
    d.mkdir()
    # shard the corpus across 3 WARC segments like a real crawl
    pdf = corpus.pages
    for f in range(3):
        part = pdf.iloc[f::3]
        write_warc(
            [
                (r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                 bytes(r.html))
                for r in part.itertuples()
            ],
            str(d / f"seg{f}.warc.gz"),
        )

    pages = read_warc(spark, str(d))
    truth = spark.createDataFrame(corpus.truth)
    m = pipeline.evaluate_against_truth(
        pipeline.resolve(pages), truth
    ).collect()[0]
    assert m["f1"] == 1.0, m


def test_status_code_is_second_token_not_substring(tmp_path):
    """The 200 check parses the status-line token, not a substring: a 404
    whose reason phrase contains ' 200' must be skipped, and a 200 line
    with multiple spaces must still pass (RFC 9112 tolerates them)."""
    html = b"<html>y</html>"

    def rec(status_line, body, url):
        payload = status_line + b"\r\n\r\n" + body
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n" + payload + b"\r\n\r\n"
        )

    data = (
        rec(b"HTTP/1.1 404 Redirected from 200 OK", b"nope",
            "https://a.io/fake200")
        + rec(b"HTTP/1.1  200  OK", html, "https://a.io/spaced")
        + rec(b"HTTP/1.1", b"??", "https://a.io/short")
    )
    got = [(u, h) for u, _, h, _ in parse_warc_stream(data, "x")]
    assert got == [("https://a.io/spaced", html)]
