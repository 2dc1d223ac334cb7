"""Round-10 CDX index + HTML→Markdown operator units."""

from __future__ import annotations

import pytest

from hadoopxmlextractor_spark.sources import cdx as X


def test_surt_canonicalization_rules():
    # scheme/case/www/port/param-order variants share one key
    variants = [
        "https://www.Example.ORG/Path/A?b=2&a=1",
        "http://example.org/path/a?a=1&b=2",
        "https://example.org:443/PATH/a?B=2&A=1",
    ]
    keys = {X.surt(u) for u in variants}
    assert keys == {"org,example)/path/a?a=1&b=2"}
    assert X.surt("https://sub.host.example.com/") == \
        "com,example,host,sub)/"
    assert X.surt("http://example.com") == "com,example)/"
    # non-default port survives; fragment drops
    assert X.surt("http://example.com:8080/x#frag") == \
        "com,example:8080)/x"
    # scheme-DEFAULT port drops; a default-for-the-OTHER-scheme port
    # is a distinct capture target and must survive (r10 advice)
    assert X.surt("http://example.com:443/") == "com,example:443)/"
    assert X.surt("https://example.com:80/") == "com,example:80)/"
    # hostless/garbage input is an error, not a ')garbage' key
    with pytest.raises(ValueError):
        X.surt("not a url")


def test_cdxj_roundtrip_and_refusals():
    rows = [{
        "urlkey": "org,example)/a", "ts_ms": 1600000000000,
        "url": "https://example.org/a", "mime": "text/html",
        "status": 200, "digest": "sha1:ab", "offset": 0,
        "length": 55, "filename": "f.warc.gz",
    }, {
        "urlkey": "org,example)/b", "ts_ms": 1600086400000,
        "url": "https://example.org/b", "status": 404,
        "offset": 55, "length": 41, "filename": "f.warc.gz",
        "mime": None, "digest": None,
    }]
    for gz in (False, True):
        got = X.parse_cdxj(X.write_cdxj(rows, gzipped=gz))
        assert [r["urlkey"] for r in got] == [r["urlkey"] for r in rows]
        assert got[0]["ts_ms"] == 1600000000000
        assert got[1]["status"] == 404 and got[1]["mime"] is None
        assert got[1]["offset"] == 55 and got[1]["length"] == 41
    with pytest.raises(ValueError, match="empty"):
        X.parse_cdxj(b"\n")
    with pytest.raises(ValueError, match="malformed"):
        X.parse_cdxj(b"org,example)/a 2020 {\"url\": \"x\"}")  # short ts
    with pytest.raises(ValueError, match="malformed"):
        X.parse_cdxj(b"org,example)/a 20200101000000 {no json}")


def test_html_markdown_rules(spark):
    from hadoopxmlextractor_spark.operators import text as T

    html = (
        "<html><head><title>skip</title></head><body>"
        "<h2>Head</h2>"
        "<p>a <b>bold</b> and <a href=\"http://u\">a link</a></p>"
        "<ul><li>one</li><li>two</li></ul>"
        "<ol><li>first</li></ol>"
        "<pre>keep\n  raw</pre>"
        "tail words</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id long, h string")
    got = df.select(T.html_markdown("h").alias("m")).first().m
    assert got == (
        "## Head\n\n"
        "a **bold** and [a link](http://u)\n\n"
        "- one\n- two\n\n"
        "1. first\n\n"
        "```\nkeep\n  raw\n```\n\n"
        "tail words"
    )
    # tag soup: stray close + unclosed bold never crash
    soup = "<p>x</b> <b>y<p>z</p>"
    out = df.select(
        T.html_markdown(F_lit(soup)).alias("m")
    ) if False else None
    got2 = spark.createDataFrame([(1, soup)], "id long, h string") \
        .select(T.html_markdown("h").alias("m")).first().m
    assert "x" in got2 and "z" in got2
