"""Declared-charset resolution for captured HTML (r10 verdict item 1):
BOM → Content-Type charset param → meta prescan → utf-8 fallback,
WHATWG-style label aliasing, and the full decode_http_html path."""

from __future__ import annotations

import gzip

from hadoopxmlextractor_spark.sources import warc as W


def test_resolve_charset_precedence():
    # BOM beats header beats meta beats default
    assert W.resolve_charset(
        b"text/html; charset=shift_jis", b"\xef\xbb\xbfhi"
    ) == ("utf-8-sig", "bom")
    assert W.resolve_charset(
        b"text/html; charset=windows-1252",
        b'<meta charset="shift_jis">',
    ) == ("cp1252", "header")
    assert W.resolve_charset(
        b"text/html", b'<html><meta charset="shift_jis"></html>'
    ) == ("cp932", "meta")
    assert W.resolve_charset(b"text/html", b"<p>plain</p>") == (
        "utf-8",
        "default",
    )
    assert W.resolve_charset(None, b"x") == ("utf-8", "default")


def test_resolve_charset_label_aliases_and_bogus():
    # WHATWG mapping: latin-1 family decodes as cp1252
    for label in (b"iso-8859-1", b"latin1", b"us-ascii", b"WINDOWS-1252"):
        ct = b"text/html; charset=" + label
        assert W.resolve_charset(ct, b"") == ("cp1252", "header")
    assert W.resolve_charset(b"text/html; charset=SJIS", b"") == (
        "cp932",
        "header",
    )
    # quoted parameter value
    assert W.resolve_charset(b'text/html; charset="euc-jp"', b"") == (
        "euc-jp",
        "header",
    )
    # bogus header label falls THROUGH to the meta sniff, not an error
    assert W.resolve_charset(
        b"text/html; charset=bogus-enc", b"<meta charset=koi8-r>"
    ) == ("koi8-r", "meta")
    assert W.resolve_charset(b"text/html; charset=bogus-enc", b"") == (
        "utf-8",
        "default",
    )


def test_resolve_charset_meta_variants():
    # http-equiv form (charset inside the content attribute)
    body = (
        b'<html><head><meta http-equiv="Content-Type" '
        b'content="text/html; charset=Shift_JIS"></head>'
    )
    assert W.resolve_charset(b"text/html", body) == ("cp932", "meta")
    # unquoted html5 form
    assert W.resolve_charset(None, b"<meta charset=utf-8>") == (
        "utf-8",
        "meta",
    )
    # the prescan is capped at 1024 bytes — a late meta is ignored
    late = b" " * 1100 + b'<meta charset="shift_jis">'
    assert W.resolve_charset(None, late) == ("utf-8", "default")


def test_decode_http_html_end_to_end():
    # declared cp1252 body with real cp1252 bytes
    body = "café naïve – don’t".encode("cp1252")
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=iso-8859-1\r\n\r\n" + body
    )
    status, enc, how, text = W.decode_http_html(payload)
    assert (status, enc, how) == (200, "cp1252", "header")
    assert text == "café naïve – don’t"
    # shift_jis via meta, arriving gzip content-coded
    page = '<meta charset="shift_jis"><p>カフェで会う</p>'.encode("cp932")
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(page)
    )
    status, enc, how, text = W.decode_http_html(payload)
    assert (status, enc, how) == (200, "cp932", "meta")
    assert "カフェで会う" in text
    # utf-16le BOM wins and the BOM is stripped
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        + "﻿hëllo".encode("utf-16-le")
    )
    status, enc, how, text = W.decode_http_html(payload)
    assert (status, enc, how) == (200, "utf-16", "bom")
    assert text == "hëllo"
    # utf-8 BOM: stripped via utf-8-sig
    payload = (
        b"HTTP/1.1 200 OK\r\n\r\n" + "﻿päge".encode("utf-8")
    )
    status, enc, how, text = W.decode_http_html(payload)
    assert (enc, how, text) == ("utf-8-sig", "bom", "päge")
    # refused (non-HTTP) payload: utf-8/replace of the raw bytes
    status, enc, how, text = W.decode_http_html(b"\xffraw bytes")
    assert (status, enc, how) == (None, None, None)
    assert text == "�raw bytes"


def test_split_http_response_exposes_headers():
    payload = (
        b"HTTP/1.1 301 Moved\r\nLocation: HTTPS://X/\r\n"
        b"Content-Type: Text/HTML; Charset=UTF-8\r\n\r\nbody"
    )
    status, headers, body = W.split_http_response(payload)
    assert status == 301 and body == b"body"
    assert headers[b"content-type"] == b"text/html; charset=utf-8"
    # the 2-tuple wrapper is unchanged
    assert W.split_http_payload(payload) == (301, b"body")


def test_robots_directives():
    W2 = W
    assert W2.robots_directives(
        {b"x-robots-tag": b"noindex, nofollow"}, ""
    ) == (True, True, "header")
    assert W2.robots_directives(
        {}, '<meta name="robots" content="none">'
    ) == (True, True, "meta")
    # attribute order insensitive; case insensitive
    assert W2.robots_directives(
        {}, "<META CONTENT='NOINDEX' NAME='ROBOTS'>"
    ) == (True, False, "meta")
    # union across carriers, header wins the source attribution
    assert W2.robots_directives(
        {b"x-robots-tag": b"noindex"},
        '<meta name="robots" content="nofollow">',
    ) == (True, True, "header")
    # non-admission tokens and other meta names have no effect
    assert W2.robots_directives(
        {b"x-robots-tag": b"nosnippet"},
        '<meta name="viewport" content="width=1">',
    ) == (False, False, None)
    assert W2.robots_directives(None, "") == (False, False, None)


def test_robots_directives_multi_meta_and_unquoted():
    # directives UNION across ALL robots metas (split over two tags)
    assert W.robots_directives(
        {},
        '<meta name="robots" content="noindex">'
        '<meta name="robots" content="nofollow">',
    ) == (True, True, "meta")
    # unquoted content value
    assert W.robots_directives(
        {}, "<meta name=robots content=noindex>"
    ) == (True, False, "meta")
    assert W.robots_directives(
        {}, "<meta content=nofollow name=robots>"
    ) == (False, True, "meta")
    # a robots meta plus an unrelated meta — no cross-contamination
    assert W.robots_directives(
        {},
        '<meta name="viewport" content="width=1">'
        "<meta name=robots content=none>",
    ) == (True, True, "meta")
