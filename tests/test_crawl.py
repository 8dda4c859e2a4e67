"""Crawl-ingestion units: the WARC shard generator's arithmetic
contract (the oracle constants), gzip member walking, WARC/HTTP header
validation, and the boilerplate-stripping HTML extractor's exclusion /
ordering semantics."""

from __future__ import annotations

import gzip
import hashlib

import pytest

from trino_adaptive_partitioning_tool_spark.operators import crawl


def _hx(key: int) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()


def test_template_constants_pinned():
    """The oracle's affine body-length model (171 + 31P + 26L) against
    the live generator, across enough rids to hit every (P, L) cell."""
    seen = set()
    for rid in range(0, 512, 8):  # rid % 8 == 0 -> always status 200
        key = crawl._doc_key(rid)
        hx = _hx(key)
        p = int(hx[30:32], 16) % 3 + 2
        li = int(hx[28:30], 16) % 3
        seen.add((p, li))
        html = crawl.synth_html(rid)
        assert len(html) == (
            171 + crawl.PARA_LINE_LEN * p + crawl.LINK_LINE_LEN * li
        )
    assert seen == {(p, li) for p in (2, 3, 4) for li in (0, 1, 2)}


def test_duplicate_convention():
    assert crawl.synth_html(8) == crawl.synth_html(0)
    assert crawl.synth_html(24) == crawl.synth_html(16)
    assert crawl.synth_html(9) != crawl.synth_html(1)


def test_extract_text_matches_digest_convention():
    for rid in (0, 5, 16, 42, 101):
        key = crawl._doc_key(rid)
        hx = _hx(key)
        p = int(hx[30:32], 16) % 3 + 2
        li = int(hx[28:30], 16) % 3
        title, text, n_links = crawl.extract_text(crawl.synth_html(rid))
        assert title == f"doc{key:05d}"
        assert n_links == li
        words = text.split()
        assert words[:2] == ["doc", f"{key:05d}"]
        hex_words = [w for w in words if len(w) == 2]
        expected = [
            hx[2 * ((pp * 8 + w) % 16) : 2 * ((pp * 8 + w) % 16) + 2]
            for pp in range(p)
            for w in range(8)
        ] + [hx[2 * (8 + k) : 2 * (8 + k) + 2] for k in range(li)]
        assert hex_words == expected


def test_extractor_excludes_decoys_and_head():
    html = (
        b"<html><head><title>t x</title><style>p{} aa bb</style>"
        b"<script>var s='cc dd';</script></head>"
        b"<body><!-- ee ff --><p>real words</p>"
        b"<script>nested('gg');<!-- hh --></script>"
        b"<div>tail</div></body></html>"
    )
    title, text, n_links = crawl.extract_text(html)
    assert title == "t x"
    assert text == "real words tail"
    assert n_links == 0


def test_extractor_block_tags_break_words():
    # adjacent blocks must not fuse into one token
    title, text, _ = crawl.extract_text(
        b"<body><p>alpha</p><p>beta</p><li>gamma</li></body>"
    )
    assert text.split() == ["alpha", "beta", "gamma"]


def test_extractor_charrefs_and_links():
    # <a> is inline: no word break across it (browser semantics), so
    # adjacent anchors fuse exactly as rendered text would
    title, text, n_links = crawl.extract_text(
        b'<body>a &amp; b <a href="/x">c</a> <a href="/y">d</a></body>'
    )
    assert text == "a & b c d"
    assert n_links == 2
    _, fused, _ = crawl.extract_text(b'<body>b<a href="/x">c</a>d</body>')
    assert fused == "bcd"


def test_split_gzip_members_boundaries():
    parts = [b"first record", b"second", b"third one here"]
    blob = b"".join(gzip.compress(p, mtime=0) for p in parts)
    assert crawl.split_gzip_members(blob) == parts


def test_split_gzip_members_truncation_raises():
    blob = gzip.compress(b"x" * 100, mtime=0)
    with pytest.raises(ValueError):
        crawl.split_gzip_members(blob[:-3])
    with pytest.raises(ValueError):
        crawl.split_gzip_members(blob + b"garbage tail")


def test_parse_warc_record_round_trip():
    rec = crawl.synth_record(0)
    out = crawl.parse_warc_record(rec)
    assert out["warc_type"] == "response"
    assert out["uri"] == "http://example.com/doc00000"
    assert out["status"] == 200
    assert out["content_type"].startswith("text/html")
    assert out["body"] == crawl.synth_html(0)
    assert out["record_bytes"] == len(rec)


def test_parse_warc_record_statuses():
    assert crawl.parse_warc_record(crawl.synth_record(6))["status"] == 404
    r301 = crawl.parse_warc_record(crawl.synth_record(7))
    assert r301["status"] == 301
    assert r301["body"] == b""


def test_parse_warc_record_length_mismatch_raises():
    rec = crawl.synth_record(1)
    # shrink the WARC Content-Length so the trailing CRLF check fails
    bad = rec.replace(b"Content-Length: ", b"Content-Length: 1", 1)
    with pytest.raises(ValueError):
        crawl.parse_warc_record(bad)
    with pytest.raises(ValueError):
        crawl.parse_warc_record(rec[: len(rec) // 2])
    with pytest.raises(ValueError):
        crawl.parse_warc_record(b"NOTWARC/1.0\r\n\r\n")


def test_shard_end_to_end_without_spark():
    """The full member walk + parse chain over a locally built shard
    payload, matching synth_warc_shards' layout byte for byte."""
    sid, rps = 3, crawl.RECORDS_PER_SHARD
    payload = b"".join(
        gzip.compress(crawl.synth_record(sid * rps + j), mtime=0)
        for j in range(rps)
    )
    members = crawl.split_gzip_members(payload)
    assert len(members) == rps
    for j, member in enumerate(members):
        rid = sid * rps + j
        rec = crawl.parse_warc_record(member)
        assert rec["uri"] == f"http://example.com/doc{rid:05d}"
        assert rec["status"] == crawl._status(rid)
