"""WARC source + HTML extraction tests: record codec, gzip members,
HTTP framing, per-record quarantine, the distributed binaryFile read
path, and the boilerplate-removal heuristics."""

import gzip

import pytest

from kafka_delta_ingest_spark.operators.html import (
    extract_main,
    html_extract,
    html_to_text,
)
from kafka_delta_ingest_spark.warc import (
    encode_warc_record,
    http_split,
    parse_warc,
    read_warc,
    write_warc,
)


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode() + b"\r\n\r\n"
        + body
    )


def _page(i: int) -> bytes:
    return (
        f"<html><head><title>Page {i}</title></head><body>"
        f"<nav><a href='/'>Home</a></nav>"
        f"<p>Real content paragraph number {i} with plenty of characters "
        f"to clear the block threshold.</p></body></html>"
    ).encode()


def test_record_roundtrip_plain_and_gzip():
    for gz in (False, True):
        rec = encode_warc_record(
            "response",
            _http(_page(1)),
            {"WARC-Target-URI": "http://e.com/1"},
            gzip_record=gz,
        )
        out = list(parse_warc(rec))
        assert len(out) == 1
        assert out[0]["warc_type"] == "response"
        assert out[0]["headers"]["WARC-Target-URI"] == "http://e.com/1"
        st, hh, body = http_split(out[0]["payload"])
        assert st == 200 and b"Real content" in body


def test_multi_record_and_multi_member():
    plain = b"".join(
        encode_warc_record("response", _http(_page(i))) for i in range(5)
    )
    assert len(list(parse_warc(plain))) == 5
    gz = b"".join(
        encode_warc_record("response", _http(_page(i)), gzip_record=True)
        for i in range(5)
    )
    assert len(list(parse_warc(gz))) == 5


def test_malformed_framing_raises():
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
    with pytest.raises(ValueError, match="version"):
        list(parse_warc(b"HTTP/1.1 200\r\n\r\n"))
    good = encode_warc_record("response", _http(_page(1)))
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc(good[: len(good) - 20]))
    with pytest.raises(ValueError, match="truncated gzip"):
        full = encode_warc_record("response", _http(_page(1)),
                                  gzip_record=True)
        list(parse_warc(full[:-8]))
    with pytest.raises(ValueError, match="HTTP"):
        http_split(b"<html>no status line</html>")
    with pytest.raises(ValueError, match="CR/LF"):
        encode_warc_record("response", b"", {"X": "a\r\nInjected: b"})


def test_read_warc_distributed(spark, tmp_path):
    # Two files (one gzipped), mixed record types, one corrupt file —
    # the reader keeps good records, surfaces errors as rows.
    f1 = str(tmp_path / "a.warc")
    write_warc(
        f1,
        [
            {"warc_type": "warcinfo", "payload": b"software: t\r\n"},
            {
                "warc_type": "response",
                "payload": _http(_page(1)),
                "headers": {
                    "WARC-Target-URI": "http://e.com/1",
                    "WARC-Record-ID": "<urn:uuid:1>",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
            },
            {"warc_type": "request", "payload": b"GET / HTTP/1.1\r\n\r\n"},
        ],
    )
    f2 = str(tmp_path / "b.warc.gz")
    write_warc(
        f2,
        [
            {
                "warc_type": "response",
                "payload": _http(_page(i)),
                "headers": {"WARC-Target-URI": f"http://e.com/gz{i}"},
            }
            for i in range(2, 5)
        ],
        gzip_records=True,
    )
    with open(str(tmp_path / "c.warc"), "wb") as f:
        f.write(b"GARBAGE NOT A WARC FILE AT ALL\r\n\r\n")

    got = read_warc(spark, str(tmp_path)).collect()
    ok = [r for r in got if r.parse_error is None]
    bad = [r for r in got if r.parse_error is not None]
    assert len(ok) == 4  # only the response records pass the type filter
    assert {r.target_uri for r in ok} == {
        "http://e.com/1", "http://e.com/gz2", "http://e.com/gz3",
        "http://e.com/gz4",
    }
    assert all(r.http_status == 200 for r in ok)
    assert all(b"Real content" in bytes(r.body) for r in ok)
    assert len(bad) == 1 and bad[0].warc_file.endswith("c.warc")

    # non-response types on request
    info = read_warc(spark, f1, types=("warcinfo", "request")).collect()
    assert {r.warc_type for r in info} == {"warcinfo", "request"}


def test_html_to_text_machinery_and_entities():
    doc = (
        "<html><head><title>T</title><script>x='<p>fake</p>'</script>"
        "<style>.a{}</style></head><body><!-- note -->"
        "<h1>Head&nbsp;Line</h1><p>Alpha &amp; beta.</p>"
        "<pre>  spaced   text </pre></body></html>"
    )
    t = html_to_text(doc)
    assert "fake" not in t and ".a{}" not in t and "note" not in t
    assert "Head Line" in t and "Alpha & beta." in t


def test_extract_main_boilerplate_rules():
    doc = (
        "<html><head><title>The Title</title></head><body>"
        "<nav><a>Home</a><a>About</a></nav>"
        "<p>Long enough paragraph that should definitely be kept as the "
        "main article content of this page.</p>"
        "<p>Short with <a href='x'>link</a></p>"
        "<p>A long paragraph containing a citation <a href='y'>link</a> "
        "survives because content length dominates its link mass.</p>"
        "<footer><a>Contact</a></footer></body></html>"
    )
    title, main, kept, dropped, links = extract_main(doc)
    assert title == "The Title"
    assert "main article content" in main
    assert "citation" in main
    assert "Home" not in main and "Contact" not in main
    assert dropped >= 2 and links == 5
    # never raises on garbage
    assert extract_main("")[1] == ""
    extract_main("<<<>>>&#x;<a")


def test_content_block_equal_to_tag_name_survives():
    # r6 review finding: a capture-group split interleaved tag names
    # into the block list and the skip-filter matched real content by
    # VALUE — a block whose whole text is "pre"/"form"/... vanished.
    doc = "<html><body><p>pre</p><p>form</p><h2>nav</h2></body></html>"
    _, main, kept, dropped, _ = extract_main(doc, min_block_chars=2)
    assert main.split("\n") == ["pre", "form", "nav"]
    assert kept == 3 and dropped == 0
    assert "pre" in html_to_text(doc)


def test_lenient_parse_recovers_after_bad_gzip_member():
    # r6 review finding: one malformed record aborted the rest of the
    # file. In the gzip-member layout each member is independent, so
    # recovery must resume at the next member.
    from kafka_delta_ingest_spark.warc import parse_warc_lenient

    good1 = encode_warc_record("response", _http(_page(1)),
                               {"WARC-Target-URI": "http://e.com/1"},
                               gzip_record=True)
    # valid gzip member whose CONTENT is not a WARC record
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as z:
        z.write(b"NOT A WARC RECORD\r\n\r\n")
    bad = buf.getvalue()
    good2 = encode_warc_record("response", _http(_page(2)),
                               {"WARC-Target-URI": "http://e.com/2"},
                               gzip_record=True)
    out = list(parse_warc_lenient(good1 + bad + good2))
    uris = [r["headers"]["WARC-Target-URI"] for r in out if "error" not in r]
    errs = [r for r in out if "error" in r]
    assert uris == ["http://e.com/1", "http://e.com/2"]
    assert len(errs) == 1


def test_lenient_parse_plain_keeps_prefix_records():
    from kafka_delta_ingest_spark.warc import parse_warc_lenient

    good = encode_warc_record("response", _http(_page(1)),
                              {"WARC-Target-URI": "http://e.com/1"})
    blob = good + b"GARBAGE WITHOUT FRAMING"
    out = list(parse_warc_lenient(blob))
    assert [r["headers"]["WARC-Target-URI"]
            for r in out if "error" not in r] == ["http://e.com/1"]
    assert sum(1 for r in out if "error" in r) == 1


def test_read_warc_keeps_records_after_mid_file_corruption(spark, tmp_path):
    f = str(tmp_path / "mix.warc.gz")
    good1 = encode_warc_record("response", _http(_page(1)),
                               {"WARC-Target-URI": "http://e.com/1"},
                               gzip_record=True)
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as z:
        z.write(b"NOT A WARC RECORD\r\n\r\n")
    good2 = encode_warc_record("response", _http(_page(2)),
                               {"WARC-Target-URI": "http://e.com/2"},
                               gzip_record=True)
    with open(f, "wb") as fh:
        fh.write(good1 + buf.getvalue() + good2)
    got = read_warc(spark, f).collect()
    ok = {r.target_uri for r in got if r.parse_error is None}
    assert ok == {"http://e.com/1", "http://e.com/2"}
    assert sum(1 for r in got if r.parse_error is not None) == 1


def test_cli_extract_web_to_curate(spark, tmp_path):
    """End-to-end web funnel: WARC crawl → extract-web → documents
    parquet that `curate` accepts unchanged."""
    from kafka_delta_ingest_spark.cli import main

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    body = (
        "<html><head><title>Article {i}</title></head><body>"
        "<nav><a href='/'>Home</a></nav>"
        + "<p>Paragraph one of article {i} with a reasonable amount of "
        "real textual content for the quality gates to look at.</p>"
        "<p>Paragraph two keeps going with more plain language text "
        "so the extracted document clears the min-chars bar.</p>"
        "<footer><a href='/c'>Contact</a></footer></body></html>"
    )
    records = []
    for i in range(6):
        records.append(
            {
                "warc_type": "response",
                "payload": _http(body.replace("{i}", str(i)).encode()),
                "headers": {
                    "WARC-Record-ID": f"<urn:uuid:{i}>",
                    "WARC-Target-URI": f"https://www.site{i % 2}.com/a/{i}",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                },
            }
        )
    # non-HTML and non-200 records must be filtered, not fail
    records.append(
        {
            "warc_type": "response",
            "payload": _http(b"binary", ctype="image/png"),
            "headers": {"WARC-Target-URI": "https://www.site0.com/img"},
        }
    )
    write_warc(str(crawl / "a.warc.gz"), records[:4], gzip_records=True)
    write_warc(str(crawl / "b.warc"), records[4:])
    with open(crawl / "junk.warc", "wb") as f:
        f.write(b"NOT A WARC\r\n\r\n")

    docs_out = str(tmp_path / "docs")
    quarantine = str(tmp_path / "quarantine")
    rc = main(
        ["extract-web", str(crawl), docs_out, "--min_chars", "50",
         "--quarantine", quarantine]
    )
    assert rc == 0
    docs = spark.read.parquet(docs_out)
    rows = {r.url: r for r in docs.collect()}
    assert len(rows) == 6  # six HTML pages; png filtered out
    any_row = rows["https://www.site1.com/a/1"]
    assert any_row.title == "Article 1"
    assert "Paragraph one of article 1" in any_row.text
    assert "Home" not in any_row.text  # boilerplate removed
    assert any_row.source == "site1.com"
    assert any_row.lang is not None and any_row.n_chars >= 50
    assert len({r.doc_id for r in rows.values()}) == 6  # ids distinct
    q = spark.read.parquet(quarantine).collect()
    assert len(q) == 1 and q[0].warc_file.endswith("junk.warc")

    # the output is curate-compatible as-is
    curated = str(tmp_path / "curated")
    rc = main(
        ["curate", docs_out, curated, "--min_quality", "0.0",
         "--dedup", "exact"]
    )
    assert rc == 0
    assert spark.read.parquet(curated).count() > 0


def test_html_extract_keep_cols_forwarding(spark):
    df = spark.createDataFrame(
        [(1, "<p>Some long enough content block for extraction.</p>",
          "https://x.com/1")],
        "doc_id long, html string, url string",
    )
    r = html_extract(df, keep_cols=["url"]).collect()[0]
    assert r.url == "https://x.com/1"
    assert "Some long enough content" in r.text


def test_html_extract_operator(spark):
    rows = [
        (1, "<html><head><title>A</title></head><body>"
            "<p>Operator-level content long enough to be kept here.</p>"
            "<nav><a>x</a></nav></body></html>"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in html_extract(df).collect()}
    assert got[1].title == "A"
    assert "Operator-level content" in got[1].text
    assert got[1].n_boilerplate_blocks >= 1
    assert got[2].text == "" and got[2].n_chars == 0
