"""PDF text-extraction tests: roundtrips through the fixture writer,
string/escape syntax, text operators, filters, quarantine semantics,
and the Spark operator."""

import zlib

import pytest

from kafka_delta_ingest_spark.operators.pdf import (
    extract_text_stream,
    pdf_extract,
    pdf_to_text,
    write_pdf,
)


@pytest.mark.parametrize("compress", [True, False])
def test_writer_reader_roundtrip(compress):
    lines = [
        "Hello World",
        "Parens (nested (deep)) and \\ backslash",
        "Unicode: 中文 piñata ü",
        "digits 123 and /names stay",
    ]
    blob = write_pdf(lines, compress=compress)
    assert pdf_to_text(blob).split("\n") == lines


def test_string_syntax_escapes():
    assert extract_text_stream(rb"BT (A\101\n) Tj ET") == ["AA\n"]
    assert extract_text_stream(rb"BT (a\(b\)c\\d) Tj ET") == ["a(b)c\\d"]
    # line continuation inside a literal
    assert extract_text_stream(b"BT (ab\\\ncd) Tj ET") == ["abcd"]
    # hex strings, including UTF-16BE with BOM
    assert extract_text_stream(b"BT <48 65 6C 6C 6F> Tj ET") == ["Hello"]
    utf16 = b"\xfe\xff" + "héllo".encode("utf-16-be")
    assert extract_text_stream(
        b"BT <" + utf16.hex().encode() + b"> Tj ET"
    ) == ["héllo"]


def test_text_operators():
    # TJ arrays drop kerning numbers
    assert extract_text_stream(b"BT [(He) -20 (llo)] TJ ET") == ["Hello"]
    # quote operators start a new line
    assert extract_text_stream(b"BT (a) Tj (b) ' ET") == ["a", "b"]
    # Td/TD/T* break lines
    assert extract_text_stream(
        b"BT (x) Tj 0 -14 Td (y) Tj T* (z) Tj ET"
    ) == ["x", "y", "z"]
    # text outside BT/ET is ignored
    assert extract_text_stream(b"(stray) Tj BT (kept) Tj ET") == ["kept"]


def test_filters_and_malformed():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_to_text(b"NOTPDF")
    with pytest.raises(ValueError, match="unsupported PDF filter"):
        pdf_to_text(
            b"%PDF-1.4\n1 0 obj << /Filter /LZWDecode /Length 2 >>\n"
            b"stream\nxx\nendstream\nendobj"
        )
    with pytest.raises(ValueError, match="object/xref streams"):
        pdf_to_text(
            b"%PDF-1.5\n1 0 obj << /Type /ObjStm /Length 2 >>\n"
            b"stream\nxx\nendstream\nendobj"
        )
    with pytest.raises(ValueError, match="FlateDecode"):
        pdf_to_text(
            b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode /Length 4 >>\n"
            b"stream\nnotz\nendstream\nendobj"
        )
    # images are skipped, not errors
    img = (
        b"%PDF-1.4\n1 0 obj << /Subtype /Image /Filter /DCTDecode "
        b"/Length 2 >>\nstream\nxx\nendstream\nendobj"
    )
    assert pdf_to_text(img) == ""
    # truncated stream
    good = write_pdf(["x"], compress=True)
    with pytest.raises(ValueError):
        pdf_to_text(good.replace(b"endstream", b"endstrea_"))


def test_pdf_extract_operator_with_quarantine(spark):
    rows = [
        (1, bytearray(write_pdf(["doc one line a", "line b"]))),
        (2, bytearray(b"%PDF-1.4 garbage no objects")),
        (3, bytearray(write_pdf([], compress=False))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary")
    got = {r.doc_id: r for r in pdf_extract(df).collect()}
    assert got[1].text == "doc one line a\nline b"
    assert got[1].n_lines == 2 and got[1].parse_error is None
    assert got[2].text is None and got[2].parse_error is not None
    assert got[3].text == "" and got[3].n_lines == 0


def test_objects_before_stream_do_not_glom_into_stream_dict():
    """Regression (review finding r6): a font object (/Subtype /Type1)
    and a page dict mentioning /ImageB placed BEFORE the content
    stream must not leak keys into the stream's dict — the old
    leftmost-`<<` regex matched from the first object and silently
    skipped the content stream as an image."""
    import zlib

    comp = zlib.compress(b"BT /F1 12 Tf (Order test) Tj ET")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 "
        b"/BaseFont /Helvetica >>\nendobj\n"
        b"6 0 obj\n<< /SomethingElse /Length 5 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Resources << /Font "
        b"<< /F1 5 0 R >> /ProcSet [/PDF /Text /ImageB] >> "
        b"/Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Predictor 1 >> >>\n"
        b"stream\n" + comp + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert pdf_to_text(pdf).strip() == "Order test"


def test_multi_digit_indirect_length_resolves():
    """/Length 1234 0 R must resolve object 1234, not backtrack to a
    truncated direct length of 123 (review fix: the old direct-form
    regex could shrink the digit run until its lookahead passed)."""
    from kafka_delta_ingest_spark.operators.pdf import (
        _find_streams,
        _resolve_length,
    )

    body = b"1234 0 obj 11 endobj"
    d = b"<< /Length 1234 0 R >>"
    assert _resolve_length(body, d) == 11
    # a full stream object wired through an indirect length
    data = b"hello 11 by"
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Length 1234 0 R >> stream\n"
        + data
        + b"\nendstream endobj\n"
        b"1234 0 obj 11 endobj\n"
    )
    [(dict_bytes, raw)] = list(_find_streams(doc))
    assert raw == data
