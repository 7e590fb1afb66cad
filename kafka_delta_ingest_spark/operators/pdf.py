"""PDF text extraction in pure stdlib — the second big document
format (after HTML) that web-scale training corpora arrive in.

Implements a deliberate SUBSET of ISO 32000 (the public PDF spec),
the part that covers digitally-authored text PDFs:

* classic object syntax (``N G obj … endobj``) located by a tolerant
  byte scan — xref tables are ignored (they only accelerate random
  access; a linear scan finds every object), PDF 1.5 cross-reference
  STREAMS and object streams are out of scope and raise;
* stream objects with ``/FlateDecode`` (stdlib zlib) or no filter;
  other filters (DCT/LZW/ASCII85) raise with a clear message;
* content-stream text operators: ``BT``/``ET`` blocks, ``Tj``,
  ``'``/``"``, ``TJ`` arrays (kerning numbers dropped), line-position
  operators ``Td``/``TD``/``T*`` emitting newlines;
* string syntax: ``(...)`` literals with the full escape table
  (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal ``\\ddd``, and
  line-continuation), nested balanced parens, and ``<...>`` hex
  strings (latin-1, or UTF-16BE when BOM-prefixed).

Scanned/image-only PDFs yield no text (correct: OCR is a model, not a
parser). A fixture writer emits real %PDF-1.4 files (Flate-compressed
content streams, xref table, trailer) so tests and the driver query
certify the extractor against well-formed documents.

Spark surface mirrors html_extract: per-row kernels in Arrow-batched
``mapInPandas``; PDF blobs never shuffle.
"""

from __future__ import annotations

import re
import zlib

_STREAM_KW = re.compile(rb">>\s*stream\r?\n")


def _dict_open(b: bytes, close: int) -> int:
    """Index just after the ``<<`` that balances the ``>>`` at
    ``close``, scanning backwards and counting nested dicts.  A
    leftmost-``<<`` regex (`<<.*?>>\\s*stream`) is WRONG here: search
    anchors at the earliest ``<<`` in the file, so every non-stream
    object since the previous stream gloms into the matched dict and
    /Subtype//Image//Length lookups read keys from unrelated objects
    (e.g. a font object's ``/Subtype /Type1`` plus a ProcSet's
    ``/ImageB`` make a valid content stream skip as an image)."""
    depth, i = 1, close
    while True:
        j_open = b.rfind(b"<<", 0, i)
        if j_open < 0:
            raise ValueError("unbalanced PDF dictionary")
        j_close = b.rfind(b">>", 0, i)
        if j_close > j_open:
            depth += 1
            i = j_close
        else:
            depth -= 1
            if depth == 0:
                return j_open + 2
            i = j_open


# Direct form must consume the ENTIRE digit run — without the (?!\d)
# guard the regex engine backtracks a multi-digit indirect reference
# ("/Length 1234 0 R") down to a prefix ("123") whose next character
# defeats the not-an-indirect-ref lookahead, silently returning a
# truncated byte count.  Indirect is also tried FIRST for the same
# reason: its grammar is unambiguous.
_LENGTH_DIRECT = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_LENGTH_INDIRECT = re.compile(rb"/Length\s+(\d+)\s+(\d+)\s+R")


def _resolve_length(b: bytes, d: bytes) -> int | None:
    m = _LENGTH_INDIRECT.search(d)
    if m:
        ref = re.search(
            rb"(?<![\d.])" + m.group(1) + rb"\s+" + m.group(2)
            + rb"\s+obj\s*(\d+)",
            b,
        )
        if ref:
            return int(ref.group(1))
        return None
    m = _LENGTH_DIRECT.search(d)
    if m:
        return int(m.group(1))
    return None


def _find_streams(b: bytes):
    """Yield (dict_bytes, raw_stream_bytes) for every stream object.

    The stream body is taken as exactly ``/Length`` bytes (resolving
    indirect length objects) — byte-trimming heuristics silently eat a
    real trailing 0x0D/0x0A data byte roughly one document in 64. The
    ``endstream`` scan is only the fallback when no length resolves,
    and then only a SINGLE trailing EOL is stripped (the one the
    writer inserted)."""
    pos = 0
    while True:
        m = _STREAM_KW.search(b, pos)
        if m is None:
            return
        start = m.end()
        d = b[_dict_open(b, m.start()):m.start()]
        length = _resolve_length(b, d)
        if length is not None and start + length <= len(b):
            data = b[start:start + length]
            tail = b[start + length:start + length + 16]
            if b"endstream" not in tail.lstrip(b"\r\n")[:9]:
                raise ValueError("stream /Length does not reach endstream")
            end = start + length
        else:
            end = b.find(b"endstream", start)
            if end < 0:
                raise ValueError("unterminated PDF stream")
            data = b[start:end]
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith(b"\n") or data.endswith(b"\r"):
                data = data[:-1]
        yield d, data
        pos = end


def _decode_stream(d: bytes, data: bytes) -> bytes | None:
    """Decode one stream body; None for non-content streams we skip
    (images); raises on unsupported text-relevant filters."""
    if b"/Subtype" in d and b"/Image" in d:
        return None
    if b"/FlateDecode" in d:
        try:
            return zlib.decompress(data)
        except zlib.error as ex:
            raise ValueError(f"bad FlateDecode stream: {ex}") from None
    for f in (b"/DCTDecode", b"/LZWDecode", b"/ASCII85Decode",
              b"/RunLengthDecode", b"/CCITTFaxDecode", b"/JBIG2Decode",
              b"/JPXDecode"):
        if f in d:
            if f == b"/DCTDecode":
                return None  # embedded JPEG image: no text
            raise ValueError(f"unsupported PDF filter {f.decode()}")
    if b"/ObjStm" in d or b"/XRef" in d:
        raise ValueError(
            "PDF 1.5 object/xref streams unsupported (classic xref only)"
        )
    return data


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _read_literal(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at the '('; returns (bytes,
    index after the closing paren)."""
    assert s[i] == 0x28
    i += 1
    out = bytearray()
    depth = 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while i < n and 0x30 <= s[i] <= 0x37 and len(oct_digits) < 3:
                    oct_digits.append(s[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF string literal")


def _read_hex(s: bytes, i: int) -> tuple[bytes, int]:
    assert s[i] == 0x3C
    end = s.find(b">", i + 1)
    if end < 0:
        raise ValueError("unterminated hex string")
    hx = re.sub(rb"\s", b"", s[i + 1:end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), end + 1


def _to_text(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


_TOKEN = re.compile(
    rb"\(|<(?!<)|\[|\]|BT|ET|TJ|Tj|Td|TD|T\*|'|\"|<<|>>|[^\s()<>\[\]/]+"
    rb"|/[^\s()<>\[\]/]*"
)


def extract_text_stream(content: bytes) -> list[str]:
    """Text lines from one decoded content stream."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []
    i = 0
    n = len(content)
    in_text = False

    def flush_line():
        nonlocal cur
        if cur:
            lines.append("".join(cur))
            cur = []

    while i < n:
        c = content[i]
        if c in b" \t\r\n\x00":
            i += 1
            continue
        if c == 0x28:  # (
            raw, i = _read_literal(content, i)
            pending.append(_to_text(raw))
            continue
        if c == 0x3C and not content.startswith(b"<<", i):  # hex string
            raw, i = _read_hex(content, i)
            pending.append(_to_text(raw))
            continue
        m = _TOKEN.match(content, i)
        if m is None:
            i += 1
            continue
        tok = m.group()
        i = m.end()
        if tok == b"BT":
            in_text = True
        elif tok == b"ET":
            in_text = False
            flush_line()
        elif tok in (b"Tj", b"TJ"):
            if in_text and pending:
                cur.extend(pending)
            pending = []
        elif tok in (b"'", b'"'):
            # move to next line and show
            flush_line()
            if in_text and pending:
                cur.extend(pending)
            pending = []
        elif tok in (b"Td", b"TD", b"T*"):
            flush_line()
            pending = []
        elif tok in (b"[", b"]"):
            continue
        else:
            # operands (numbers, names) — showing operators consume
            # `pending` strings; anything else drops stale operands
            if tok not in (b"<<", b">>") and not _is_number(tok):
                pending = []
    flush_line()
    return [ln for ln in lines if ln.strip()]


def _is_number(tok: bytes) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def pdf_to_text(b: bytes) -> str:
    """All text of a PDF document, one line per text-positioning run,
    pages/streams in file order. Raises ValueError on malformed or
    unsupported-feature documents."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    lines: list[str] = []
    saw_stream = False
    for d, data in _find_streams(b):
        decoded = _decode_stream(d, data)
        if decoded is None:
            continue
        saw_stream = True
        if b"BT" in decoded and b"ET" in decoded:
            lines.extend(extract_text_stream(decoded))
    if not saw_stream and not re.search(rb"\d+\s+\d+\s+obj\b", b):
        raise ValueError("no PDF objects found")
    return "\n".join(lines)


def write_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Fixture writer: a real one-page %PDF-1.4 with Helvetica text,
    optional Flate-compressed content stream, xref table, trailer.
    Non-latin-1 characters are written as UTF-16BE hex strings."""
    ops = [b"BT /F1 12 Tf 72 760 Td"]
    first = True
    for ln in lines:
        if not first:
            ops.append(b"0 -14 Td")
        first = False
        try:
            body = ln.encode("latin-1")
            esc = (
                body.replace(b"\\", b"\\\\")
                .replace(b"(", b"\\(")
                .replace(b")", b"\\)")
            )
            ops.append(b"(" + esc + b") Tj")
        except UnicodeEncodeError:
            raw = b"\xfe\xff" + ln.encode("utf-16-be")
            ops.append(b"<" + raw.hex().encode() + b"> Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


def pdf_extract(
    df,
    pdf_col: str = "pdf",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
):
    """Spark operator: (id, pdf binary) → (id, text, n_lines, n_chars,
    parse_error). Malformed documents quarantine per row (text NULL,
    parse_error set) — the writer.rs:618-639 rule, as everywhere."""
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_delta_ingest_spark.operators.util import spread

    keep = list(keep_cols or [])
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            *[StructField(c, df.schema[c].dataType) for c in keep],
            StructField("text", StringType()),
            StructField("n_lines", IntegerType()),
            StructField("n_chars", IntegerType()),
            StructField("parse_error", StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False, name=None):
                rid, blob, extras = tup[0], tup[1], tup[2:]
                try:
                    text = pdf_to_text(bytes(blob) if blob else b"")
                    rows.append(
                        (rid, *extras, text,
                         text.count("\n") + 1 if text else 0,
                         len(text), None)
                    )
                except ValueError as ex:
                    rows.append((rid, *extras, None, 0, 0, str(ex)))
            yield pd.DataFrame(
                rows,
                columns=[id_col, *keep, "text", "n_lines", "n_chars",
                         "parse_error"],
            )

    return spread(df.select(id_col, pdf_col, *keep)).mapInPandas(
        run, schema=schema
    )
