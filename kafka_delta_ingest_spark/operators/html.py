"""HTML → text extraction: the step between a web crawl (WARC) and
every text operator in this repo.

Pure stdlib (regex + ``html.unescape``), deterministic, and
vectorizable via Arrow-batched ``mapInPandas`` — the same
no-native-deps contract as the codec family. The heuristics are the
public readability/boilerplate lineage (Arc90 readability, Kohlschütter
et al. 2010 boilerpipe, trafilatura): strip non-content machinery,
segment into blocks, score each block by text mass vs link mass, keep
the content blocks.

* ``html_to_text`` — full-fidelity text: drop comments /
  script / style / noscript / svg / head, convert block-level tags to
  newlines, strip remaining tags, decode entities, collapse
  whitespace. Deterministic and total (never raises on weird HTML).
* ``extract_main`` — boilerplate removal on top: per block (split at
  block-level tags), compute link density (chars inside <a> vs all
  chars) and text length; drop short high-link-density blocks (nav,
  footers, sidebars). Returns (title, main_text, n_blocks_kept,
  n_blocks_dropped, n_links).
* ``html_extract(df, ...)`` — the Spark operator: one narrow
  mapInPandas over (id, html) → structured text columns; HTML blobs
  never shuffle.

At 100 TB: this kernel is per-row Python over Arrow batches — the
standard trade for text extraction (even native pipelines are
regex/DOM-bound here); the plan stays one narrow stage, so it scales
linearly with executors exactly like the codec roundtrips.
"""

from __future__ import annotations

import html as _html
import re

# tags whose entire content is machinery, never text
_DROP_BLOCKS = re.compile(
    r"<(script|style|noscript|svg|head|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
# block-level boundaries become newlines (paragraph structure survives);
# NON-capturing so re.split yields only content fragments — a capture
# group would interleave tag names into the split result, and filtering
# those by value would silently drop real content blocks whose text
# happens to equal a tag name ("pre", "form", ...).
_BLOCK_TAGS = re.compile(
    r"</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|"
    r"footer|nav|aside|blockquote|pre|form|hr)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>",
                    re.IGNORECASE | re.DOTALL)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_WS = re.compile(r"[ \t\r\f\v]+")
_NL = re.compile(r"\n\s*\n+")


def _clean(fragment: str) -> str:
    """Strip tags from an HTML fragment and decode entities."""
    return _html.unescape(_ANY_TAG.sub("", fragment))


def html_to_text(doc: str) -> str:
    """Full text of an HTML document: machinery dropped, block
    structure as newlines, entities decoded, whitespace collapsed."""
    doc = _COMMENTS.sub(" ", doc)
    doc = _DROP_BLOCKS.sub(" ", doc)
    doc = _BLOCK_TAGS.sub("\n", doc)
    text = _clean(doc)
    text = _WS.sub(" ", text)
    lines = [ln.strip() for ln in text.split("\n")]
    return _NL.sub("\n", "\n".join(ln for ln in lines if ln)).strip()


def extract_main(
    doc: str,
    min_block_chars: int = 30,
    max_link_density: float = 0.5,
):
    """Boilerplate-removing extraction.

    Blocks shorter than ``min_block_chars`` whose link density exceeds
    ``max_link_density`` are dropped (nav bars, footers, tag clouds);
    long blocks survive regardless of links (content paragraphs cite).
    Returns ``(title, main_text, n_kept, n_dropped, n_links)``."""
    title_m = _TITLE.search(doc)
    title = _WS.sub(" ", _clean(title_m.group(1))).strip() if title_m else ""
    body = _COMMENTS.sub(" ", doc)
    body = _DROP_BLOCKS.sub(" ", body)
    n_links = 0
    kept: list[str] = []
    dropped = 0
    for raw_block in _BLOCK_TAGS.split(body):
        anchors = _ANCHOR.findall(raw_block)
        link_chars = sum(len(_clean(a).strip()) for a in anchors)
        n_links += len(anchors)
        text = _WS.sub(" ", _clean(raw_block)).strip()
        if not text:
            continue
        density = link_chars / len(text) if text else 0.0
        if len(text) < min_block_chars and density > max_link_density:
            dropped += 1
            continue
        kept.append(text)
    return title, "\n".join(kept).strip(), len(kept), dropped, n_links


def html_extract(
    df,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_block_chars: int = 30,
    max_link_density: float = 0.5,
    keep_cols: list[str] | None = None,
):
    """Spark operator: (id, html string) → (id, title, text, n_blocks,
    n_boilerplate_blocks, n_links, n_chars). One narrow mapInPandas —
    HTML never shuffles; downstream operators see plain text.
    ``keep_cols`` forwards extra input columns through the kernel
    unchanged (url, fetch date, ...) so callers don't need a join to
    reattach them."""
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_delta_ingest_spark.operators.util import spread

    keep = list(keep_cols or [])
    in_cols = df.select(id_col, html_col, *keep)
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            *[StructField(c, df.schema[c].dataType) for c in keep],
            StructField("title", StringType()),
            StructField("text", StringType()),
            StructField("n_blocks", IntegerType()),
            StructField("n_boilerplate_blocks", IntegerType()),
            StructField("n_links", IntegerType()),
            StructField("n_chars", IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False, name=None):
                rid, doc, extras = tup[0], tup[1], tup[2:]
                title, text, kept, dropped, links = extract_main(
                    doc or "",
                    min_block_chars=min_block_chars,
                    max_link_density=max_link_density,
                )
                rows.append(
                    (rid, *extras, title, text, kept, dropped, links,
                     len(text))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, *keep, "title", "text", "n_blocks",
                    "n_boilerplate_blocks", "n_links", "n_chars",
                ],
            )

    return spread(in_cols).mapInPandas(run, schema=schema)
