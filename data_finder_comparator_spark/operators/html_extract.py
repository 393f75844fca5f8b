"""HTML boilerplate-removal text extraction — the first stage of a
real scraped-corpus pipeline (C4/RefinedWeb/FineWeb all begin by
turning raw HTML into block text before any quality/dedup step; the
reference engine starts from clean text, so this is a scale-pipeline
extension, not a §2 row).

Design: a stdlib ``html.parser.HTMLParser`` subclass runs per Arrow
batch inside ``mapInPandas`` — pure map-side, no shuffle, no driver
data movement; at 100 TB the plan is one whole-stage scan feeding the
Python worker pool with Arrow batches, exactly like the other
mapInPandas operators. No external parsing library is needed (the
container has none): HTMLParser is tolerant of real-world tag soup,
and the extraction rules below are deliberately mechanical so a SQL
oracle can recompute them over synthesized HTML.

Extraction rules (the C4-style block model):
- ``<script>``/``<style>`` subtree text and ``<!-- comments -->`` are
  dropped entirely (boilerplate, not content).
- ``<title>`` text becomes the ``title`` column (head metadata, not a
  body block).
- Block-level tags (``p div h1..h6 li tr td th table ul ol section
  article header footer nav blockquote pre br hr``) CLOSE the current
  text block; inline tags (``a b i span em strong code ...``) do not.
- Within a block, runs of ASCII whitespace collapse to one space and
  edges are trimmed; empty blocks are dropped.
- ``text`` is the surviving blocks joined with a newline;
  ``n_blocks`` counts them. Character references are decoded
  (``&amp;lt;`` round-trips to ``&lt;``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

# explicit ASCII class (not \s): Python's \s matches unicode
# whitespace (NBSP et al.) while RE2-based SQL engines match ASCII
# only — pinning the class keeps the operator oracle-recomputable
_WS = re.compile("[ \t\n\r\f\x0b]+")

_SKIP_SUBTREE = {"script", "style"}

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "td", "th", "table", "ul", "ol",
    "section", "article", "header", "footer", "nav",
    "blockquote", "pre", "br", "hr",
}


class _BlockTextParser(HTMLParser):
    """Accumulate block texts + the title; see the module docstring
    for the rules. ``convert_charrefs=True`` (the default) decodes
    entity/char references in data, so escaped source text
    round-trips exactly."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._in_title = False
        self._title_parts: list[str] = []
        self._blocks: list[str] = []
        self._cur: list[str] = []

    def _flush(self) -> None:
        block = _WS.sub(" ", "".join(self._cur)).strip(" ")
        self._cur.clear()
        if block:
            self._blocks.append(block)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREE:
            # max() tolerates tag soup: a stray </script> with no
            # opener must not underflow into skipping real content
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "title":
            self._in_title = False
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # self-closing block tags (<br/>, <hr/>) still break blocks
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self._title_parts.append(data)
        else:
            self._cur.append(data)

    def result(self) -> tuple[str, str, int]:
        self._flush()
        title = _WS.sub(" ", "".join(self._title_parts)).strip(" ")
        return title, "\n".join(self._blocks), len(self._blocks)


def html_block_text(html: str) -> tuple[str, str, int]:
    """Extract ``(title, text, n_blocks)`` from one HTML string —
    the per-document kernel, exposed for tests and for callers that
    already hold the payload outside Spark."""
    p = _BlockTextParser()
    p.feed(html)
    p.close()
    return p.result()


def extract_html_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Replace ``html_col`` with extracted ``title`` / ``text`` /
    ``n_blocks`` columns, all other columns passing through unchanged.
    Rows with a NULL html payload drop (the multimodal convention: a
    null source cell must not kill the task, and fabricating an empty
    extraction would launder it into "an empty page").

    Plan shape: one mapInPandas over the scan — map-side only, no
    shuffle, no collect; Arrow batch size bounds worker memory
    regardless of corpus size.
    """
    if html_col not in df.columns:
        raise ValueError(f"column {html_col!r} not in {df.columns}")
    passthrough = [c for c in df.columns if c != html_col]
    clash = sorted({"title", "text", "n_blocks"} & set(passthrough))
    if clash:
        # a documents-shaped input (which already HAS a text column)
        # would otherwise come out with duplicate column names —
        # unselectable downstream; refuse loudly (r18 self-review)
        raise ValueError(
            f"input columns {clash} collide with the extraction output; "
            "rename or drop them first"
        )
    pass_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != html_col
    )
    sep = ", " if pass_schema else ""
    out_schema = f"{pass_schema}{sep}title string, text string, n_blocks long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[html_col].notna()]
            if pdf.empty:
                continue
            extracted = [html_block_text(h) for h in pdf[html_col]]
            out = pdf[passthrough].copy()
            out["title"] = [e[0] for e in extracted]
            out["text"] = [e[1] for e in extracted]
            out["n_blocks"] = [e[2] for e in extracted]
            yield out

    return df.mapInPandas(run, schema=out_schema)
