"""HTML main-content extraction — boilerplate stripping via shallow text
features (text density + link density), after Kohlschütter et al., WSDM 2010
("Boilerplate Detection Using Shallow Text Features") and the jusText
heuristic family. This capability is part of the north_rule and absent from
the reference repo (SURVEY.md §2.10 note) — it is built from the published
algorithms only.

stdlib-only (html.parser); emits the same span contract as the PDF tokenizer:
``{'page_width': 0, 'page_height': 0, 'spans': [...]}`` where text spans are
kept content blocks and media spans are ``<img>`` tags (media_ref = src).
Document order is encoded in the geometry: span i gets ``y0 = -i`` so the
shared reading-order sort key (−y0, x0) preserves it."""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any, Dict, List, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from pdf_extractor_spark.schema import TOKENIZED_STRUCT

# Elements that delimit text blocks (block-level boundaries).
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "header", "footer", "aside",
    "nav", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "tr",
    "table", "ul", "ol", "blockquote", "pre", "figure", "figcaption", "br",
}
_SKIP_CONTENT = {"script", "style", "noscript", "template", "svg", "head"}
# Boilerplate-prone containers: text inside them needs stronger evidence.
_BOILER_TAGS = {"nav", "footer", "aside", "header"}

# Classification thresholds (Kohlschütter-style densitometric rules).
MAX_LINK_DENSITY = 0.33
MIN_TEXT_DENSITY = 3.0  # words per 80-char wrapped line
MIN_WORDS_SHORT = 10  # short blocks need ≥ this many words
LINE_WIDTH = 80.0


class _Block:
    __slots__ = ("chars", "link_chars", "words", "boiler_depth", "order")

    def __init__(self, order: int, boiler_depth: int) -> None:
        self.chars: List[str] = []
        self.link_chars = 0
        self.words = 0
        self.boiler_depth = boiler_depth
        self.order = order


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[_Block] = []
        self.media: List[Dict[str, Any]] = []  # (order, src)
        self._skip = 0
        self._link = 0
        self._boiler = 0
        self._order = 0
        self._cur: Optional[_Block] = None

    def _flush(self) -> None:
        self._cur = None

    def _block(self) -> _Block:
        if self._cur is None:
            self._cur = _Block(self._order, self._boiler)
            self._order += 1
            self.blocks.append(self._cur)
        return self._cur

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTENT:
            self._skip += 1
            return
        if tag == "img":
            src = dict(attrs).get("src") or ""
            self.media.append({"order": self._order, "src": src})
            self._order += 1
            return
        if tag == "a":
            self._link += 1
        if tag in _BOILER_TAGS:
            self._boiler += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._link = max(0, self._link - 1)
        if tag in _BOILER_TAGS:
            self._boiler = max(0, self._boiler - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        text = re.sub(r"\s+", " ", data)
        if not text.strip():
            return
        b = self._block()
        b.chars.append(text)
        n = len(text)
        b.words += len(text.split())
        if self._link:
            b.link_chars += n


def _classify(b: _Block) -> bool:
    """True if the block is main content (densitometric rules)."""
    text = "".join(b.chars).strip()
    n_chars = len(text)
    if n_chars == 0:
        return False
    link_density = b.link_chars / n_chars
    lines = max(1.0, n_chars / LINE_WIDTH)
    text_density = b.words / lines
    if link_density > MAX_LINK_DENSITY:
        return False
    if b.boiler_depth > 0:
        # nav/footer/aside text only survives with strong prose signals
        return b.words >= 30 and text_density >= MIN_TEXT_DENSITY and link_density < 0.1
    if b.words >= MIN_WORDS_SHORT:
        return True
    return text_density >= MIN_TEXT_DENSITY


def tokenize_html(data: Any) -> Dict[str, Any]:
    """HTML bytes/str → the common tokenized struct (never raises)."""
    empty = {"page_width": 0.0, "page_height": 0.0, "spans": []}
    if data is None:
        return empty
    if isinstance(data, (bytes, bytearray)):
        try:
            data = bytes(data).decode("utf-8")
        except UnicodeDecodeError:
            data = bytes(data).decode("latin-1")
    try:
        ex = _Extractor()
        ex.feed(data)
        ex.close()
    except Exception:
        return empty
    spans: List[Dict[str, Any]] = []
    for b in ex.blocks:
        if not _classify(b):
            continue
        text = "".join(b.chars).strip()
        spans.append(
            {
                "kind": "text", "text": text, "media_ref": None,
                "x0": 0.0, "y0": float(-b.order), "x1": 0.0,
                "y1": float(-b.order), "size": 0.0,
            }
        )
    for m in ex.media:
        spans.append(
            {
                "kind": "media", "text": None, "media_ref": m["src"],
                "x0": 0.0, "y0": float(-m["order"]), "x1": 0.0,
                "y1": float(-m["order"]), "size": 0.0,
            }
        )
    return {"page_width": 0.0, "page_height": 0.0, "spans": spans}


@pandas_udf(TOKENIZED_STRUCT)
def tokenize_html_udf(content: pd.Series) -> pd.DataFrame:
    rows = [tokenize_html(b) for b in content]
    return pd.DataFrame(
        {
            "page_width": [r["page_width"] for r in rows],
            "page_height": [r["page_height"] for r in rows],
            "spans": [r["spans"] for r in rows],
        }
    )
