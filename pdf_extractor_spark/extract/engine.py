"""Per-document extraction engine — pure Python, Spark-free.

This is the deterministic core that runs *inside* Arrow batches (one call per
document, vectorized across documents by Spark — the cross-document axis is
the DataFrame, SURVEY.md §2.3 J3). It reimplements, from scratch, the
reference's heuristic machinery with its exact geometric constants:

* anchor windows            /root/reference/extractor.py:193-304
* zone clip                 /root/reference/extractor.py:306-331
* heuristic dispatch        /root/reference/extractor.py:333-362
* anchor learning           /root/reference/extractor.py:366-422
* regex shape guessing      /root/reference/extractor.py:457-483
* heuristic derivation      /root/reference/extractor.py:485-573
* normalize / search        /root/reference/extractor.py:146-189

Coordinates: the engine works in *device space* (top-left origin, y grows
downward) exactly like the reference's PyMuPDF rects, so every constant
(±2pt, +300pt column, +20/70pt line heights …) carries over verbatim. The
tokenizer emits PDF user space (bottom-up); :func:`doc_from_spans` flips y.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pdf_extractor_spark.pdf.tokenizer import (
    _HELV_WIDTHS,
    _DEFAULT_WIDTH,
    ASCENDER,
    DESCENDER,
)

Rect = Tuple[float, float, float, float]  # x0, y0, x1, y1 (device space)


# --- text normalization (extractor.py:146-155 parity) -----------------------

_ACCENT_MAP = str.maketrans(
    "áàâãéêíóôõúçÁÀÂÃÉÊÍÓÔÕÚÇ", "aaaaeeioooucAAAAEEIOOOUC"
)
_STRIP_RE = re.compile(r"[\s_:]+")


def normalize_text(text: Optional[str]) -> str:
    if not text:
        return ""
    return _STRIP_RE.sub("", text.translate(_ACCENT_MAP).lower())


# --- regex shape guessing (extractor.py:457-483 parity) ----------------------

CPF_RE = r"\d{3}\.\d{3}\.\d{3}-\d{2}"
CNPJ_RE = r"\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}"
DATE_RE = r"\d{2}/\d{2}/\d{4}"
CEP_RE = r"\d{5}-\d{3}"
DIGITS_RE = r"\d+"
MONEY_RE = r"[\d\.,]+"


def guess_regex_for_value(value: Optional[str]) -> Optional[str]:
    if not value:
        return None
    for pat in (CPF_RE, CNPJ_RE, DATE_RE, CEP_RE, DIGITS_RE):
        if re.fullmatch(pat, value):
            return pat
    if re.fullmatch(r"R\$\s*[\d\.,]+", value) or re.fullmatch(MONEY_RE, value):
        if "." in value or "," in value:
            return MONEY_RE
    return None


# --- document model ----------------------------------------------------------


@dataclass
class Word:
    norm: str
    raw: str
    rect: Rect  # device space


@dataclass
class Doc:
    """Parsed page: word boxes + inverted index (extractor.py:114-122)."""

    words: List[Word]
    page_width: float
    page_height: float
    index: Dict[str, List[int]] = dc_field(default_factory=dict)

    def __post_init__(self) -> None:
        for i, w in enumerate(self.words):
            if w.norm:
                self.index.setdefault(w.norm, []).append(i)


def _char_width(ch: str, size: float) -> float:
    return _HELV_WIDTHS.get(ch, _DEFAULT_WIDTH) * size / 1000.0


def doc_from_spans(
    spans: Sequence[Dict[str, Any]], page_width: float, page_height: float
) -> Doc:
    """Ordered geo spans (user space) → device-space word boxes.

    Splits each text run on spaces, apportioning x by the same Helvetica
    metric the tokenizer used, so word rects are mutually consistent."""
    words: List[Word] = []
    for s in spans:
        if s.get("kind") != "text" or not s.get("text"):
            continue
        size = float(s.get("size") or 10.0)
        # tokenizer y0 = baseline, y1 = baseline + ascender; glyph box in
        # device space extends DESCENDER em below the baseline
        y0d = page_height - float(s["y1"])
        y1d = page_height - float(s["y0"]) + DESCENDER * size
        x = float(s["x0"])
        for token in s["text"].split(" "):
            w = sum(_char_width(c, size) for c in token)
            if token:
                words.append(
                    Word(normalize_text(token), token, (x, y0d, x + w, y1d))
                )
            x += w + _char_width(" ", size)
    return Doc(words, page_width, page_height)


# --- search (extractor.py:157-189 parity) ------------------------------------


def _union(a: Rect, b: Rect) -> Rect:
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def search_normalized(doc: Doc, needle: str) -> Optional[Rect]:
    """First occurrence via the inverted index; multi-word fallback scans up
    to 4 successors on (nearly) the same visual line (y-tolerance 5pt)."""
    needle_norm = normalize_text(needle)
    if not needle_norm:
        return None
    hits = doc.index.get(needle_norm)
    if hits:
        return doc.words[hits[0]].rect
    n = len(doc.words)
    for i in range(n):
        head = doc.words[i].norm
        if not head or not needle_norm.startswith(head):
            continue
        text = head
        rect = doc.words[i].rect
        for j in range(i + 1, min(i + 5, n)):
            nxt = doc.words[j]
            if nxt.rect[1] > rect[3] + 5:
                break
            text += nxt.norm
            rect = _union(rect, nxt.rect)
            if text == needle_norm:
                return rect
            if not needle_norm.startswith(text):
                break
    return None


# --- clipped text (PyMuPDF get_text(clip=...) emulation) ---------------------

_LINE_QUANT = 3.0  # pt — line grouping tolerance


def clip_text(doc: Doc, rect: Rect) -> str:
    """Text of words whose glyph box intersects ``rect`` with positive area,
    assembled as lines (top-to-bottom, then left-to-right, words joined by
    spaces) — the engine's analog of PyMuPDF ``get_text("text", clip=...)``."""
    x0, y0, x1, y1 = rect
    picked: List[Tuple[float, float, str]] = []
    for w in doc.words:
        wx0, wy0, wx1, wy1 = w.rect
        if wx0 < x1 and wx1 > x0 and wy0 < y1 and wy1 > y0:
            cy = (wy0 + wy1) / 2.0
            picked.append((cy, wx0, w.raw))
    if not picked:
        return ""
    picked.sort(key=lambda t: (t[0], t[1]))
    lines: List[List[Tuple[float, str]]] = []
    cur_y: Optional[float] = None
    for cy, x, raw in picked:
        if cur_y is None or cy - cur_y > _LINE_QUANT:
            lines.append([])
            cur_y = cy
        lines[-1].append((x, raw))
    return "\n".join(
        " ".join(raw for _, raw in sorted(line)) for line in lines
    )


# --- heuristic application (extractor.py:193-362 parity) ---------------------


def _anchor_window(
    anchor: Rect, direction: str, layout: str, multi_line: bool,
    page_w: float, page_h: float,
) -> Optional[Rect]:
    """The exact directional search windows of extractor.py:215-268."""
    ax0, ay0, ax1, ay1 = anchor
    if direction == "right":
        return (ax1 + 2, ay0 - 2, page_w - 10, ay1 + 2)
    if direction == "left":
        return (10, ay0 - 2, ax0 - 2, ay1 + 2)
    if direction == "below":
        bottom = ay1 + (70 if multi_line else 20)
        if layout == "column":
            return (ax0 - 10, ay1 + 2, ax1 + 300, bottom)
        return (5, ay1 + 2, page_w - 10, bottom)
    if direction == "above":
        top = ay0 - (70 if multi_line else 20)
        if layout == "column":
            return (ax0 - 10, top, ax1 + 300, ay0 - 2)
        return (5, top, page_w - 10, ay0 - 2)
    return None


def apply_anchor(doc: Doc, metadata: Dict[str, Any]) -> Optional[str]:
    """ANCHOR applicator (extractor.py:193-304)."""
    anchor_text = metadata.get("anchor_text")
    if not anchor_text:
        return None
    direction = metadata.get("direction", "right")
    layout = metadata.get("layout", "column")
    multi_line = _as_bool(metadata.get("multi_line", False))
    regex = metadata.get("regex")

    anchor_rect = search_normalized(doc, anchor_text)
    if anchor_rect is None:
        return None
    window = _anchor_window(
        anchor_rect, direction, layout, multi_line, doc.page_width, doc.page_height
    )
    if window is None:
        return None
    value = clip_text(doc, window)
    if not value:
        return None
    value = value.strip().replace(anchor_text, "").strip()
    if regex:
        m = re.search(regex, value, re.DOTALL)
        return m.group(0) if m else None
    lines = [l.strip() for l in value.split("\n") if l.strip()]
    if not lines:
        return None
    if multi_line:
        return "\n".join(lines)
    return lines[-1] if direction in ("above", "left") else lines[0]


def apply_zone(doc: Doc, zone: Sequence[float], regex: Optional[str]) -> Optional[str]:
    """ZONE applicator (extractor.py:306-331)."""
    if not zone or len(zone) != 4:
        return None
    value = clip_text(doc, tuple(zone)).strip()
    if not value:
        return None
    if regex:
        m = re.search(regex, value, re.DOTALL)
        return m.group(0) if m else None
    return value


def _as_bool(v: Any) -> bool:
    if isinstance(v, str):
        return v.lower() == "true"
    return bool(v)


def apply_heuristic(
    doc: Doc, htype: str, zone: Optional[Sequence[float]], metadata: Dict[str, Any]
) -> Tuple[Optional[str], bool]:
    """Dispatch (extractor.py:333-362). Returns (value, found); for
    ANCHOR_EMPTY a non-null value signals autocorrection upstream (the
    reference logs the signal but performs no KB write at this site —
    :350-352 — so neither do we; repair happens only via the fallback loop).

    Deliberate divergence: the reference's ANCHOR_EMPTY no-value branch
    returns (None, False) (:353-355), which makes its own
    ``is_confirmed_empty`` planner branch (:938-946) unreachable and sends
    every confirmed-empty field to the LLM on every document. We return
    (None, True) — the evident intent — so a present-but-empty label
    confirms NULL without an LLM round trip."""
    if htype == "ANCHOR":
        v = apply_anchor(doc, metadata)
        return (v, v is not None)
    if htype == "ZONE":
        v = apply_zone(doc, zone, metadata.get("regex"))
        return (v, v is not None)
    if htype == "ANCHOR_EMPTY":
        if not metadata.get("anchor_text"):
            return (None, False)
        v = apply_anchor(doc, metadata)
        if v:
            return (v, True)  # autocorrection signal (extractor.py:350-352)
        return (None, True)  # anchor present, value confirmed empty
    return (None, False)


# --- deterministic learning (extractor.py:366-422, 485-573) ------------------


def anchor_candidates(field_name: str, description: str) -> List[str]:
    """E1: the six candidate variants, first-seen order (set() in the
    reference is unordered; we keep deterministic order, dedup preserved)."""
    spaced = field_name.replace("_", " ")
    cands = [field_name, spaced, spaced.title(), field_name.upper(),
             description, description.upper()]
    seen, out = set(), []
    for c in cands:
        if c and c not in seen:
            seen.add(c)
            out.append(c)
    return out


def learn_from_anchor(
    doc: Doc, field_name: str, description: str
) -> Tuple[Optional[str], Optional[Dict[str, Any]], bool]:
    """U6: LLM-free anchor learning (extractor.py:366-422).

    Probes right then below for each candidate anchor; ANCHOR_EMPTY when the
    anchor exists but both windows are empty. Returns (value, kb_row, found).
    """
    for anchor in anchor_candidates(field_name, description):
        rect = search_normalized(doc, anchor)
        if rect is None:
            continue
        right = _anchor_window(rect, "right", "column", False, doc.page_width, doc.page_height)
        value = clip_text(doc, right)
        if value:
            value = value.strip().replace(anchor, "").strip()
            lines = [l.strip() for l in value.split("\n") if l.strip()]
            if lines and lines[0]:
                return (
                    "\n".join(lines),
                    _kb_row("ANCHOR", None, 0.9,
                            {"anchor_text": anchor, "direction": "right"}),
                    True,
                )
        below = (rect[0] - 10, rect[3] + 2, rect[2] + 300, rect[3] + 20)
        value = clip_text(doc, below)
        if value:
            lines = [l.strip() for l in value.strip().split("\n") if l.strip()]
            if lines:
                return (
                    "\n".join(lines),
                    _kb_row("ANCHOR", None, 0.85,
                            {"anchor_text": anchor, "direction": "below"}),
                    True,
                )
        return (
            None,
            _kb_row("ANCHOR_EMPTY", None, 0.8,
                    {"anchor_text": anchor, "direction": "right"}),
            True,
        )
    return (None, None, False)


def derive_heuristic_for_value(
    doc: Doc, field_name: str, value: str
) -> Optional[Dict[str, Any]]:
    """U7: derive an anchor/zone rule from a known value (extractor.py:485-573).

    Locates the value, probes the four neighbor windows (above/left/below/
    right with the reference's ±50/300pt boxes) for the nearest label text,
    falls back to a horizontal-slice ZONE."""
    if not value:
        return None
    clean = value.strip().replace(",", " ").replace("\n", " ")
    parts = clean.split()
    if not parts:
        return None
    regex = guess_regex_for_value(value.strip().split("\n")[0])
    rect = search_normalized(doc, " ".join(parts[:3]))
    if rect is None:
        rect = search_normalized(doc, parts[0])
        if rect is None:
            return None
    base_meta: Dict[str, Any] = {"regex": regex} if regex else {}

    probes = [
        # (window, line pick, direction stored, confidence)
        ((rect[0] - 50, max(0.0, rect[1] - 50), rect[2] + 50, rect[1] - 2),
         -1, "below", 0.9),
        ((max(0.0, rect[0] - 300), rect[1] - 5, rect[0] - 2, rect[3] + 5),
         -1, "right", 0.9),
        ((rect[0] - 50, rect[3] + 2, rect[2] + 50, rect[3] + 50),
         0, "above", 0.8),
        ((rect[2] + 2, rect[1] - 5, rect[2] + 300, rect[3] + 5),
         0, "left", 0.8),
    ]
    for window, pick, direction, conf in probes:
        text = clip_text(doc, window).strip()
        if not text:
            continue
        anchor = text.split("\n")[pick].strip().rstrip(" :")
        if len(anchor) > 3:
            meta = dict(base_meta)
            meta.update({"anchor_text": anchor, "direction": direction})
            return _kb_row("ANCHOR", None, conf, meta)

    y0 = max(0.0, rect[1] - 5)
    y1 = min(doc.page_height - 2, rect[3] + 5)
    if "\n" in value or len(clean) > 80:
        y1 = min(doc.page_height - 2, rect[3] + 70)
    zone = [5.0, y0, doc.page_width - 5.0, y1]
    return _kb_row("ZONE", zone, 0.7, base_meta)


def _kb_row(
    htype: str, zone: Optional[List[float]], confidence: float, metadata: Dict[str, Any]
) -> Dict[str, Any]:
    return {"type": htype, "zone": zone, "confidence": confidence,
            "metadata": {k: (str(v) if v is not None else None) for k, v in metadata.items()}}


# --- per-document fixed-template extraction (extractor.py:927-954) -----------


def extract_doc(
    doc: Doc,
    extraction_schema: Dict[str, str],
    kb_fields: Dict[str, Dict[str, Any]],
) -> Tuple[Dict[str, Optional[str]], List[str]]:
    """Apply each field's heuristic; collect failures for the fallback stage.

    Returns (result map with presentation-cleaned values, failed fields).
    Value cleaning: newline collapse to ', ' (extractor.py:975 contract)."""
    result: Dict[str, Optional[str]] = {}
    failed: List[str] = []
    for field_name in extraction_schema:
        heur = kb_fields.get(field_name)
        value: Optional[str] = None
        found = False
        confirmed_empty = False
        if heur is not None:
            value, found = apply_heuristic(
                doc, heur["type"], heur.get("zone"), heur.get("metadata") or {}
            )
            if found and value is None and heur["type"] == "ANCHOR_EMPTY":
                confirmed_empty = True
        if found and value is not None:
            result[field_name] = re.sub(r"\s*\n\s*", ", ", value)
        elif confirmed_empty:
            result[field_name] = None
        else:
            result[field_name] = None
            failed.append(field_name)
    return result, failed
