"""Independent golden-span generator for fixture-class PDFs.

Per FIXTURES.md §4, goldens are regenerated programmatically from the PDF
content streams with a *deliberately minimal, independent* parser: FlateDecode
streams, `1 0 0 1 x y Tm [( … )] TJ` upright text ops (octal-unescape,
cp1252/latin-1), `w 0 0 h x y cm /Name Do` media ops, ordered by (−y, x).
This is NOT the engine parser — it is the oracle the engine is checked
against (tests/test_tokenizer.py)."""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

_TEXT_OP = re.compile(
    rb"1 0 0 1 ([-\d.]+) ([-\d.]+) Tm\s*\[\((.*?)\)\]\s*TJ", re.S
)
_MEDIA_OP = re.compile(
    rb"([-\d.]+) 0 0 ([-\d.]+) ([-\d.]+) ([-\d.]+) cm\s*/(\w+) Do"
)
_OCTAL = re.compile(rb"\\([0-7]{1,3})")
_SIMPLE_ESC = {b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\", b"\\n": b"\n",
               b"\\r": b"\r", b"\\t": b"\t"}


def _unescape(raw: bytes) -> str:
    for k, v in _SIMPLE_ESC.items():
        raw = raw.replace(k, v.replace(b"\\", b"\x00BS\x00") if k == b"\\\\" else v)
    raw = raw.replace(b"\x00BS\x00", b"\\")
    raw = _OCTAL.sub(lambda m: bytes([int(m.group(1), 8) & 0xFF]), raw)
    try:
        return raw.decode("cp1252")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def golden_spans(pdf_bytes: bytes) -> List[Tuple[str, str, str]]:
    """Return the golden ordered span tuples (kind, text, media_ref)."""
    items: List[Tuple[float, float, str, str, str]] = []
    for m in re.finditer(rb"stream\r?\n", pdf_bytes):
        start = m.end()
        end = pdf_bytes.find(b"endstream", start)
        try:
            content = zlib.decompress(pdf_bytes[start:end])
        except zlib.error:
            continue
        if b"TJ" not in content and b"Do" not in content:
            continue
        for t in _TEXT_OP.finditer(content):
            x, y = float(t.group(1)), float(t.group(2))
            if x < 0 or y < 0:
                # rotated watermark glyphs carry off-page Tm origins in the
                # fixture class (FIXTURES.md §4 counts exclude them)
                continue
            items.append((-round(y, 2), round(x, 2), "text", _unescape(t.group(3)), None))
        for t in _MEDIA_OP.finditer(content):
            x, y = float(t.group(3)), float(t.group(4))
            items.append((-round(y, 2), round(x, 2), "media", None, t.group(5).decode()))
    items.sort(key=lambda it: (it[0], it[1]))
    return [(k, txt, ref) for _, _, k, txt, ref in items]
