"""Property tests: synthesized PDF → tokenizer round-trip.

Builds minimal PDFs placing known text runs at known coordinates (the same
content-stream constructs the fixtures use) and asserts the tokenizer
recovers exactly those spans in reading order. Complements the fixture
goldens with randomized coverage (SURVEY.md §5.3)."""

from __future__ import annotations

import zlib

from hypothesis import given, settings, strategies as st

from pdf_extractor_spark.tokenize_dispatch import assemble_doc, tokenize_any

WORDS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789 ", min_size=1, max_size=24
).filter(lambda s: s.strip() == s and s != "")


def pdf_from_runs(runs):
    """runs: list of (x, y, text) → minimal single-page PDF bytes."""
    ops = [b"BT /F1 10 Tf"]
    for x, y, text in runs:
        ops.append(b"1 0 0 1 %.2f %.2f Tm (%s) Tj" % (x, y, text.encode("latin-1")))
    ops.append(b"ET")
    content = zlib.compress(b"\n".join(ops))
    return (
        b"%%PDF-1.4\n"
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 9 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%%%EOF" % (len(content), content)
    )


@st.composite
def run_lists(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    ys = draw(
        st.lists(
            st.integers(min_value=40, max_value=750),
            min_size=n, max_size=n, unique=True,
        )
    )
    runs = []
    for y in ys:  # unique y per run → unambiguous reading order
        x = draw(st.integers(min_value=10, max_value=500))
        runs.append((float(x), float(y), draw(WORDS)))
    return runs


@given(run_lists())
@settings(max_examples=60, deadline=None)
def test_roundtrip_ordered(runs):
    doc = assemble_doc(tokenize_any(pdf_from_runs(runs)))
    got = [(s["x0"], s["y0"], s["text"]) for s in doc["spans"]]
    want = sorted(
        [(x, y, t) for x, y, t in runs], key=lambda r: (-round(r[1], 2), round(r[0], 2))
    )
    assert [(g[2]) for g in got] == [w[2] for w in want]
    assert [s["offset"] for s in doc["spans"]] == list(range(len(runs)))
    assert doc["full_text"] == "\n".join(w[2] for w in want)


def test_escaped_literals_and_tj_arrays():
    content = zlib.compress(
        b"BT /F1 10 Tf "
        b"1 0 0 1 50 700 Tm (par\\(en\\)s and back\\\\slash) Tj "
        b"1 0 0 1 50 650 Tm [(kerned) -250 (pair)] TJ "
        b"ET"
    )
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%%%EOF" % (len(content), content)
    )
    doc = assemble_doc(tokenize_any(pdf))
    texts = [s["text"] for s in doc["spans"]]
    assert texts[0] == "par(en)s and back\\slash"
    assert "kerned" in texts[1] and "pair" in texts[1]
