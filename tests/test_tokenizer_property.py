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


def test_objstm_page_dict():
    """Modern-PDF shape: catalog/pages/page dicts live inside a compressed
    /Type/ObjStm; only the content stream is a top-level object."""
    bodies = [
        (1, b"<< /Type/Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type/Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>"),
    ]
    offsets, payload = [], b""
    for num, body in bodies:
        offsets.append((num, len(payload)))
        payload += body + b"\n"
    header = b" ".join(b"%d %d" % p for p in offsets) + b"\n"
    objstm_data = header + payload
    first = len(header)
    objstm = zlib.compress(objstm_data)
    content = zlib.compress(b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (objstm works) Tj ET")
    pdf = (
        b"%%PDF-1.6\n"
        b"5 0 obj << /Type/ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >> "
        b"stream\n%s\nendstream endobj\n"
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%%%EOF"
        % (first, len(objstm), objstm, len(content), content)
    )
    doc = assemble_doc(tokenize_any(pdf))
    assert [s["text"] for s in doc["spans"]] == ["objstm works"]


def test_asciihex_content_and_td_flow():
    """ASCIIHexDecode content stream using Td/TL/T* text flow (the other
    common positioning idiom besides absolute Tm)."""
    ops = b"BT /F1 12 Tf 2 TL 72 720 Td (line one) Tj T* (line two) Tj ET"
    hexed = ops.hex().encode("ascii") + b">"
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length %d /Filter /ASCIIHexDecode >> stream\n%s\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%%%EOF" % (len(hexed), hexed)
    )
    doc = assemble_doc(tokenize_any(pdf))
    texts = [s["text"] for s in doc["spans"]]
    assert texts == ["line one", "line two"]
    # T* moved down by the 2pt leading → strictly lower y
    assert doc["spans"][0]["y0"] > doc["spans"][1]["y0"]


def test_lzw_decode_spec_vector():
    """PDF 32000-1 §7.4.4.2 worked example (values are decimal there)."""
    from pdf_extractor_spark.pdf.tokenizer import _lzw_decode

    enc = bytes([0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01])
    assert _lzw_decode(enc) == bytes([45] * 5 + [65] + [45] * 3 + [66])


def test_lzw_content_stream():
    """A content stream compressed with a real LZW encoder round-trips."""
    from pdf_extractor_spark.pdf.tokenizer import _lzw_decode

    ops = b"BT /F1 10 Tf 1 0 0 1 40 700 Tm (lzw path works) Tj ET"

    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code, width = 258, 9
        out_bits, cur = [], b""
        def emit(code):
            out_bits.append((code, width))
        emit(256)  # clear
        for b in data:
            nxt = cur + bytes([b])
            if nxt in table:
                cur = nxt
            else:
                emit(table[cur])
                table[nxt] = next_code
                next_code += 1
                if next_code + 1 >= (1 << width) and width < 12:
                    width += 1
                cur = bytes([b])
        if cur:
            emit(table[cur])
        emit(257)  # EOD
        buf = nbits = 0
        res = bytearray()
        for code, w in out_bits:
            buf = (buf << w) | code
            nbits += w
            while nbits >= 8:
                res.append((buf >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            res.append((buf << (8 - nbits)) & 0xFF)
        return bytes(res)

    enc = lzw_encode(ops)
    assert _lzw_decode(enc) == ops
    pdf = (
        b"%%PDF-1.2\n"
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length %d /Filter /LZWDecode >> stream\n%s\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%%%EOF" % (len(enc), enc)
    )
    doc = assemble_doc(tokenize_any(pdf))
    assert [s["text"] for s in doc["spans"]] == ["lzw path works"]


def pdf_from_runs_rotated(runs, rotate):
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
        b"/Rotate %d /Contents 4 0 R /Resources << /Font << /F1 9 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%%%EOF" % (rotate, len(content), content)
    )


@settings(max_examples=40, deadline=None)
@given(
    runs=st.lists(
        st.tuples(
            st.floats(10, 500), st.floats(10, 700), WORDS
        ),
        min_size=1, max_size=6,
    ),
    rotate=st.sampled_from([0, 90, 180, 270]),
)
def test_rotation_preserves_span_set_and_remaps_frame(runs, rotate):
    """Property: rotation permutes geometry but never text content; the
    rotated frame is exactly the manual remap of the unrotated spans
    ((x,y)→(y,W−x) / (W−x,H−y) / (H−y,x)) and page dims swap for 90/270."""
    from pdf_extractor_spark.pdf.tokenizer import tokenize_pdf

    base = tokenize_pdf(pdf_from_runs(runs))
    rot = tokenize_pdf(pdf_from_runs_rotated(runs, rotate))

    assert sorted(s["text"] for s in rot["spans"]) == sorted(
        s["text"] for s in base["spans"]
    )
    W, H = base["page_width"], base["page_height"]
    if rotate in (90, 270):
        assert (rot["page_width"], rot["page_height"]) == (H, W)
    else:
        assert (rot["page_width"], rot["page_height"]) == (W, H)

    def remap(s):
        x0, y0, x1, y1 = s["x0"], s["y0"], s["x1"], s["y1"]
        if rotate == 90:
            return (y0, W - x1, y1, W - x0)
        if rotate == 180:
            return (W - x1, H - y1, W - x0, H - y0)
        if rotate == 270:
            return (H - y1, x0, H - y0, x1)
        return (x0, y0, x1, y1)

    want = sorted(
        (s["text"],) + tuple(round(v, 4) for v in remap(s))
        for s in base["spans"]
    )
    got = sorted(
        (s["text"], round(s["x0"], 4), round(s["y0"], 4),
         round(s["x1"], 4), round(s["y1"], 4))
        for s in rot["spans"]
    )
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    payload=st.binary(min_size=1, max_size=400),
    columns=st.integers(1, 32),
    tag=st.sampled_from([0, 1, 2, 3, 4]),
)
def test_png_predictor_all_filters_roundtrip(payload, columns, tag):
    """Property: encoding rows with any single PNG filter then applying the
    predictor recovers the original bytes (rows padded to full width)."""
    from pdf_extractor_spark.pdf.tokenizer import _apply_predictor

    rowlen = columns
    if len(payload) % rowlen:
        payload = payload + b"\x00" * (rowlen - len(payload) % rowlen)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    enc = bytearray()
    prev = bytes(rowlen)
    for r in range(0, len(payload), rowlen):
        row = payload[r : r + rowlen]
        enc.append(tag)
        for j, v in enumerate(row):
            left = row[j - 1] if j >= 1 else 0
            up = prev[j]
            ul = prev[j - 1] if j >= 1 else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[tag]
            enc.append((v - pred) & 0xFF)
        prev = row
    assert _apply_predictor(bytes(enc), 10 + tag, columns, 1, 8) == payload


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_ascii85_roundtrips_arbitrary_bytes(data):
    """_ascii85_decode inverts the standard Adobe encoding (incl. the 'z'
    zero-group shorthand and partial final groups) for arbitrary payloads."""
    import base64

    from pdf_extractor_spark.pdf.tokenizer import _ascii85_decode

    assert _ascii85_decode(base64.a85encode(data) + b"~>") == data


def test_truncation_length_guard_boundary():
    """assemble_doc skips the whole-text split when the text is provably
    under the truncation bound (len <= 2*TRUNCATE_WORDS - 2; re.split's
    leading/trailing empty tokens counted). Sweep the boundary against the
    unguarded reference semantics."""
    import re

    from pdf_extractor_spark.assemble import TRUNCATE_SENTINEL, TRUNCATE_WORDS

    ws = re.compile(r"\s+")

    def reference(joined: str) -> str:
        words = ws.split(joined)
        if len(words) > TRUNCATE_WORDS:
            return " ".join(words[:TRUNCATE_WORDS]) + TRUNCATE_SENTINEL
        return joined

    def doc(text: str) -> dict:
        return {
            "page_width": 0.0, "page_height": 0.0,
            "spans": [{"kind": "text", "text": text, "media_ref": None,
                       "x0": 0.0, "y0": 0.0, "x1": 0.0, "y1": 0.0,
                       "size": 1.0}],
        }

    n = TRUNCATE_WORDS
    cases = ["", " ", "x", "word " * 900, " " + "a " * (n - 1) + " "]
    base = "a " * (n + 4)  # worst case: 1-char words, maximal token yield
    for length in range(2 * n - 6, 2 * n + 6):
        cases.append((" " + base)[:length])
        cases.append(base[:length])
    for text in cases:
        assert assemble_doc(doc(text))["full_text"] == reference(text)


# Byte soup biased toward the constructs the header scan dispatches on:
# digit runs, whitespace, 'obj'/'endobj' fragments, stream markers.
_SOUP_CHUNKS = st.sampled_from(
    [b"obj", b"endobj", b" obj", b"1 2 obj", b"stream", b"12", b"345",
     b" ", b"\n", b"\r\n", b"<<", b">>", b"/Length", b"0" * 40, b"9 " * 20,
     b"objX", b"xobj", b"7\t8 obj", b"obj\n"]
)


@given(st.lists(st.binary(max_size=12) | _SOUP_CHUNKS, max_size=40))
@settings(max_examples=300, deadline=None)
def test_obj_header_scan_equals_forward_regex(chunks):
    """The anchored ``obj``-first header scan (the hot-path replacement for
    a forward ``(\\d+)\\s+(\\d+)\\s+obj`` sweep) must yield the identical
    (obj_num, header_end) sequence as the forward regex on arbitrary byte
    soup — including digit runs longer than the backward window, headers at
    offset 0, and 'obj' inside 'endobj'/'xobject' tokens."""
    import re

    from pdf_extractor_spark.pdf.tokenizer import _iter_obj_headers

    data = b"".join(chunks)
    forward = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
    expect = [(int(m.group(1)), m.end()) for m in forward.finditer(data)]
    assert list(_iter_obj_headers(data)) == expect


def test_obj_header_scan_long_prefixes():
    """Regression (r4 review): headers whose number+whitespace prefix
    exceeded the old 32-byte backward window were silently dropped even
    though the forward regex accepts them — the backward scan must walk
    the runs to their real start, whatever their length."""
    import re

    from pdf_extractor_spark.pdf.tokenizer import _iter_obj_headers

    forward = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
    shapes = [
        b"12 0" + b" " * 30 + b"obj<<>>endobj",          # long ws before 'obj'
        b"7 " + b"9" * 31 + b" obj<<>>endobj",           # long generation run
        b"5" + b" " * 40 + b"0 obj<<>>endobj",           # long ws between nums
        b"1" * 80 + b" " + b"2" * 80 + b" " * 80 + b"obj x",
        b"junk 3 0 obj<<>>endobj " + b"4" * 50 + b"\t\n 0 obj<<>>",
        b" " * 64 + b"obj",                              # ws run, no numbers
        b"obj",                                          # anchor at offset 0
        b"0 obj",                                        # only one number
    ]
    for data in shapes:
        expect = [(int(m.group(1)), m.end()) for m in forward.finditer(data)]
        assert list(_iter_obj_headers(data)) == expect, data[:40]


@given(st.text(max_size=64), st.floats(min_value=0.5, max_value=72, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_text_width_ascii_fast_path_matches_charmap(text, size):
    """The r4 isascii() fast path in _text_width must be value-identical to
    the cp1252 charmap reference on every input (ASCII bytes index the
    width table identically under either codec)."""
    from pdf_extractor_spark.pdf.tokenizer import _W_TABLE, _text_width

    ref = sum(map(_W_TABLE.__getitem__, text.encode("cp1252", "replace")))
    ref = ref * size / 1000.0
    assert _text_width(text, size) == ref


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_bytes_to_text_ascii_fast_path_matches_cp1252(b):
    """The r4 isascii() latin-1 fast path in _bytes_to_text must decode
    byte-identically to the cp1252 reference path (the two codecs agree
    below 0x80; above, the slow path still runs)."""
    from pdf_extractor_spark.pdf.tokenizer import _bytes_to_text

    try:
        ref = b.decode("cp1252")
    except UnicodeDecodeError:
        ref = b.decode("latin-1")
    assert _bytes_to_text(b) == ref


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_sink_word_count_arithmetic_matches_split(data):
    """The r4 arithmetic word count in the densitometric sink must equal
    len(text.split()) after the sink's own whitespace normalization, for
    any data chunk including Unicode whitespace (NBSP from &nbsp;, U+2009,
    NEL) — _WS_ODD routes all of those to the collapse branch."""
    from pdf_extractor_spark.html.boilerplate import _WS_ODD, _WS_RUN

    text = data if _WS_ODD.search(data) is None else _WS_RUN.sub(" ", data)
    if not text or text == " ":
        assert len(text.split()) == 0
        return
    w = text.count(" ") + 1
    if text[0] == " ":
        w -= 1
    if text[-1] == " ":
        w -= 1
    assert w == len(text.split()), repr(text)


# --- Identity-H text-shape gate (VERDICT r4 task #7) ------------------------


@given(
    st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=24)
)
@settings(max_examples=500, deadline=None)
def test_identity_h_gate_soundness(cids):
    """Typed-contract soundness for the Identity-H best-effort decode: for
    ANY CID run, the result is either the typed unparsed marker, empty, or
    a string that genuinely satisfies the documented text-shape gate (all
    printable ASCII, len>=4, letters>=2/3, vowel present). I.e. nothing
    reaches the text layer without passing the gate — the only leak class
    is a run that legitimately reads as text under the chars-as-codes
    hypothesis."""
    from pdf_extractor_spark.pdf.tokenizer import (
        IdentityCIDEncoding, _UnparsedText,
    )

    raw = b"".join(c.to_bytes(2, "big") for c in cids)
    out = IdentityCIDEncoding().decode(raw)
    if isinstance(out, _UnparsedText) or out == "":
        return
    assert len(out) >= 4
    assert all(0x20 <= ord(ch) <= 0x7E for ch in out)
    letters = sum(1 for ch in out if ch.isalpha() or ch == " ")
    assert letters * 3 >= len(out) * 2
    assert any(ch in "aeiouAEIOU" for ch in out)


def test_identity_h_gate_false_positive_rate_pinned():
    """Monte-Carlo pin of the documented false-positive: usage-order glyph
    ids drawn uniformly from a realistic subset-font id space (1..280 — a
    ~280-glyph subset, most ids landing in printable 0x20-0x7E) rarely
    read as text. Deterministic seed; if a future gate edit loosens the
    heuristic, this rate jumps and the test fails."""
    import random

    from pdf_extractor_spark.pdf.tokenizer import (
        IdentityCIDEncoding, _UnparsedText,
    )

    rng = random.Random(0xC1D)
    enc = IdentityCIDEncoding()
    leaked = 0
    trials = 20_000
    for _ in range(trials):
        n = rng.randint(4, 20)
        raw = b"".join(
            rng.randint(1, 280).to_bytes(2, "big") for _ in range(n)
        )
        out = enc.decode(raw)
        if not isinstance(out, _UnparsedText) and out:
            leaked += 1
    # measured 2026-08: 6/20000 = 0.03% of uniform-random runs pass the
    # gate (the all-letters-with-a-vowel corner). Pin with ~10x headroom:
    # > 0.5% means the gate was materially loosened.
    assert leaked / trials < 0.005, leaked


# --- crawl-robustness fuzz: never raise on arbitrary bytes ------------------


@given(st.binary(max_size=2048))
@settings(max_examples=400, deadline=None)
def test_tokenize_pdf_never_raises_on_arbitrary_bytes(data):
    """A crawl corpus contains truncated, corrupted and mislabeled files;
    the kernel's contract is 'never raises — unparseable yields an empty
    span list (or the typed encrypted fallback)'. Pure-random bytes, with
    and without the %PDF magic prepended, must always return the dict
    shape."""
    from pdf_extractor_spark.pdf.tokenizer import tokenize_pdf

    for blob in (data, b"%PDF-1.4\n" + data):
        out = tokenize_pdf(blob)
        assert set(out) >= {"page_width", "page_height", "spans"}
        assert isinstance(out["spans"], list)


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_tokenize_any_never_raises_and_assembles(data):
    """The dispatcher + assembly stage under the same fuzz: any bytes
    (PDF-magic, HTML-ish, or garbage) must tokenize and assemble into the
    public span schema without raising."""
    from pdf_extractor_spark.tokenize_dispatch import assemble_doc, tokenize_any

    for blob in (data, b"%PDF" + data, b"<html><body>" + data):
        doc = assemble_doc(tokenize_any(blob))
        assert isinstance(doc["spans"], list)
        for s in doc["spans"]:
            assert s["kind"] in ("text", "media", "unparsed")
