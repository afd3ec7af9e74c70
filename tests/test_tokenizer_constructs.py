"""Coverage tests for general-PDF constructs beyond the fixture class:
Tc/Tw/Tz spacing, page /Rotate, the three /Contents forms, multi-byte CID
hex-string guards, and Flate/LZW /Predictor post-filters.

Each test builds a minimal valid PDF exercising exactly one construct —
no external data, all bytes synthesized inline."""

from __future__ import annotations

import zlib

import pytest

from pdf_extractor_spark.pdf.tokenizer import (
    _apply_predictor, _decode_hex_string, _lzw_decode, tokenize_pdf,
)


def _pdf(content_ops: bytes, extra_objs: list[bytes] | None = None,
         page_extra: bytes = b"", contents_val: bytes = b"4 0 R",
         compress: bool = True, filter_entry: bytes = b"/Filter /FlateDecode") -> bytes:
    stream = zlib.compress(content_ops) if compress else content_ops
    objs = [
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents " + contents_val + b" " + page_extra +
        b" /Resources << /Font << /F1 9 0 R >> >> >> endobj",
        b"4 0 obj << /Length %d %s >> stream\n%s\nendstream endobj"
        % (len(stream), filter_entry, stream),
    ] + (extra_objs or [])
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


BASIC = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (hello) Tj ET"


def _texts(result):
    return [(s["text"], round(s["x0"], 1), round(s["y0"], 1))
            for s in result["spans"] if s["kind"] == "text"]


# --- Tc / Tw / Tz -----------------------------------------------------------


def test_tz_scales_width():
    plain = tokenize_pdf(_pdf(BASIC))["spans"][0]
    scaled = tokenize_pdf(_pdf(
        b"BT /F1 10 Tf 200 Tz 1 0 0 1 50 700 Tm (hello) Tj ET"))["spans"][0]
    assert scaled["x1"] - scaled["x0"] == pytest.approx(
        2.0 * (plain["x1"] - plain["x0"]))


def test_tc_adds_char_spacing():
    plain = tokenize_pdf(_pdf(BASIC))["spans"][0]
    spaced = tokenize_pdf(_pdf(
        b"BT /F1 10 Tf 3 Tc 1 0 0 1 50 700 Tm (hello) Tj ET"))["spans"][0]
    assert spaced["x1"] - spaced["x0"] == pytest.approx(
        (plain["x1"] - plain["x0"]) + 3.0 * 5)


def test_tw_adds_word_spacing():
    two = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (a b) Tj ET"
    plain = tokenize_pdf(_pdf(two))["spans"][0]
    spaced = tokenize_pdf(_pdf(
        b"BT /F1 10 Tf 7 Tw 1 0 0 1 50 700 Tm (a b) Tj ET"))["spans"][0]
    assert spaced["x1"] - spaced["x0"] == pytest.approx(
        (plain["x1"] - plain["x0"]) + 7.0)


def test_quote_op_sets_tw_tc():
    # aw ac (str) " — sets word+char spacing, then shows
    plain = tokenize_pdf(_pdf(b'BT /F1 10 Tf 14 TL 1 0 0 1 50 700 Tm (a b) \' ET'))
    quoted = tokenize_pdf(_pdf(b'BT /F1 10 Tf 14 TL 1 0 0 1 50 700 Tm 5 2 (a b) " ET'))
    w_plain = plain["spans"][0]["x1"] - plain["spans"][0]["x0"]
    w_quoted = quoted["spans"][0]["x1"] - quoted["spans"][0]["x0"]
    assert w_quoted == pytest.approx(w_plain + 5.0 + 2.0 * 3)


# --- /Rotate ----------------------------------------------------------------


def test_rotate_90_remaps_frame_and_order():
    # clockwise rotation sends the LEFT edge to the top: "left" (x=100)
    # must sort above "right" (x=500) in the rotated frame
    ops = (b"BT /F1 10 Tf "
           b"1 0 0 1 500 100 Tm (right) Tj "
           b"1 0 0 1 100 100 Tm (left) Tj ET")
    res = tokenize_pdf(_pdf(ops, page_extra=b"/Rotate 90"))
    assert (res["page_width"], res["page_height"]) == (792.0, 612.0)
    spans = sorted(res["spans"], key=lambda s: (-s["y0"], s["x0"]))
    assert [s["text"] for s in spans] == ["left", "right"]
    # (x, y) → (y, W − x): both spans keep x' = y = 100
    assert spans[0]["x0"] == pytest.approx(100.0)
    assert spans[1]["x0"] == pytest.approx(100.0)


def test_rotate_180_remaps():
    res = tokenize_pdf(_pdf(BASIC, page_extra=b"/Rotate 180"))
    assert (res["page_width"], res["page_height"]) == (612.0, 792.0)
    s = res["spans"][0]
    assert s["y0"] == pytest.approx(792 - 700 - 0.8 * 10)  # ph − y1(user)
    assert s["x1"] == pytest.approx(612 - 50)


def test_rotate_270_remaps():
    res = tokenize_pdf(_pdf(BASIC, page_extra=b"/Rotate 270"))
    assert (res["page_width"], res["page_height"]) == (792.0, 612.0)
    s = res["spans"][0]
    # (x, y) → (H − y, x)
    assert s["x1"] == pytest.approx(792 - 700)
    assert s["y0"] == pytest.approx(50.0)


def test_rotate_0_unchanged():
    r0 = tokenize_pdf(_pdf(BASIC))
    r360 = tokenize_pdf(_pdf(BASIC, page_extra=b"/Rotate 360"))
    assert _texts(r0) == _texts(r360)


# --- /Contents forms --------------------------------------------------------


def _stream_obj(num: int, ops: bytes) -> bytes:
    s = zlib.compress(ops)
    return b"%d 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj" % (
        num, len(s), s)


def test_contents_inline_array_in_order():
    o5 = _stream_obj(5, b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (one) Tj ET")
    o6 = _stream_obj(6, b"BT /F1 10 Tf 1 0 0 1 50 600 Tm (two) Tj ET")
    pdf = _pdf(b"", extra_objs=[o5, o6], contents_val=b"[ 5 0 R 6 0 R ]")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["one", "two"]


def test_contents_array_with_odd_whitespace():
    o5 = _stream_obj(5, b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (ws) Tj ET")
    pdf = _pdf(b"", extra_objs=[o5], contents_val=b"\n\t [\r\n5 0 R\n]")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["ws"]


def test_contents_ref_to_array_object():
    o5 = _stream_obj(5, b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (via) Tj ET")
    o6 = _stream_obj(6, b"BT /F1 10 Tf 1 0 0 1 50 600 Tm (refarr) Tj ET")
    arr = b"7 0 obj [ 5 0 R 6 0 R ] endobj"
    pdf = _pdf(b"", extra_objs=[o5, o6, arr], contents_val=b"7 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["via", "refarr"]


# --- hex strings / CID guard ------------------------------------------------


def test_hex_string_single_byte_winansi():
    # <68656C6C6F> = 'hello' in single-byte codes
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <68656C6C6F> Tj ET"
    assert [t for t, _, _ in _texts(tokenize_pdf(_pdf(ops)))] == ["hello"]


def test_hex_string_utf16_bom():
    # FEFF + UTF-16BE 'hi'
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <FEFF00680069> Tj ET"
    assert [t for t, _, _ in _texts(tokenize_pdf(_pdf(ops)))] == ["hi"]


def test_hex_string_cid_glyph_indexes_suppressed():
    # 2-byte CID glyph indexes (<0041 0042 ...> style runs) decode to
    # control-byte-ridden cp1252 garbage — the guard must emit NO text
    # rather than mojibake
    assert _decode_hex_string(b"\x00\x41\x00\x42\x00\x43") == ""
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <000100020003> Tj ET"
    assert _texts(tokenize_pdf(_pdf(ops))) == []


# --- predictors -------------------------------------------------------------


def _png_up_encode(data: bytes, rowlen: int) -> bytes:
    """PNG Up (tag 2) filter encoder for test input."""
    out = bytearray()
    prev = bytes(rowlen)
    for r in range(0, len(data), rowlen):
        row = data[r : r + rowlen]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def test_png_predictor_roundtrip():
    payload = bytes(range(48)) * 2
    enc = _png_up_encode(payload, 12)
    assert _apply_predictor(enc, 12, 12, 1, 8) == payload


def test_tiff_predictor_roundtrip():
    payload = b"ABCDABCDABCD"
    # TIFF pred 2: encode = horizontal difference
    enc = bytearray(payload)
    for i in range(len(enc) - 1, 0, -1):
        enc[i] = (enc[i] - enc[i - 1]) & 0xFF
    assert _apply_predictor(bytes(enc), 2, len(payload), 1, 8) == payload


def test_flate_with_png_predictor_content_stream():
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (pred) Tj ET"
    rowlen = 10
    padded = ops + b" " * ((rowlen - len(ops) % rowlen) % rowlen)
    enc = zlib.compress(_png_up_encode(padded, rowlen))
    pdf = _pdf(
        enc, compress=False,
        filter_entry=b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 10 >>",
    )
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["pred"]


def test_lzw_with_predictor_no_longer_skipped():
    # minimal LZW stream: encode via known-good encoder-in-test
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code, width = 258, 9
        out, buf, nbits = bytearray(), 0, 0

        def put(code: int):
            nonlocal buf, nbits
            buf = (buf << width) | code
            nbits += width
            while nbits >= 8:
                out.append((buf >> (nbits - 8)) & 0xFF)
                nbits -= 8

        put(256)
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                put(table[w])
                table[wc] = next_code
                next_code += 1
                if next_code + 1 > (1 << width) and width < 12:
                    width += 1
                w = bytes([ch])
        if w:
            put(table[w])
        put(257)
        if nbits:
            out.append((buf << (8 - nbits)) & 0xFF)
        return bytes(out)

    payload = b"ABCDABCDABCD"
    enc = bytearray(payload)
    for i in range(len(enc) - 1, 0, -1):
        enc[i] = (enc[i] - enc[i - 1]) & 0xFF
    stream = lzw_encode(bytes(enc))
    assert _lzw_decode(stream) == bytes(enc)
    # through _decode_stream with /Predictor 2
    from pdf_extractor_spark.pdf.tokenizer import _decode_stream

    d = b"<< /Filter /LZWDecode /DecodeParms << /Predictor 2 /Columns %d >> >>" % len(payload)
    assert _decode_stream(d, stream) == payload


# --- font /Differences encodings -------------------------------------------


def _pdf_with_font(content_ops: bytes, font_objs: list[bytes],
                   font_res: bytes) -> bytes:
    import zlib as _z
    stream = _z.compress(content_ops)
    objs = [
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << " + font_res + b" >> >> >> endobj",
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj"
        % (len(stream), stream),
    ] + font_objs
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def test_differences_inline_encoding():
    # map byte 65 ('A') -> eacute, 66 -> ccedilla; byte 97 untouched
    font = (b"10 0 obj << /Type/Font /Subtype/Type1 /BaseFont/Helvetica "
            b"/Encoding << /Differences [ 65 /eacute /ccedilla ] >> >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (ABa) Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["éça"]


def test_differences_encoding_via_ref_object():
    enc = (b"11 0 obj << /Type/Encoding "
           b"/Differences [ 97 /atilde 111 /otilde ] >> endobj")
    font = (b"10 0 obj << /Type/Font /Subtype/Type1 /BaseFont/Helvetica "
            b"/Encoding 11 0 R >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (nao) Tj ET"
    pdf = _pdf_with_font(ops, [font, enc], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["nãõ"]


def test_differences_only_applies_to_its_font():
    # F2 has Differences, F1 does not — switching fonts switches decoding
    font1 = b"10 0 obj << /Type/Font /Subtype/Type1 /BaseFont/Helvetica >> endobj"
    font2 = (b"12 0 obj << /Type/Font /Subtype/Type1 /BaseFont/Helvetica "
             b"/Encoding << /Differences [ 65 /eacute ] >> >> endobj")
    ops = (b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (A) Tj "
           b"/F2 10 Tf 1 0 0 1 50 650 Tm (A) Tj ET")
    pdf = _pdf_with_font(ops, [font1, font2], b"/F1 10 0 R /F2 12 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["A", "é"]


def test_differences_glyph_name_forms():
    from pdf_extractor_spark.pdf.tokenizer import _glyph_to_char

    assert _glyph_to_char("a") == "a"
    assert _glyph_to_char("eacute") == "é"
    assert _glyph_to_char("ccedilla") == "ç"
    assert _glyph_to_char("Atilde") == "Ã"
    assert _glyph_to_char("uni0041") == "A"
    assert _glyph_to_char("seven") == "7"
    assert _glyph_to_char("nonexistentglyph") is None


# --- inline images (BI/ID/EI) -----------------------------------------------


def test_inline_image_binary_skipped():
    """The inline image's binary payload (parens, operator-shaped bytes)
    must not leak junk text spans; surrounding text survives."""
    payload = bytes(range(256)) + b"(fake) Tj BT junk"
    ops = (b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (before) Tj ET\n"
           b"BI /W 4 /H 4 /BPC 8 /CS /RGB ID " + payload + b" EI\n"
           b"BT /F1 10 Tf 1 0 0 1 50 600 Tm (after) Tj ET")
    got = [t for t, _, _ in _texts(tokenize_pdf(_pdf(ops)))]
    assert got == ["before", "after"]


def test_inline_image_payload_containing_EI_bytes():
    # 'WEIRD' contains the letters EI without delimiters — must not
    # terminate the segment early
    ops = (b"BI /W 1 /H 1 ID WEIRDxx\x00\x01 EI\n"
           b"BT /F1 10 Tf 1 0 0 1 50 600 Tm (ok) Tj ET")
    assert [t for t, _, _ in _texts(tokenize_pdf(_pdf(ops)))] == ["ok"]


# --- Form XObjects ----------------------------------------------------------


def _form_obj(num: int, ops: bytes, matrix: bytes = b"") -> bytes:
    s = zlib.compress(ops)
    mat = b"/Matrix " + matrix + b" " if matrix else b""
    return (b"%d 0 obj << /Type/XObject /Subtype/Form %s/BBox [0 0 612 792] "
            b"/Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj"
            % (num, mat, len(s), s))


def _pdf_with_form(page_ops: bytes, form_objs: list[bytes], xobj_res: bytes) -> bytes:
    stream = zlib.compress(page_ops)
    objs = [
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 9 0 R >> "
        b"/XObject << " + xobj_res + b" >> >> >> endobj",
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj"
        % (len(stream), stream),
    ] + form_objs
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def test_form_xobject_content_extracted():
    form = _form_obj(10, b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (inform) Tj ET")
    pdf = _pdf_with_form(b"/Frm Do", [form], b"/Frm 10 0 R")
    got = _texts(tokenize_pdf(pdf))
    assert [t for t, _, _ in got] == ["inform"]
    assert got[0][1:] == (50.0, 700.0)


def test_form_xobject_positioned_by_invoker_ctm_and_matrix():
    # invoker translates by (100, 50); the form's /Matrix adds (10, 5)
    form = _form_obj(10, b"BT /F1 10 Tf 1 0 0 1 0 0 Tm (at) Tj ET",
                     matrix=b"[1 0 0 1 10 5]")
    pdf = _pdf_with_form(b"q 1 0 0 1 100 50 cm /Frm Do Q", [form],
                         b"/Frm 10 0 R")
    got = _texts(tokenize_pdf(pdf))
    assert [t for t, _, _ in got] == ["at"]
    assert got[0][1:] == (110.0, 55.0)


def test_form_xobject_nested_and_capped():
    # F1 draws text and invokes F2; F2 draws more text; a self-recursive
    # form must not loop forever (depth cap)
    f2 = _form_obj(11, b"BT /F1 10 Tf 1 0 0 1 50 600 Tm (inner) Tj ET")
    f1 = _form_obj(
        10, b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (outer) Tj ET /F2 Do")
    selfrec = _form_obj(12, b"BT /F1 10 Tf 1 0 0 1 50 500 Tm (rec) Tj ET /R Do")
    pdf = _pdf_with_form(b"/FA Do /R Do", [f1, f2, selfrec],
                         b"/FA 10 0 R /F2 11 0 R /R 12 0 R")
    got = sorted(t for t, _, _ in _texts(tokenize_pdf(pdf)))
    assert "outer" in got and "inner" in got
    assert got.count("rec") == 4  # depth cap: executions at depth 1..4


def test_literal_string_utf16_bom():
    # UTF-16BE with BOM inside a LITERAL string (§7.9.2.2): \376\377 = FEFF
    ops = (b"BT /F1 10 Tf 1 0 0 1 50 700 Tm "
           b"(\\376\\377\x00h\x00i) Tj ET")
    assert [t for t, _, _ in _texts(tokenize_pdf(_pdf(ops)))] == ["hi"]


# --- Type0/CID fonts with /ToUnicode CMaps ----------------------------------


def _tounicode_obj(num: int, cmap_body: bytes) -> bytes:
    stream = zlib.compress(cmap_body)
    return (b"%d 0 obj << /Length %d /Filter /FlateDecode >> stream\n"
            % (num, len(stream)) + stream + b"\nendstream endobj")


_CMAP_HELLO = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
3 beginbfchar
<0003> <0048>
<0004> <0065>
<0007> <006F>
endbfchar
1 beginbfrange
<0005> <0006> <006C>
endbfrange
endcmap end end"""


def test_type0_tounicode_hex_string_decodes():
    # subset font: CIDs 3,4,5,5,7 -> H e l l o via bfchar + bfrange
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/AAAAAA+Subset "
            b"/Encoding/Identity-H /ToUnicode 11 0 R >> endobj")
    cmap = _tounicode_obj(11, _CMAP_HELLO)
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <00030004000500050007> Tj ET"
    pdf = _pdf_with_font(ops, [font, cmap], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["Hello"]


def test_type0_tounicode_bfrange_array_form():
    cmap_body = (b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
                 b"1 beginbfrange\n<0001> <0003> [<0041> <0062> <0063>]\n"
                 b"endbfrange")
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/BBBBBB+Subset "
            b"/Encoding/Identity-H /ToUnicode 11 0 R >> endobj")
    cmap = _tounicode_obj(11, cmap_body)
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <000100020003> Tj ET"
    pdf = _pdf_with_font(ops, [font, cmap], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["Abc"]


def test_type0_tounicode_multichar_dst_and_tj_array():
    # one CID expanding to a multi-char string (ligature), mixed into a TJ
    # array with kern numbers
    cmap_body = (b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
                 b"2 beginbfchar\n<0001> <00660069>\n<0002> <0078>\n"
                 b"endbfchar")
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/CCCCCC+Sub "
            b"/Encoding/Identity-H /ToUnicode 11 0 R >> endobj")
    cmap = _tounicode_obj(11, cmap_body)
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm [<0001> -20 <0002>] TJ ET"
    pdf = _pdf_with_font(ops, [font, cmap], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["fix"]


def test_type0_unmapped_cid_suppressed_not_mojibake():
    # codes outside the CMap produce nothing; mapped codes still decode
    cmap_body = (b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
                 b"1 beginbfchar\n<0001> <0059>\nendbfchar")
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/DDDDDD+Sub "
            b"/Encoding/Identity-H /ToUnicode 11 0 R >> endobj")
    cmap = _tounicode_obj(11, cmap_body)
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <000100FF0001> Tj ET"
    pdf = _pdf_with_font(ops, [font, cmap], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["YY"]


def test_cid_font_without_tounicode_emits_typed_unparsed_span():
    # no ToUnicode, glyph-index CIDs (not ASCII): the run must surface as a
    # clearly-typed kind='unparsed' span at its position — never mojibake
    # in the text layer, and no longer silent suppression
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/EEEEEE+Sub "
            b"/Encoding/Identity-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <00030004000500050007> Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    result = tokenize_pdf(pdf)
    assert _texts(result) == []
    unparsed = [s for s in result["spans"] if s["kind"] == "unparsed"]
    assert len(unparsed) == 1
    assert unparsed[0]["text"] == ""
    assert (round(unparsed[0]["x0"], 1), round(unparsed[0]["y0"], 1)) == (50.0, 700.0)


def test_identity_h_short_printable_garbage_stays_unparsed():
    # usage-order glyph ids that happen to land in printable ASCII must NOT
    # leak into the text layer: '(AV' (0x28 0x41 0x56) fails the text-shape
    # gate (too short, letters < 2/3) and emits a typed unparsed span
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/GGGGGG+Sub "
            b"/Encoding/Identity-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <002800410056> Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    result = tokenize_pdf(pdf)
    assert _texts(result) == []
    assert [s["kind"] for s in result["spans"]] == ["unparsed"]


def test_identity_h_ascii_cids_decode_without_tounicode():
    # generators that subset trivially keep char codes as glyph ids: every
    # CID in printable ASCII → best-effort direct decode
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/FFFFFF+Sub "
            b"/Encoding/Identity-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <00480065006C006C006F> Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["Hello"]


# --- predefined (named) CMaps -----------------------------------------------


def test_predefined_ucs2_cmap_decodes_unicode():
    # UniGB-UCS2-H: character codes ARE UCS-2 — <4F60 597D> is 你好.
    # No /ToUnicode needed; previously the control-byte guard suppressed it.
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/STSong-Light "
            b"/Encoding/UniGB-UCS2-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <4F60597D> Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["你好"]


def test_predefined_utf16_cmap_decodes_surrogate_pair():
    # UniJIS-UTF16-H: codes are UTF-16BE, incl. surrogate pairs —
    # <D842DFB7> is U+20BB7 (𠮷)
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/KozMinPr6N "
            b"/Encoding/UniJIS-UTF16-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <D842DFB7> Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["\U00020bb7"]


def test_predefined_ucs2_cmap_literal_string_form():
    # the same UCS-2 codes can arrive in a literal string, not only hex
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/STSong-Light "
            b"/Encoding/UniGB-UCS2-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (\x4f\x60\x59\x7d) Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["你好"]


def test_predefined_nonunicode_cmap_degrades_to_typed_unparsed():
    # GBK-EUC-H: code→CID needs Adobe-GB1 tables we don't ship → the run
    # must surface as a typed kind='unparsed' span (position preserved,
    # no mojibake), never silent suppression
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/STSong-Light "
            b"/Encoding/GBK-EUC-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <C4E3BAC3> Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    result = tokenize_pdf(pdf)
    assert _texts(result) == []
    unparsed = [s for s in result["spans"] if s["kind"] == "unparsed"]
    assert len(unparsed) == 1
    assert unparsed[0]["text"] == ""
    assert (round(unparsed[0]["x0"], 1), round(unparsed[0]["y0"], 1)) == (50.0, 700.0)


def test_predefined_cmap_tounicode_still_wins():
    # a /ToUnicode stream beats the predefined-CMap fallback when present
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/STSong-Light "
            b"/Encoding/GBK-EUC-H /ToUnicode 11 0 R >> endobj")
    cmap = _tounicode_obj(11, _CMAP_HELLO)
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <00030004000500050007> Tj ET"
    pdf = _pdf_with_font(ops, [font, cmap], b"/F1 10 0 R")
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["Hello"]


# --- encrypted documents ----------------------------------------------------


def _encrypted_pdf() -> bytes:
    # structure plaintext, content stream "ciphertext" (here: junk bytes a
    # Flate decode rejects — exactly what RC4/AES output looks like to the
    # decoder), /Encrypt ref in the trailer
    junk = b"\x93\x7f\x02\xe1\xab\x55" * 10
    objs = [
        b"1 0 obj << /Type/Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type/Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type/Page /Parent 2 0 R /MediaBox [0 0 595 842] "
        b"/Contents 4 0 R >> endobj",
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj"
        % (len(junk), junk),
        b"5 0 obj << /Filter/Standard /V 2 /R 3 /O (x) /U (y) /P -44 >> endobj",
    ]
    return (b"%PDF-1.4\n" + b"\n".join(objs)
            + b"\ntrailer << /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF")


def test_encrypted_pdf_emits_typed_doc_level_fallback():
    # /Encrypt present: strings+streams are ciphertext. The doc must come
    # back flagged with ONE page-covering kind='unparsed' span — not as a
    # silently empty page (the pre-r5 behavior: stream decode fails, zero
    # spans, indistinguishable from blank)
    result = tokenize_pdf(_encrypted_pdf())
    assert result.get("encrypted") is True
    assert (result["page_width"], result["page_height"]) == (595.0, 842.0)
    assert [s["kind"] for s in result["spans"]] == ["unparsed"]
    span = result["spans"][0]
    assert span["text"] == "" and span["media_ref"] is None
    assert (span["x0"], span["y0"], span["x1"], span["y1"]) == (0.0, 0.0, 595.0, 842.0)


def test_unencrypted_pdf_not_flagged():
    result = tokenize_pdf(_pdf(BASIC))
    assert "encrypted" not in result
    assert [t for t, _, _ in _texts(result)] == ["hello"]


# --- ASCII85 filter ---------------------------------------------------------


def test_ascii85_content_stream():
    import base64

    ops = BASIC
    stream = base64.a85encode(ops) + b"~>"
    pdf = _pdf(ops, compress=False, filter_entry=b"/Filter /ASCII85Decode")
    # _pdf embeds raw ops; rebuild with the encoded stream instead
    pdf = pdf.replace(
        b"<< /Length %d /Filter /ASCII85Decode >> stream\n%s\nendstream"
        % (len(ops), ops),
        b"<< /Length %d /Filter /ASCII85Decode >> stream\n%s\nendstream"
        % (len(stream), stream),
    )
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["hello"]


def test_ascii85_flate_filter_chain():
    import base64

    ops = BASIC
    stream = base64.a85encode(zlib.compress(ops)) + b"~>"
    pdf = _pdf(ops, compress=False,
               filter_entry=b"/Filter [/ASCII85Decode /FlateDecode]")
    pdf = pdf.replace(
        b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >> stream\n%s\nendstream"
        % (len(ops), ops),
        b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >> stream\n%s\nendstream"
        % (len(stream), stream),
    )
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["hello"]


def test_ascii85_decoder_edges():
    import base64

    from pdf_extractor_spark.pdf.tokenizer import _ascii85_decode

    # z shorthand, partial final group, whitespace, <~ prefix, ~> suffix
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    payload = b"\x00\x00\x00\x00ab\xffxyz!"
    enc = base64.a85encode(payload)
    assert _ascii85_decode(b"<~ " + enc + b" ~>") == payload
    for n in range(1, 40):
        p = bytes(range(n))
        assert _ascii85_decode(base64.a85encode(p) + b"~>") == p
    assert _ascii85_decode(b"\x80bad~>") is None


def _rle_encode(data: bytes) -> bytes:
    """Straightforward §7.4.5 encoder (literal runs + repeats) for tests."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run of equal bytes
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        j = i
        while (j + 1 < n and data[j + 1] != data[j] and j - i < 126) or j == i:
            j += 1
            if j >= n:
                break
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)
    return bytes(out)


def test_runlength_content_stream():
    ops = BASIC
    stream = _rle_encode(ops)
    pdf = _pdf(ops, compress=False, filter_entry=b"/Filter /RunLengthDecode")
    pdf = pdf.replace(
        b"<< /Length %d /Filter /RunLengthDecode >> stream\n%s\nendstream"
        % (len(ops), ops),
        b"<< /Length %d /Filter /RunLengthDecode >> stream\n%s\nendstream"
        % (len(stream), stream),
    )
    assert [t for t, _, _ in _texts(tokenize_pdf(pdf))] == ["hello"]


def test_runlength_decoder_edges():
    from pdf_extractor_spark.pdf.tokenizer import _runlength_decode

    assert _runlength_decode(_rle_encode(b"")) == b""
    for p in (b"abc", b"aaaaaaab", b"x" * 300, bytes(range(256)) * 3):
        assert _runlength_decode(_rle_encode(p)) == p
    assert _runlength_decode(b"\xfeZ\x80") == b"Z" * 3     # 257-254 repeats
    assert _runlength_decode(b"\x02abc\x80") == b"abc"     # literal run
    assert _runlength_decode(b"\x02abc") == b"abc"         # tolerated: no EOD
    assert _runlength_decode(b"\x05ab") is None            # truncated literal
    assert _runlength_decode(b"\xfe") is None              # truncated repeat


def test_type0_embedded_cmap_stream_degrades_to_typed_unparsed():
    # /Encoding pointing at an EMBEDDED CMap stream (code->CID, not
    # ->Unicode) with no /ToUnicode: can't recover text, must surface as
    # typed unparsed — not silent hex-guard suppression
    cmap = _tounicode_obj(12, b"%!PS-Adobe-3.0 Resource-CMap\nbegincmap\nendcmap")
    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/HHHHHH+Sub "
            b"/Encoding 12 0 R >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <01020304> Tj ET"
    pdf = _pdf_with_font(ops, [font, cmap], b"/F1 10 0 R")
    result = tokenize_pdf(pdf)
    assert _texts(result) == []
    assert [s["kind"] for s in result["spans"]] == ["unparsed"]
