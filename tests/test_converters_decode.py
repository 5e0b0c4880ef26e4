"""Round-4 stdlib decoders for the §2.11 converters (DOCX/XLSX/PDF →
markdown). Fixtures are constructed with the same stdlib the decoders
use inverted (zipfile/XML writers, a hand-assembled PDF), so these are
format-conformance tests, not self-referential round-trips: the fixture
bytes follow the ECMA-376 / PDF-1.4 specs, not the decoder's internals.

Byte-parity goldens vs the reference's PyMuPDF/python-docx/openpyxl
output become mandatory the moment those libs appear in the container
(they were re-probed absent 2026-08-17)."""

from __future__ import annotations

import io
import zipfile
import zlib

import pytest

from eget_crawler_for_overflow_spark.functions.convert import (
    _decode_docx,
    _decode_pdf,
    _decode_xlsx,
    get_converter,
)

W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def make_docx(document_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxml'
            'formats.org/package/2006/content-types"/>',
        )
        z.writestr("word/document.xml", document_xml)
    return buf.getvalue()


def test_docx_headings_lists_tables():
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS}><w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>
    <w:r><w:t>Report Title</w:t></w:r></w:p>
  <w:p><w:r><w:t>First paragraph with </w:t></w:r>
       <w:r><w:t>two runs.</w:t></w:r></w:p>
  <w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr>
    <w:r><w:t>Section</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr>
    <w:r><w:t>item one</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="1"/></w:numPr></w:pPr>
    <w:r><w:t>nested item</w:t></w:r></w:p>
  <w:tbl>
    <w:tr><w:tc><w:p><w:r><w:t>k</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>v</w:t></w:r></w:p></w:tc></w:tr>
    <w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>1</w:t></w:r></w:p></w:tc></w:tr>
  </w:tbl>
</w:body></w:document>"""
    md = _decode_docx(make_docx(doc))
    assert "# Report Title" in md
    assert "First paragraph with two runs." in md
    assert "## Section" in md
    assert "- item one" in md
    assert "- nested item" in md  # clean_text strips leading indent
    assert "| k | v |" in md and "| a | 1 |" in md and "|---|---|" in md


def test_docx_empty_paragraphs_skipped_and_breaks():
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS}><w:body>
  <w:p></w:p>
  <w:p><w:r><w:t>line one</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
</w:body></w:document>"""
    md = _decode_docx(make_docx(doc))
    assert md == "line one\nline two"


S_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
R_NS = (
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships"'
)


def make_xlsx(sheets: dict[str, str], shared: list[str] | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        sheet_tags = "".join(
            f'<sheet name="{name}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, name in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {S_NS} {R_NS}>'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://x" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            f'openxmlformats.org/package/2006/relationships">{rels}'
            "</Relationships>",
        )
        if shared is not None:
            sis = "".join(f"<si><t>{s}</t></si>" for s in shared)
            z.writestr(
                "xl/sharedStrings.xml",
                f'<?xml version="1.0"?><sst {S_NS}>{sis}</sst>',
            )
        for i, xml in enumerate(sheets.values()):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return buf.getvalue()


def test_xlsx_two_sheets_shared_strings_and_types():
    sheet1 = f"""<?xml version="1.0"?><worksheet {S_NS}><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2" t="n"><v>3.0</v></c><c r="B2" t="b"><v>1</v></c></row>
<row r="3"><c r="A3" t="n"><v>2.5</v></c>
           <c r="C3" t="inlineStr"><is><t>inline</t></is></c></row>
</sheetData></worksheet>"""
    empty = f'<?xml version="1.0"?><worksheet {S_NS}><sheetData/></worksheet>'
    md = _decode_xlsx(
        make_xlsx({"Data": sheet1, "Blank": empty}, shared=["name", "ok"])
    )
    assert "## Data" in md
    assert "| name | ok |" in md
    assert "| 3 | TRUE |" in md  # 3.0 normalized, boolean rendered
    # gap column B3 is empty, C3 lands in the third column (clean_text
    # collapses the double space of the empty cell)
    assert "| 2.5 | | inline |" in md
    # the empty sheet is gated out entirely (reference _has_content)
    assert "## Blank" not in md


def test_xlsx_all_empty_raises():
    empty = f'<?xml version="1.0"?><worksheet {S_NS}><sheetData/></worksheet>'
    with pytest.raises(ValueError, match="no non-empty sheets"):
        _decode_xlsx(make_xlsx({"Blank": empty}))


def make_pdf(content: bytes, compress: bool) -> bytes:
    """Minimal single-page PDF-1.4 with one content stream."""
    body = zlib.compress(content) if compress else content
    filt = b"/Filter /FlateDecode " if compress else b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << "
        + filt
        + b"/Length "
        + str(len(body)).encode()
        + b" >>\nstream\n"
        + body
        + b"\nendstream endobj\n",
    ]
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


PDF_CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Hello \\(escaped\\) world) Tj T* "
    b"[(kerned ) -120 (pair)] TJ T* "
    b"<4865782073696465> Tj ET"
)


@pytest.mark.parametrize("compress", [False, True])
def test_pdf_text_layer(compress):
    md = _decode_pdf(make_pdf(PDF_CONTENT, compress))
    assert "Hello (escaped) world" in md
    assert "kerned pair" in md
    assert "Hex side" in md  # hex-string decoding


def test_pdf_no_text_raises():
    # header-only / image-only pdf: no BT..ET text operators anywhere
    payload = make_pdf(b"q 1 0 0 1 0 0 cm Q", compress=True)
    with pytest.raises(ValueError, match="no extractable text layer"):
        _decode_pdf(payload)
    with pytest.raises(ValueError, match="missing %PDF header"):
        _decode_pdf(b"GIF89a not a pdf")


def test_registry_dispatch_now_real():
    """The registry serves the real decoders (previously NotImplementedError
    stubs)."""
    md = get_converter("docx")(
        make_docx(
            f'<?xml version="1.0"?><w:document {W_NS}><w:body>'
            "<w:p><w:r><w:t>via registry</w:t></w:r></w:p>"
            "</w:body></w:document>"
        )
    )
    assert md == "via registry"


def test_pdf_heading_and_list_heuristics():
    """Size-based headings + bullet normalization (the reference's
    pdf_converter heading/list heuristics, own-dialect)."""
    content = (
        b"BT /F1 24 Tf 72 760 Td (Big Title) Tj "
        b"/F1 14.5 Tf 0 -30 Td (Subhead) Tj "
        b"/F1 12 Tf 0 -20 Td (Body line one.) Tj "
        b"0 -14 Td (\\225 bullet item) Tj "
        b"0 -14 Td (Body line two.) Tj "
        b"0 -14 Td (Body line three.) Tj ET"
    )
    md = _decode_pdf(make_pdf(content, compress=True))
    assert "# Big Title" in md
    assert "## Subhead" in md
    assert "- bullet item" in md          # \225 = latin-1 bullet
    assert "Body line one." in md and "# Body" not in md


def test_pdf_endstream_newline_layout_no_phantom_streams():
    """`endstream\\nendobj` layout (the common real-world spacing): the
    stream scanner must not treat the tail of 'endstream\\n' as a stream
    start — that re-scanned the next object's body and duplicated text."""
    s1 = b"BT /F1 12 Tf (First page text) Tj ET"
    s2 = b"BT /F1 12 Tf (Second page text) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"4 0 obj << /Length " + str(len(s1)).encode() + b" >>\nstream\n"
        + s1 + b"\nendstream\nendobj\n"
        b"5 0 obj << /Length " + str(len(s2)).encode() + b" >>\nstream\n"
        + s2 + b"\nendstream\nendobj\n%%EOF\n"
    )
    md = _decode_pdf(pdf)
    assert md.count("First page text") == 1
    assert md.count("Second page text") == 1


def test_pdf_nonoctal_digit_escape_tolerated():
    """\\8 and \\9 are not octal; real parsers drop the backslash and keep
    the digit instead of failing the whole document."""
    md = _decode_pdf(make_pdf(rb"BT /F1 12 Tf (a\8b\9c\101d) Tj ET", False))
    assert "a8b9cAd" in md  # \101 IS octal ('A'); \8 \9 pass through


def test_docx_multiparagraph_cell_keeps_table_shape():
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS}><w:body>
  <w:tbl>
    <w:tr><w:tc><w:p><w:r><w:t>one</w:t></w:r></w:p>
               <w:p><w:r><w:t>two</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>x</w:t></w:r></w:p></w:tc></w:tr>
  </w:tbl>
</w:body></w:document>"""
    md = _decode_docx(make_docx(doc))
    assert "| one two | x |" in md  # newline never splits the row


def test_xlsx_formula_str_cells_verbatim():
    # t="str" cells are cached TEXT results of formulas: "007" must stay
    # "007" (openpyxl/the reference only normalize numeric t="n" cells).
    sheet = f"""<?xml version="1.0"?><worksheet {S_NS}><sheetData>
<row r="1"><c r="A1" t="str"><v>007</v></c><c r="B1" t="n"><v>7.0</v></c></row>
</sheetData></worksheet>"""
    md = _decode_xlsx(make_xlsx({"S": sheet}))
    assert "| 007 | 7 |" in md


def test_pdf_long_object_dict_still_sniffs_filter():
    """A stream dict longer than the old 400-byte lookback window must
    still see /FlateDecode — the sniff anchors on the 'N 0 obj' token."""
    content = b"BT /F1 12 Tf (long dict ok) Tj ET"
    body = zlib.compress(content)
    pad = b"/Metadata (" + b"x" * 600 + b") "
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Filter /FlateDecode " + pad
        + b"/Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream endobj\n",
    ]
    md = _decode_pdf(b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n")
    assert "long dict ok" in md


# ---------------------------------------------------------------------------
# round-5 fidelity: PDF tables, PDF/DOCX embedded-image references
# ---------------------------------------------------------------------------


def test_pdf_grid_table_detected():
    # the reference's grid pattern is border-delimited (lazy border→border
    # match, pdf_converter.py:218-219), so the fixture carries top/bottom
    # +--+ borders like a real text-rendered grid table
    content = (
        b"BT /F1 12 Tf (intro paragraph) Tj T* "
        b"(+------+-----+) Tj T* "
        b"(| name | qty |) Tj T* "
        b"(| ant  | 3   |) Tj T* "
        b"(| bee  | 5   |) Tj T* "
        b"(+------+-----+) Tj T* "
        b"(outro paragraph) Tj ET"
    )
    md = _decode_pdf(make_pdf(content, compress=True))
    assert "| name | qty |" in md
    assert "|---|---|" in md
    assert "| ant | 3 |" in md and "| bee | 5 |" in md
    assert "+------+-----+" not in md  # separator rows dropped
    assert "intro paragraph" in md and "outro paragraph" in md


def test_pdf_spaced_table_detected():
    # The reference's spacing pattern needs >=3 (2+space, word) groups per
    # edge line; its match starts AT the first spacing run, so the header's
    # first cell ('id') sits outside the match — faithful to
    # pdf_converter.py:221-226, asserted as such.
    content = (
        b"BT /F1 12 Tf (id  name  qty  price) Tj T* "
        b"(1  ant  3  0.50) Tj T* ET"
    )
    md = _decode_pdf(make_pdf(content, compress=False))
    assert "| name | qty | price |" in md
    assert "| 1 | ant | 3 | 0.50 |" in md


def test_pdf_embedded_image_refs():
    body = zlib.compress(b"BT /F1 12 Tf (text with a figure) Tj ET")
    jpg = b"\xff\xd8" + b"\x00" * 64
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Filter /FlateDecode /Length "
        + str(len(body)).encode() + b" >>\nstream\n" + body
        + b"\nendstream endobj\n",
        b"5 0 obj << /Subtype /Image /Width 640 /Height 480 "
        b"/Filter /DCTDecode /Length "
        + str(len(jpg)).encode() + b" >>\nstream\n" + jpg
        + b"\nendstream endobj\n",
        b"6 0 obj << /Subtype /Image /Width 8 /Height 8 "
        b"/Filter /FlateDecode /Length 4 >>\nstream\n\x00\x01\x02\x03"
        b"\nendstream endobj\n",
    ]
    md = _decode_pdf(b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n")
    assert "text with a figure" in md
    assert "![Image](media/image1.jpeg)" in md  # DCTDecode -> JPEG
    assert "![Image](media/image2.png)" in md   # FlateDecode -> PNG


def make_docx_with_image(document_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", document_xml)
        z.writestr(
            "word/_rels/document.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId5" Type="http://x/image" '
            'Target="media/image1.png"/></Relationships>',
        )
        z.writestr("word/media/image1.png", b"\x89PNG\r\n\x1a\n" + b"\0" * 16)
    return buf.getvalue()


DRAW_NS = (
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
    'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/'
    'wordprocessingDrawing" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships"'
)


def test_docx_embedded_image_ref():
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS} {DRAW_NS}><w:body>
  <w:p><w:r><w:t>before </w:t></w:r>
    <w:r><w:drawing><wp:inline>
      <wp:docPr id="1" name="Picture 1" descr="a diagram"/>
      <a:graphic><a:graphicData><a:blip r:embed="rId5"/></a:graphicData>
      </a:graphic>
    </wp:inline></w:drawing></w:r>
    <w:r><w:t> after</w:t></w:r></w:p>
</w:body></w:document>"""
    md = _decode_docx(make_docx_with_image(doc))
    assert "before ![a diagram](media/image1.png) after" in md


def test_docx_image_without_rels_ignored():
    # same drawing but no rels part: no broken ref, text still extracted
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS} {DRAW_NS}><w:body>
  <w:p><w:r><w:t>plain</w:t>
    <w:drawing><wp:inline><a:blip r:embed="rId9"/></wp:inline></w:drawing>
  </w:r></w:p>
</w:body></w:document>"""
    assert _decode_docx(make_docx(doc)) == "plain"


def make_cid_pdf(
    text: str, cmap_flate: bool = True, content: bytes | None = None
) -> bytes:
    """Identity-H subset font: each glyph gets an arbitrary 2-byte code;
    the ToUnicode CMap (bfchar for odd glyphs, one bfrange over a
    contiguous run) is the ONLY route back to the text — exactly the
    shape pdflatex/word emit for embedded subset fonts."""
    # assign glyph codes: contiguous range for 'a'..'j', bfchar for rest
    range_chars = "abcdefghij"
    seen = {c for c in text if c not in range_chars}
    bfchars = "".join(
        f"<{0x1000 + i:04X}> <{ord(c):04X}>\n"
        for i, c in enumerate(sorted(seen))
    )
    code_of = {c: 0x1000 + i for i, c in enumerate(sorted(seen))}
    for i, c in enumerate(range_chars):
        code_of[c] = 0x2000 + i
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "begincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(seen)} beginbfchar\n{bfchars}endbfchar\n"
        "1 beginbfrange\n<2000> <2009> <0061>\nendbfrange\n"
        "endcmap\nend\n"
    ).encode()
    if cmap_flate:
        cmap_body, cmap_filt = zlib.compress(cmap), b"/Filter /FlateDecode "
    else:
        cmap_body, cmap_filt = cmap, b""
    hexstr = "".join(f"{code_of[c]:04X}" for c in text)
    if content is None:
        content = f"BT /F1 12 Tf <{hexstr}> Tj ET".encode()
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
        b"4 0 obj << /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream endobj\n",
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /ABCDEF+Fake "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n",
        b"6 0 obj << " + cmap_filt + b"/Length "
        + str(len(cmap_body)).encode() + b" >>\nstream\n" + cmap_body
        + b"\nendstream endobj\n",
    ]
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


@pytest.mark.parametrize("cmap_flate", [True, False])
def test_pdf_cid_tounicode_cmap(cmap_flate):
    text = "subset fonts decode via bfchar and bfrange"
    md = _decode_pdf(make_cid_pdf(text, cmap_flate))
    assert md == text


def test_pdf_cid_unmapped_glyph_replacement():
    # a glyph code absent from the CMap renders U+FFFD, not garbage
    pdf = make_cid_pdf("abc")
    pdf = pdf.replace(b"<200020012002>", b"<20002001FFEE>")
    assert _decode_pdf(pdf) == "ab�"


def test_pdf_cid_without_tounicode_still_raises():
    # strip the ToUnicode ref: glyph codes are opaque -> honest failure
    pdf = make_cid_pdf("abc").replace(b"/ToUnicode 6 0 R ", b"")
    with pytest.raises(ValueError, match="ToUnicode"):
        _decode_pdf(pdf)


def test_pdf_image_body_containing_stream_token_not_double_counted():
    """Binary image bytes containing 'stream\\n' must not re-trigger the
    enclosing object's dict sniff (phantom match inside a consumed body
    → the image would be counted twice)."""
    body = zlib.compress(b"BT /F1 12 Tf (one figure) Tj ET")
    jpg = b"\xff\xd8" + b"\x00" * 8 + b"stream\n" + b"\x00" * 8
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Filter /FlateDecode /Length "
        + str(len(body)).encode() + b" >>\nstream\n" + body
        + b"\nendstream endobj\n",
        b"5 0 obj << /Subtype /Image /Width 4 /Height 4 /Filter /DCTDecode "
        b"/Length " + str(len(jpg)).encode() + b" >>\nstream\n" + jpg
        + b"\nendstream endobj\n",
    ]
    md = _decode_pdf(b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n")
    assert md.count("![Image]") == 1, md
    assert "![Image](media/image1.jpeg)" in md


# ---------------------------------------------------------------------------
# round-5: non-Flate filter chains + /ObjStm object streams
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes) -> bytes:
    """Inverted-construction LZW encoder (TIFF/PDF variant, EarlyChange=1):
    written from the spec, not from the decoder."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out_bits = []

    def emit(code, w):
        out_bits.append((code, w))

    emit(256, width)  # leading clear code (spec-recommended)
    w_cur = bytes()
    for b in data:
        k = w_cur + bytes([b])
        if k in table:
            w_cur = k
        else:
            emit(table[w_cur], width)
            table[k] = next_code
            next_code += 1
            # encoder bumps at the natural 2^w boundary; the DECODER bumps
            # one code early ((1<<w)-1, pdfminer semantics) because its
            # table add lags the encoder's by one code — that pairing IS
            # EarlyChange=1 (calibrated across the 511/1023/2047 bounds)
            if next_code >= (1 << width) and width < 12:
                width += 1
            w_cur = bytes([b])
    if w_cur:
        emit(table[w_cur], width)
    emit(257, width)  # EOD
    buf = 0
    nbits = 0
    out = bytearray()
    for code, w in out_bits:
        buf = (buf << w) | code
        nbits += w
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _make_filtered_pdf(content: bytes, filt: bytes, body: bytes) -> bytes:
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Filter " + filt + b" /Length "
        + str(len(body)).encode() + b" >>\nstream\n" + body
        + b"\nendstream endobj\n",
    ]
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


def test_pdf_filter_chain_decoders():
    import base64

    content = b"BT /F1 12 Tf (filter chain text) Tj ET"
    cases = [
        (b"/LZWDecode", _lzw_encode(content)),
        (b"/ASCII85Decode", base64.a85encode(content) + b"~>"),
        (b"/ASCIIHexDecode", content.hex().encode() + b">"),
        # RunLength: all-literal encoding (runs of length 1..128)
        (b"/RunLengthDecode",
         b"".join(bytes([len(content[i:i+128]) - 1]) + content[i:i+128]
                  for i in range(0, len(content), 128)) + b"\x80"),
        # chained: Flate then ASCII85 (decode order: A85 first, then Flate)
        (b"[ /ASCII85Decode /FlateDecode ]",
         base64.a85encode(zlib.compress(content)) + b"~>"),
    ]
    for filt, body in cases:
        md = _decode_pdf(_make_filtered_pdf(content, filt, body))
        assert md == "filter chain text", (filt, md)


def test_pdf_lzw_long_text_width_growth():
    # enough distinct phrases to push the LZW table past 511 codes (10-bit)
    content = (
        b"BT /F1 12 Tf ("
        + b" ".join(b"tok%d" % (i % 97) for i in range(400))
        + b") Tj ET"
    )
    md = _decode_pdf(_make_filtered_pdf(content, b"/LZWDecode",
                                        _lzw_encode(content)))
    assert md.startswith("tok0 tok1") and md.endswith("tok11")


def test_pdf_cid_font_dict_inside_objstm():
    """PDF 1.5+ layout: the font dict and page /Resources live inside a
    compressed /ObjStm object stream; only the content + ToUnicode CMap
    are top-level streams. The CMap discovery must find them there."""
    text = "objstm packed font"
    base = make_cid_pdf(text)
    # extract the working pieces from the 1.4-style fixture, then repack
    # the page + font dicts into an ObjStm
    packed_objs = [
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /ABCDEF+Fake "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>"),
    ]
    header = " ".join(f"{n} {off}" for n, off in
                      zip([o[0] for o in packed_objs],
                          [0, len(packed_objs[0][1]) + 1])).encode()
    first = len(header) + 1
    objstm_data = header + b"\n" + packed_objs[0][1] + b"\n" + packed_objs[1][1]
    objstm_body = zlib.compress(objstm_data)
    # rebuild the pdf: drop top-level 3/5 obj dicts, add the ObjStm
    import re as _re
    s = base
    s = _re.sub(rb"3 0 obj <<.*?>> endobj\n", b"", s)
    s = _re.sub(rb"5 0 obj <<.*?>> endobj\n", b"", s)
    objstm = (
        b"7 0 obj << /Type /ObjStm /N 2 /First " + str(first).encode()
        + b" /Filter /FlateDecode /Length " + str(len(objstm_body)).encode()
        + b" >>\nstream\n" + objstm_body + b"\nendstream endobj\n"
    )
    s = s.replace(b"%%EOF", objstm + b"%%EOF")
    assert b"3 0 obj" not in s.split(b"7 0 obj")[0]
    md = _decode_pdf(s)
    assert md == text


def test_xlsx_date_styled_cells_isoformat():
    """Date-styled numeric cells render as openpyxl would hand them to
    the reference: datetime.isoformat() (xlsx_converter.py:158-159), time
    for day fractions; non-date styles keep the numeric normalization."""
    styles = f"""<?xml version="1.0"?><styleSheet {S_NS}>
<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/></numFmts>
<cellXfs count="4">
  <xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/>
  <xf numFmtId="21"/>
</cellXfs></styleSheet>"""
    # 45292 = 2024-01-01; 45292.5 = noon; 0.25 = 06:00:00
    sheet = f"""<?xml version="1.0"?><worksheet {S_NS}><sheetData>
<row r="1"><c r="A1" t="n" s="1"><v>45292</v></c>
           <c r="B1" t="n" s="2"><v>45292.5</v></c>
           <c r="C1" t="n" s="3"><v>0.25</v></c>
           <c r="D1" t="n" s="0"><v>45292</v></c></row>
</sheetData></worksheet>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {S_NS} {R_NS}><sheets>'
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://x" '
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    md = _decode_xlsx(buf.getvalue())
    assert "| 2024-01-01T00:00:00 | 2024-01-01T12:00:00 | 06:00:00 | 45292 |" in md


def _numbering_xml() -> str:
    """numbering.xml binding numId 1 → decimal (ordered) at ilvl 0/1,
    numId 2 → bullet."""
    return f"""<?xml version="1.0"?>
<w:numbering {W_NS}>
  <w:abstractNum w:abstractNumId="10">
    <w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/></w:lvl>
    <w:lvl w:ilvl="1"><w:numFmt w:val="lowerLetter"/></w:lvl>
  </w:abstractNum>
  <w:abstractNum w:abstractNumId="20">
    <w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/></w:lvl>
  </w:abstractNum>
  <w:num w:numId="1"><w:abstractNumId w:val="10"/></w:num>
  <w:num w:numId="2"><w:abstractNumId w:val="20"/></w:num>
</w:numbering>"""


def make_docx_numbered(document_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", document_xml)
        z.writestr("word/numbering.xml", _numbering_xml())
    return buf.getvalue()


def _li(num_id: int, ilvl: int, text: str) -> str:
    return (
        f'<w:p><w:pPr><w:numPr><w:ilvl w:val="{ilvl}"/>'
        f'<w:numId w:val="{num_id}"/></w:numPr></w:pPr>'
        f"<w:r><w:t>{text}</w:t></w:r></w:p>"
    )


def test_docx_numbering_xml_ordered_lists():
    """numbering.xml numFmt decides ordered-vs-bullet (the determination
    the reference stubs with a text heuristic, docx_converter.py:229-244);
    ordered items get sequential markdown numbers that continue across a
    plain paragraph (same numId) and restart for deeper levels after a
    shallower item."""
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS}><w:body>
  {_li(1, 0, 'first step')}
  {_li(1, 0, 'second step')}
  {_li(1, 1, 'sub a')}
  {_li(1, 1, 'sub b')}
  {_li(1, 0, 'third step')}
  {_li(1, 1, 'sub again')}
  <w:p><w:r><w:t>interlude paragraph</w:t></w:r></w:p>
  {_li(1, 0, 'fourth step')}
  {_li(2, 0, 'bullet one')}
  {_li(2, 0, 'bullet two')}
</w:body></w:document>"""
    md = _decode_docx(make_docx_numbered(doc))
    lines = md.splitlines()
    assert "1. first step" in lines
    assert "2. second step" in lines
    assert "1. sub a" in lines
    assert "2. sub b" in lines
    assert "3. third step" in lines
    assert "1. sub again" in lines  # deeper counter restarted
    assert "4. fourth step" in lines  # continues across the interlude
    assert "- bullet one" in lines and "- bullet two" in lines


def test_docx_list_without_numbering_uses_reference_heuristic():
    """No numbering.xml: ordered-ness falls back to the reference's
    ^\\d+\\.?\\s text match (docx_converter.py:240) — numbered-looking text
    gets markdown numbering (duplicating the inline number exactly like
    the reference's enumerate-over-text render), anything else bullets."""
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS}><w:body>
  {_li(1, 0, '1. already numbered')}
  {_li(1, 0, 'plain item')}
</w:body></w:document>"""
    md = _decode_docx(make_docx(doc))
    lines = md.splitlines()
    assert "1. 1. already numbered" in lines
    assert "- plain item" in lines


def test_pdf_tm_positioned_rows_form_lines_and_tables():
    """Producers that lay out rows via Tm (text matrix) instead of
    Td/T* must still yield one extracted line per row — and a
    spaced-columns region across those rows must render as a table
    (pdf_converter.py:211-253 patterns)."""
    content = (
        b"BT /F1 12 Tf "
        b"1 0 0 1 72 700 Tm (name  qty  price  total) Tj "
        b"1 0 0 1 72 680 Tm (apple  3  1.50  4.50) Tj "
        b"1 0 0 1 72 660 Tm (pear  7  2.25  15.75) Tj ET"
    )
    md = _decode_pdf(make_pdf(content, compress=True))
    # bug-for-bug with the reference pattern: the spaced-table match
    # STARTS at the first \s{2,} gap (the first header cell is dropped)
    # and the non-greedy tail ends at the SECOND qualifying line, so the
    # third row stays plain text (pdf_converter.py:222,229)
    assert "| qty | price | total | |" in md
    assert "| apple | 3 | 1.50 | 4.50 |" in md
    assert "pear 7 2.25 15.75" in md
    assert "name" not in md


def test_pdf_rotated_tm_rows_still_separate_lines():
    """A 90-degree rotation matrix is still a reposition: rotated runs
    must not concatenate into one line."""
    content = (
        b"BT /F1 12 Tf "
        b"0 1 -1 0 500 72 Tm (rotated one) Tj "
        b"0 1 -1 0 480 72 Tm (rotated two) Tj ET"
    )
    md = _decode_pdf(make_pdf(content, compress=False))
    assert md == "rotated one\nrotated two"


def test_pdf_cid_tj_kerning_becomes_column_spaces():
    """CID/kerned producers encode inter-column whitespace as negative
    TJ adjustments, not space glyphs; large offsets must become column
    gaps so table detection fires on CID text too."""

    def hx(word: str) -> str:
        return "".join(
            f"{0x2000 + 'abcdefghij'.index(c):04X}" for c in word
        )

    def row(y: int, *words: str) -> str:
        cells = " -800 ".join(f"<{hx(w)}>" for w in words)
        return f"1 0 0 1 72 {y} Tm [{cells}] TJ "

    content = (
        "BT /F1 12 Tf "
        + row(700, "abc", "de", "fg", "hij")
        + row(680, "bcd", "ef", "ga", "ihj")
        + "ET"
    ).encode()
    md = _decode_pdf(make_cid_pdf("abcdefghij", content=content))
    # same reference-pattern semantics as the literal-string case: the
    # match starts at the first column gap, dropping the first cell
    assert md == (
        "| de | fg | hij | |\n|---|---|---|---|\n| bcd | ef | ga | ihj |"
    )


def test_pdf_small_tj_kerning_is_not_a_space():
    content = b"BT /F1 12 Tf [(ker) -120 (ned)] TJ ET"
    assert _decode_pdf(make_pdf(content, compress=False)) == "kerned"
    content2 = b"BT /F1 12 Tf [(two) -300 (words)] TJ ET"
    assert _decode_pdf(make_pdf(content2, compress=False)) == "two words"
