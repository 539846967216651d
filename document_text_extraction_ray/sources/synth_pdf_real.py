"""Deterministic minimal REAL-PDF synthesizer (fixture source for the S2
``application/pdf`` route — no external data, no reportlab).

Writes a classic-xref PDF: catalog -> pages tree -> one page per input
page string, each page a single content stream of one ``Tj`` per text
line (Helvetica, fixed leading).  Streams optionally /FlateDecode
(zlib level pinned) so both the raw and compressed decode paths are
exercised.  Fully deterministic: same input -> byte-identical payload.

Round-trip contract (tested):
``minipdf_extract_text(build_pdf([p1, p2])) == p1 + "\\n" + p2``.
"""

from __future__ import annotations

import zlib


def _escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def page_content_stream(page_text: str) -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td", "14 TL"]
    for i, line in enumerate(page_text.split("\n")):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({_escape_literal(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", errors="replace")


def build_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Minimal classic-xref PDF with one page per entry of ``pages``."""
    n_pages = len(pages)
    # Object layout: 1=catalog, 2=pages, 3=font, then (page, contents) pairs.
    page_obj = [4 + 2 * i for i in range(n_pages)]
    cont_obj = [5 + 2 * i for i in range(n_pages)]
    objects: dict[int, bytes] = {}
    kids = " ".join(f"{o} 0 R" for o in page_obj)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                  ).encode()
    objects[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, text in enumerate(pages):
        objects[page_obj[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_obj[i]} 0 R >>"
        ).encode()
        data = page_content_stream(text)
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objects[cont_obj[i]] = (
            head.encode() + b"\nstream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objects) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_pdf_objstm(pages: list[str], compress: bool = True) -> bytes:
    """Modern (PDF 1.5+) layout: catalog, page tree, font and page dicts
    live COMPRESSED inside one /ObjStm, and the cross-reference is a
    binary /XRef STREAM (W [1 4 2]; type-2 rows point into the ObjStm) —
    the post-2010 default every real-world writer emits, and the layout
    the classic-xref subset missed (VERDICT r3 #4).  Content streams stay
    top-level (the spec forbids streams inside an ObjStm); one content
    stream exercises the INDIRECT /Length form.  Deterministic."""
    import struct

    n_pages = len(pages)
    page_obj = [4 + 2 * i for i in range(n_pages)]
    cont_obj = [5 + 2 * i for i in range(n_pages)]
    len_obj = 4 + 2 * n_pages       # indirect /Length value for page 0
    stm_obj = len_obj + 1           # the ObjStm
    xref_obj = stm_obj + 1          # the XRef stream

    kids = " ".join(f"{o} 0 R" for o in page_obj)
    packed: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>").encode(),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    for i in range(n_pages):
        packed[page_obj[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_obj[i]} 0 R >>"
        ).encode()

    # ObjStm payload: header of (objnum, offset) pairs, then the bodies.
    nums = sorted(packed)
    bodies = [packed[n] + b"\n" for n in nums]
    offs, pos = [], 0
    for b in bodies:
        offs.append(pos)
        pos += len(b)
    header = (" ".join(f"{n} {o}" for n, o in zip(nums, offs)) + "\n").encode()
    stm_payload = header + b"".join(bodies)
    stm_data = zlib.compress(stm_payload, 6)

    top: dict[int, bytes] = {}
    for i, text in enumerate(pages):
        data = page_content_stream(text)
        if compress:
            data = zlib.compress(data, 6)
            filt = " /Filter /FlateDecode"
        else:
            filt = ""
        if i == 0:
            head = f"<< /Length {len_obj} 0 R{filt} >>"
        else:
            head = f"<< /Length {len(data)}{filt} >>"
        top[cont_obj[i]] = (
            head.encode() + b"\nstream\n" + data + b"\nendstream")
        if i == 0:
            top[len_obj] = str(len(data)).encode()
    top[stm_obj] = (
        f"<< /Type /ObjStm /N {len(nums)} /First {len(header)} "
        f"/Length {len(stm_data)} /Filter /FlateDecode >>"
    ).encode() + b"\nstream\n" + stm_data + b"\nendstream"

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(top):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + top[num] + b"\nendobj\n"

    # Binary xref stream: W [1 4 2] rows for objects 0..xref_obj.
    size = xref_obj + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += struct.pack(">BIH", 0, 0, 65535)        # free
        elif num in offsets:
            rows += struct.pack(">BIH", 1, offsets[num], 0)  # top-level
        elif num in packed:
            rows += struct.pack(                             # in ObjStm
                ">BIH", 2, stm_obj, nums.index(num))
        else:  # the xref stream itself (offset patched below)
            rows += struct.pack(">BIH", 1, 0, 0)
    xref_at = len(out)
    rows[-6:] = struct.pack(">IH", xref_at, 0)[0:4] + rows[-2:]
    xref_data = zlib.compress(bytes(rows), 6)
    out += f"{xref_obj} 0 obj\n".encode()
    out += (
        f"<< /Type /XRef /Size {size} /W [1 4 2] /Root 1 0 R "
        f"/Length {len(xref_data)} /Filter /FlateDecode >>"
    ).encode() + b"\nstream\n" + xref_data + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def build_pdf_cid(pages: list[str], compress: bool = True) -> bytes:
    """Subset-font (Type0/CID-style) layout: show strings are HEX 2-byte
    character codes through a NON-identity mapping (code = codepoint +
    0x0100), recoverable only by applying the font's /ToUnicode CMap —
    the layout every modern writer with font subsetting emits, and the
    case a latin-1-only extractor garbles.  The CMap uses one bfrange for
    the printable-ASCII block plus bfchar pairs for anything else.
    Deterministic."""
    n_pages = len(pages)
    page_obj = [5 + 2 * i for i in range(n_pages)]
    cont_obj = [6 + 2 * i for i in range(n_pages)]
    objects: dict[int, bytes] = {}
    kids = " ".join(f"{o} 0 R" for o in page_obj)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                  ).encode()

    OFF = 0x0100
    extra = sorted({ch for p in pages for ch in p
                    if not (0x20 <= ord(ch) <= 0x7E) and ch != "\n"})
    cmap_lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin begincmap",
        "1 begincodespacerange <0000> <FFFF> endcodespacerange",
        # printable ASCII as one bfrange (scalar-start form)
        f"1 beginbfrange <{0x20 + OFF:04X}> <{0x7E + OFF:04X}> <0020> "
        "endbfrange",
    ]
    if extra:
        cmap_lines.append(f"{len(extra)} beginbfchar")
        for ch in extra:
            cmap_lines.append(
                f"<{ord(ch) + OFF:04X}> <{ord(ch):04X}>")
        cmap_lines.append("endbfchar")
    cmap_lines += ["endcmap end end"]
    cmap_data = "\n".join(cmap_lines).encode()
    objects[3] = (
        f"<< /Length {len(cmap_data)} >>".encode()
        + b"\nstream\n" + cmap_data + b"\nendstream")
    objects[4] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID "
                  b"/Encoding /Identity-H /ToUnicode 3 0 R >>")

    for i, text in enumerate(pages):
        objects[page_obj[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 4 0 R >> >> "
            f"/Contents {cont_obj[i]} 0 R >>"
        ).encode()
        ops = ["BT", "/F1 12 Tf", "72 720 Td", "14 TL"]
        for k, line in enumerate(text.split("\n")):
            if k:
                ops.append("0 -14 Td")
            hx = "".join(f"{ord(ch) + OFF:04X}" for ch in line)
            ops.append(f"<{hx}> Tj")
        ops.append("ET")
        data = "\n".join(ops).encode("latin-1")
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objects[cont_obj[i]] = (
            head.encode() + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objects) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ------------------------------------------------------- filtered variants

def _lzw_encode(data: bytes) -> bytes:
    """PDF LZWDecode-compatible encoder (EarlyChange=1): emits clear(256),
    codes at 9->12 bits growing ONE EARLY, clear+reset when the table
    fills, EOD(257).  Mirrors functions/pdf_extract._lzw_decode (fuzzed
    round-trip in tests)."""
    codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code, bits = 258, 9
    codes.append((256, bits))
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        codes.append((table[w], bits))
        table[w + c] = next_code
        next_code += 1
        # The DECODER's table lags one insertion behind (it inserts on the
        # NEXT code), so its early-change bump at next_code == 2^bits - 1
        # corresponds to the encoder bumping one insertion LATER.
        if next_code >= (1 << bits) and bits < 12:
            bits += 1
        elif next_code >= 4094:  # table full: clear and start over
            codes.append((256, bits))
            table = {bytes([i]): i for i in range(256)}
            next_code, bits = 258, 9
        w = c
    if w:
        codes.append((table[w], bits))
    codes.append((257, bits))
    acc = nacc = 0
    out = bytearray()
    for code, width in codes:
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _runlength_encode(data: bytes) -> bytes:
    """Simple spec-valid RunLengthDecode encoder: literal runs of <= 128
    bytes, repeat runs for >= 3 equal bytes, EOD marker."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        j = i
        while (j < n and j - i < 128
               and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    out.append(128)
    return bytes(out)


_PRED_COLUMNS = 64


def _png_predict_encode(data: bytes) -> bytes:
    """PNG-predictored Flate encoding (Predictor 15 'optimal': each row
    picks its own filter — this encoder CYCLES none/sub/up/average/paeth
    so every row-filter type is exercised), 1 color, 8 bits, rows of
    ``_PRED_COLUMNS`` bytes.  Content is padded to whole rows with spaces
    (whitespace between content-stream operators is insignificant)."""
    cols = _PRED_COLUMNS
    pad = (-len(data)) % cols
    data = data + b" " * pad
    out = bytearray()
    prev = bytearray(cols)
    for r, r0 in enumerate(range(0, len(data), cols)):
        raw = bytearray(data[r0:r0 + cols])
        ft = r % 5
        enc = bytearray(raw)
        if ft == 1:
            for j in range(1, cols):
                enc[j] = (raw[j] - raw[j - 1]) & 0xFF
        elif ft == 2:
            for j in range(cols):
                enc[j] = (raw[j] - prev[j]) & 0xFF
        elif ft == 3:
            for j in range(cols):
                left = raw[j - 1] if j else 0
                enc[j] = (raw[j] - (left + prev[j]) // 2) & 0xFF
        elif ft == 4:
            for j in range(cols):
                a = raw[j - 1] if j else 0
                b = prev[j]
                c = prev[j - 1] if j else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                ref = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                enc[j] = (raw[j] - ref) & 0xFF
        out.append(ft)
        out += enc
        prev = raw
    return zlib.compress(bytes(out), 6)


_FILTER_SCHEMES = {
    # name -> (encode fn over raw content, /Filter header fragment)
    "lzw": (_lzw_encode, "/Filter /LZWDecode"),
    "rle": (_runlength_encode, "/Filter /RunLengthDecode"),
    "hex": (lambda d: __import__("binascii").hexlify(d) + b">",
            "/Filter /ASCIIHexDecode"),
    "a85f": (lambda d: __import__("base64").a85encode(
                 zlib.compress(d, 6)) + b"~>",
             "/Filter [/ASCII85Decode /FlateDecode]"),
    "pred": (_png_predict_encode,
             "/Filter /FlateDecode /DecodeParms << /Predictor 15 "
             f"/Columns {_PRED_COLUMNS} >>"),
}


def build_pdf_filters(pages: list[str], scheme: str = "lzw") -> bytes:
    """Classic-layout PDF whose content streams use a NON-Flate filter (or
    a two-filter chain): LZWDecode, RunLengthDecode, ASCIIHexDecode, or
    ASCII85Decode+FlateDecode.  Same round-trip contract as ``build_pdf``;
    exercises the extractor's filter-chain decoders on the wire formats
    pre-2000 and image-era PDFs actually ship."""
    encode, header = _FILTER_SCHEMES[scheme]
    n_pages = len(pages)
    page_obj = [4 + 2 * i for i in range(n_pages)]
    cont_obj = [5 + 2 * i for i in range(n_pages)]
    objects: dict[int, bytes] = {}
    kids = " ".join(f"{o} 0 R" for o in page_obj)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                  ).encode()
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, text in enumerate(pages):
        objects[page_obj[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_obj[i]} 0 R >>"
        ).encode()
        data = encode(page_content_stream(text))
        head = f"<< /Length {len(data)} {header} >>"
        objects[cont_obj[i]] = (
            head.encode() + b"\nstream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objects) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
