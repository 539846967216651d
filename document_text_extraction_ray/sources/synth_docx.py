"""Deterministic minimal .docx synthesizer (test/fixture source for the S3
DOCX route — no external data, no python-docx).

Emits a REAL WordprocessingML zip (``[Content_Types].xml``, ``_rels/.rels``,
``word/document.xml``) that stdlib and real readers both open.  Determinism:
ZIP_STORED (no compressor-version drift), fixed member timestamps, fixed
member order — the same text always produces byte-identical payloads, so
docx-typed fixtures are stable across runs/retries.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def docx_document_xml(paragraphs: list[str]) -> str:
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{escape(p)}</w:t></w:r></w:p>"
        if p else "<w:p/>"
        for p in paragraphs
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{body}</w:body></w:document>'
    )


def build_docx(text: str) -> bytes:
    """One paragraph per line of ``text`` (split on "\\n").

    Round-trip contract (tested):
    ``extract_docx_text(build_docx(text)) == text + "\\n"`` — the reference
    fold appends "\\n" per paragraph, so the original text comes back with
    one trailing newline."""
    paragraphs = text.split("\n")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", docx_document_xml(paragraphs)),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(info, data)
    return buf.getvalue()
