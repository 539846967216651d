"""DOCX text extraction, pure stdlib (S3 — the reference's python-docx
reader, /root/reference/approach4_v1.py:33-42).

A .docx file is a zip archive; the document body lives in
``word/document.xml`` (WordprocessingML).  python-docx's
``paragraph.text`` is the concatenation of the paragraph's run texts
(``<w:t>`` elements), and the reference folds the document as
``text += paragraph.text + "\n"`` — every paragraph (including empty
ones) contributes a line, and the result carries a trailing newline.
``extract_docx_text`` reproduces those semantics exactly with
``zipfile`` + ``xml.etree`` so the route needs ZERO external
dependencies (unlike the PDF branch, which prefers PyMuPDF).

``<w:tab/>`` and ``<w:br/>`` inside runs are mapped to "\t" / "\n" the
way python-docx renders them.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_P = f"{{{W_NS}}}p"
_R = f"{{{W_NS}}}r"
_T = f"{{{W_NS}}}t"
_TAB = f"{{{W_NS}}}tab"
_BR = f"{{{W_NS}}}br"
_BODY = f"{{{W_NS}}}body"


def paragraph_texts(payload: bytes) -> list[str]:
    """All paragraph texts of the document body, in document order."""
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        doc_xml = z.read("word/document.xml")
    root = ET.fromstring(doc_xml)
    body = root.find(_BODY)
    if body is None:
        return []
    paras = []
    for p in body.iter(_P):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == _T:
                parts.append(node.text or "")
            elif node.tag == _TAB:
                parts.append("\t")
            elif node.tag == _BR:
                parts.append("\n")
        paras.append("".join(parts))
    return paras


def extract_docx_text(payload: bytes) -> str:
    """Reference-parity fold: every paragraph + "\\n" (empty paragraphs
    kept; trailing newline) — approach4_v1.py:36-40."""
    return "".join(t + "\n" for t in paragraph_texts(payload))
