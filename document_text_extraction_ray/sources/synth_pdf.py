"""Deterministic synthetic 'PDF-like' documents for the layout branch.

A document is a JSON-serialized page list; each page holds PyMuPDF-style
text blocks {x0,y0,x1,y1,text} in points (the 7-tuple shape of
new_approaches/step1_analyze_layout.py:23, as a dict).  Pages are laid out in
one or two columns with seeded geometry, and the generator records the golden
reading order (left column top-to-bottom, then right) so the layout pipeline's
output is verifiable (FIXTURES.md §2 `blocks_2col`).
"""

from __future__ import annotations

import json
import random

from .synth import EPOCH_US, WORDS

PAGE_W, PAGE_H = 612.0, 792.0  # US Letter points


def synth_pdf_doc(i: int, seed: int = 42) -> dict:
    rng = random.Random(f"pdf:{seed}:{i}")
    two_col = rng.random() < 0.5
    n_pages = 1 if rng.random() < 0.8 else 2
    pages = []
    golden_order: list = []
    for page_no in range(n_pages):
        blocks = []
        margin = 36.0
        if two_col:
            col_w = (PAGE_W - 3 * margin) / 2
            col_x = [margin, margin * 2 + col_w]
        else:
            col_w = PAGE_W - 2 * margin
            col_x = [margin]
        per_col: list = [[] for _ in col_x]
        for ci, x0 in enumerate(col_x):
            y = margin + rng.random() * 20
            while y < PAGE_H - margin - 40:
                h = rng.uniform(24, 60)
                text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(6, 18)))
                per_col[ci].append(
                    {"x0": x0, "y0": round(y, 2),
                     "x1": round(x0 + col_w * rng.uniform(0.85, 1.0), 2),
                     "y1": round(y + h, 2), "text": text}
                )
                y += h + rng.uniform(8, 25)
        # Golden reading order: column-major, y-sorted (L11 semantics).
        for col_blocks in per_col:
            golden_order.extend(b["text"] for b in col_blocks)
        # Shuffle block storage order to prove order recovery is real.
        flat = [b for col in per_col for b in col]
        rng.shuffle(flat)
        blocks.extend(flat)
        pages.append(
            {"page_no": page_no, "width_pt": PAGE_W, "height_pt": PAGE_H,
             "blocks": blocks}
        )
    payload = json.dumps({"doc_id": i, "pages": pages}).encode("utf-8")
    return {
        "url": f"https://pdfs.example/doc{i}.pdf",
        "warc_ts": EPOCH_US + i * 191_000_000,
        "payload": payload,
        "content_type": "application/x-fakepdf",
        "two_col": two_col,
        "expected_reading_order": "\n".join(golden_order),
    }


def synth_pdf_rows(start: int, stop: int, seed: int = 42):
    return [synth_pdf_doc(i, seed) for i in range(start, stop)]


def synth_scanned_pdf_doc(i: int, seed: int = 42) -> dict:
    """A SCANNED variant of ``synth_pdf_doc``: same seeded geometry and
    golden reading order, but every text block is replaced by a
    ``scan_blocks`` entry carrying its glyph BITMAP (ocr_stub barcode
    font) and NO text layer — extractable only with ``do_ocr=True``."""
    from ..functions.ocr_stub import render_glyph_bitmap

    base = synth_pdf_doc(i, seed)
    doc = json.loads(base["payload"].decode("utf-8"))
    for page in doc["pages"]:
        page["scan_blocks"] = [
            {"x0": b["x0"], "y0": b["y0"], "x1": b["x1"], "y1": b["y1"],
             "bits": render_glyph_bitmap(b["text"]).tolist()}
            for b in page["blocks"]
        ]
        del page["blocks"]
    return {
        **base,
        "url": f"https://pdfs.example/scan{i}.pdf",
        "payload": json.dumps(doc).encode("utf-8"),
    }
