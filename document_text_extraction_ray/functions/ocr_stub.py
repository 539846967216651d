"""Deterministic stub OCR for the scanned-page path (the reference enables
``do_ocr=True`` in its Docling pipeline, /root/reference/
parse_cv_docling.py:216-221, so scanned PDFs without a text layer still
extract).

No OCR model exists in this environment, so the GLYPH RASTERIZATION is a
stand-in: text renders to a 7-row bit matrix, one column per character,
column j's bits = the 7-bit ASCII code of character j (a "barcode font").
Recognition genuinely reads the bitmap back (column -> bits -> char), so
the whole rasterize -> segment -> recognize round trip is real and lossy
in the same ways real OCR is (corrupt a pixel and the glyph misreads) —
only the glyph shapes are fake.  Marked per the multimodal-stub mandate;
swap ``render_glyph_bitmap``/``recognize_glyph_bitmap`` for a real engine
(tesseract/docling OCR) to productionize.  Everything else — the warm
engine held per actor, the do_ocr flag plumbing, the region fold — is the
real pipeline.
"""

from __future__ import annotations

import numpy as np

GLYPH_ROWS = 7  # 7-bit ASCII


def render_glyph_bitmap(text: str) -> np.ndarray:
    """Render ASCII text to a (7, len) uint8 0/1 matrix (column = char)."""
    codes = np.frombuffer(text.encode("ascii", errors="replace"),
                          dtype=np.uint8)
    bits = (codes[None, :] >> np.arange(GLYPH_ROWS)[:, None]) & 1
    return bits.astype(np.uint8)


class StubOcrEngine:
    """Warm-state recognizer: the decode table is built once per actor
    (``LayoutExtractor.__init__``), mirroring the reference's
    converter-with-OCR constructed once (parse_cv_docling.py:212-221)."""

    def __init__(self):
        self._powers = (1 << np.arange(GLYPH_ROWS)).astype(np.uint8)

    def recognize_glyph_bitmap(self, bits: np.ndarray) -> str:
        """(7, n) 0/1 matrix -> text.  Raises on malformed shapes so a
        corrupt scan becomes an in-band error row upstream."""
        arr = np.asarray(bits, dtype=np.uint8)
        if arr.ndim != 2 or arr.shape[0] != GLYPH_ROWS:
            raise ValueError(f"scan bitmap must be ({GLYPH_ROWS}, n)")
        codes = (arr * self._powers[:, None]).sum(axis=0).astype(np.uint8)
        return codes.tobytes().decode("ascii", errors="replace")

    def read_scan_block(self, block: dict) -> dict:
        """A scanned region {'x0','y0','x1','y1','bits': [[...7 rows...]]}
        -> a synthetic TEXT block with the same geometry, ready for the
        normal reading-order cores (L10-L12)."""
        text = self.recognize_glyph_bitmap(np.asarray(block["bits"]))
        return {"x0": block["x0"], "y0": block["y0"],
                "x1": block["x1"], "y1": block["y1"], "text": text}
