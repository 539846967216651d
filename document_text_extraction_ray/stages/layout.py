"""Layout-branch stage: PDF-like payloads -> reading-order text, in a
stateful actor pool (the 'parsers kept warm' contract, SURVEY.md §2.4).

Two extract cores, mirroring the reference's cost ladder (§4.2):
  * 'vector'   — block-gap column detection over vector blocks, no raster
                 (the ~50 docs/s path, new_approaches/batch_multi_column.py);
  * 'raster'   — 200-DPI rasterize -> ink histograms -> gap finding -> grid
                 regions -> region crop (the ~2.4 docs/s path,
                 grid_detector_v4.py), kept numerically faithful to the v4
                 thresholds.

The extractor registry is the engine's user-extension surface (SURVEY.md
§2.11): an extract core is any callable ``pages -> text``.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions import layout as L


def _vector_core(pages) -> str:
    parts = []
    for page in pages:
        parts.append(
            L.reading_order_text(page["blocks"], page["width_pt"], joiner="\n")
        )
    return "\n".join(p for p in parts if p)


def _raster_core(pages, dpi: int = 200) -> str:
    parts = []
    for page in pages:
        img = L.render_page_raster(page["blocks"], page["width_pt"],
                                   page["height_pt"], dpi)
        v_hist, h_hist = L.compute_histograms(img)
        v_gaps = L.merge_gaps(
            L.find_gaps(v_hist, **L.V4_VERTICAL), len(v_hist)
        )
        h_gaps = L.find_gaps(h_hist, **L.V4_HORIZONTAL)
        regions = L.build_grid_regions(
            v_gaps, h_gaps, img.shape[1], img.shape[0],
            page["width_pt"], page["height_pt"],
        )
        region_texts = L.crop_regions_text(page["blocks"], regions)
        parts.append("\n".join(r["text"] for r in region_texts))
    return "\n".join(p for p in parts if p)


EXTRACT_CORES = {"vector": _vector_core, "raster": _raster_core}


class LayoutExtractor:
    """Actor-pool callable: JSON page payloads -> reading-order text.

    Construction resolves the extract core once per actor (model-warm
    analogue of cv_yolo_extractor.py:22-35); __call__ handles a batch with
    in-band error rows."""

    # Appended-columns contract, shared by every core (and any future
    # model-backed core): pinned field-for-field by
    # tests/test_models_contract.py so swapping cores never changes the
    # downstream schema.
    OUTPUT_FIELDS = (("extracted_text", pa.large_string()),
                     ("n_pages", pa.int32()),
                     ("method", pa.string()),
                     ("status", pa.string()))

    def __init__(self, core: str = "vector", payload_column: str = "payload",
                 do_ocr: bool = False):
        self.core = EXTRACT_CORES[core]
        self.core_name = core
        self.payload_column = payload_column
        # The OCR engine is warm actor state (the reference's
        # converter-with-do_ocr=True built once, parse_cv_docling.py:216-221);
        # scanned pages (scan_blocks, no text layer) only extract when the
        # flag is on — mirroring Docling's behavior.
        self.ocr = None
        if do_ocr:
            from ..functions.ocr_stub import StubOcrEngine

            self.ocr = StubOcrEngine()

    def _effective_pages(self, pages):
        out = []
        for page in pages:
            scans = page.get("scan_blocks")
            if scans and not page.get("blocks"):
                if self.ocr is not None:
                    page = {**page, "blocks": [
                        self.ocr.read_scan_block(b) for b in scans]}
                else:
                    # Scanned page without OCR: no text layer to read —
                    # empty extraction, ok status (Docling's do_ocr=False).
                    page = {**page, "blocks": []}
            out.append(page)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, statuses, n_pages_col = [], [], []
        for blob in batch.column(self.payload_column).to_pylist():
            try:
                doc = json.loads(bytes(blob).decode("utf-8"))
                pages = self._effective_pages(doc["pages"])
                texts.append(self.core(pages))
                n_pages_col.append(len(pages))
                statuses.append("ok")
            except Exception as exc:
                texts.append("")
                n_pages_col.append(0)
                statuses.append(f"error: {type(exc).__name__}")
        batch = batch.drop_columns([self.payload_column])
        batch = batch.append_column(
            "extracted_text", pa.array(texts, pa.large_string())
        )
        batch = batch.append_column("n_pages", pa.array(n_pages_col, pa.int32()))
        batch = batch.append_column("method", pa.array(
            [self.core_name] * len(texts), pa.string()))
        return batch.append_column("status", pa.array(statuses, pa.string()))


def layout_extract(ds, core: str = "vector", concurrency: int = 8,
                   batch_size: int = 32, **kw):
    from ..util import pool_size

    concurrency = pool_size(concurrency)
    return ds.map_batches(
        LayoutExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(core=core, **kw),
    )
