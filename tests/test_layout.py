"""Layout operators L1-L12 + the layout actor-pool stage."""

import numpy as np
import ray.data

from document_text_extraction_ray.functions import layout as L
from document_text_extraction_ray.sources.synth_pdf import synth_pdf_doc, synth_pdf_rows
from document_text_extraction_ray.stages.layout import layout_extract


def _two_col_page(w=600, h=800, gap_x=(280, 320)):
    """Synthetic raster: two ink columns separated by a known gap."""
    img = np.full((h, w), 255, dtype=np.uint8)
    img[50:750, 40:gap_x[0]] = 0
    img[50:750, gap_x[1]:560] = 0
    return img


def test_histograms_and_gap_finder():
    img = _two_col_page()
    v_hist, h_hist = L.compute_histograms(img)
    gaps = L.find_gaps(v_hist, **L.V4_VERTICAL)
    centers = [g["center"] for g in gaps]
    assert any(280 <= c <= 320 for c in centers), centers


def test_gap_margins_excluded():
    hist = np.zeros(1000)
    hist[100:900] = 50.0
    hist[495:505] = 0.0
    gaps = L.find_gaps(hist, min_gap_ratio=0.005, threshold_ratio=0.05,
                       margin_ratio=0.03)
    # Edge zeros (0:100, 900:) fall inside/overlap margins policy; the center
    # gap must be found.
    assert any(abs(g["center"] - 499) <= 2 for g in gaps)


def test_merge_gaps():
    gaps = [
        {"start": 100, "end": 110, "center": 105, "width": 11},
        {"start": 115, "end": 125, "center": 120, "width": 11},
        {"start": 500, "end": 520, "center": 510, "width": 21},
    ]
    merged = L.merge_gaps(gaps, 1000, merge_distance_ratio=0.05)
    assert len(merged) == 2
    assert merged[0]["start"] == 100 and merged[0]["end"] == 125


def test_two_column_split_chooser():
    img = _two_col_page()
    v_hist, _ = L.compute_histograms(img)
    gaps = L.find_gaps(v_hist, **L.V4_VERTICAL)
    best = L.choose_two_column_split(v_hist, gaps)
    assert best is not None and 280 <= best["center"] <= 320


def test_clip_bbox():
    assert L.clip_bbox(-5, -5, 2000, 2000, 100, 50) == (0, 0, 100, 50)
    assert L.clip_bbox(10, 10, 10, 10, 100, 50) == (10, 10, 11, 11)


def test_px_pt_roundtrip():
    bbox_pt = L.px_to_pt((100, 200, 300, 400), 1000, 2000, 612.0, 792.0)
    assert abs(bbox_pt[0] - 61.2) < 1e-9
    assert abs(bbox_pt[3] - 158.4) < 1e-9


def test_build_grid_regions():
    v_seps = [{"center": 300}]
    h_seps = [{"center": 400}]
    regions = L.build_grid_regions(v_seps, h_seps, 600, 800, 612.0, 792.0)
    assert len(regions) == 4
    assert {(r["row"], r["col"]) for r in regions} == {(0, 0), (0, 1), (1, 0), (1, 1)}
    small = L.build_grid_regions([{"center": 10}], [], 600, 800, 612.0, 792.0)
    assert len(small) == 1  # 10px column dropped (<50px min width)


def test_block_gap_columns_and_reading_order():
    blocks = [
        {"x0": 320.0, "y0": 50.0, "x1": 560.0, "y1": 80.0, "text": "right top"},
        {"x0": 40.0, "y0": 200.0, "x1": 280.0, "y1": 230.0, "text": "left bottom"},
        {"x0": 40.0, "y0": 50.0, "x1": 280.0, "y1": 80.0, "text": "left top"},
        {"x0": 320.0, "y0": 200.0, "x1": 560.0, "y1": 230.0, "text": "right bottom"},
    ]
    # Boundary = midpoint of consecutive block x-starts (final.py:66-67):
    # (40 + 320) / 2 = 180 — anything strictly between the column centers works.
    boundary = L.block_gap_columns(blocks, 612.0)
    assert boundary is not None and 160 < boundary < 440
    text = L.reading_order_text(blocks, 612.0)
    assert text.split("\n") == ["left top", "left bottom", "right top", "right bottom"]


def test_single_column_no_boundary():
    blocks = [
        {"x0": 40.0, "y0": 100.0, "x1": 560.0, "y1": 130.0, "text": "second"},
        {"x0": 40.0, "y0": 50.0, "x1": 560.0, "y1": 80.0, "text": "first"},
    ]
    assert L.block_gap_columns(blocks, 612.0) is None
    assert L.reading_order_text(blocks, 612.0) == "first\nsecond"


def test_crop_regions_text():
    regions = L.build_grid_regions([{"center": 300}], [], 600, 800, 600.0, 800.0)
    blocks = [
        {"x0": 10, "y0": 10, "x1": 290, "y1": 40, "text": "left"},
        {"x0": 310, "y0": 10, "x1": 590, "y1": 40, "text": "right"},
    ]
    out = L.crop_regions_text(blocks, regions)
    assert [r["text"] for r in out] == ["left", "right"]


def test_golden_reading_order_vector_core():
    for i in range(40):
        doc = synth_pdf_doc(i)
        import json

        from document_text_extraction_ray.stages.layout import _vector_core

        pages = json.loads(doc["payload"].decode())["pages"]
        assert _vector_core(pages) == doc["expected_reading_order"], f"doc {i}"


def test_layout_stage_e2e():
    rows = synth_pdf_rows(0, 60)
    ds = ray.data.from_items(
        [{k: r[k] for k in ("url", "payload")} for r in rows]
    )
    out = layout_extract(ds, core="vector", concurrency=2).to_pandas()
    expected = {r["url"]: r["expected_reading_order"] for r in rows}
    assert len(out) == 60
    assert set(out["status"]) == {"ok"}
    for _, row in out.iterrows():
        assert row["extracted_text"] == expected[row["url"]]


def test_raster_core_runs():
    rows = synth_pdf_rows(0, 5)
    ds = ray.data.from_items([{k: r[k] for k in ("url", "payload")} for r in rows])
    out = layout_extract(ds, core="raster", concurrency=1, batch_size=4).to_pandas()
    assert set(out["status"]) == {"ok"}
    assert (out["extracted_text"].str.len() > 0).all()


def test_histogram_detects_columns_on_rendered_pdfs():
    """L1-L4 against realistic input: rendered two-column synthetic pages
    must yield a vertical separator between the columns; single-column pages
    must not split near the middle."""
    import json

    checked_two = checked_one = 0
    for i in range(60):
        doc = synth_pdf_doc(i)
        pages = json.loads(doc["payload"].decode())["pages"]
        page = pages[0]
        img = L.render_page_raster(page["blocks"], page["width_pt"], page["height_pt"])
        v_hist, _ = L.compute_histograms(img)
        gaps = L.find_gaps(v_hist, **L.V4_VERTICAL)
        best = L.choose_two_column_split(v_hist, gaps)
        w = img.shape[1]
        if doc["two_col"]:
            assert best is not None, f"doc {i}: two-col page, no split found"
            assert 0.35 * w < best["center"] < 0.65 * w
            checked_two += 1
        else:
            # single column: no central split candidate should win
            assert best is None or not (0.45 * w < best["center"] < 0.55 * w) \
                or best["width"] < 0.02 * w
            checked_one += 1
    assert checked_two > 5 and checked_one > 5


def test_a5_split_large_region_valleys():
    """A5: oversized detection splits at ink-profile valleys."""
    import numpy as np

    from document_text_extraction_ray.functions.layout import (
        is_large_region,
        split_large_region,
    )

    img = np.full((400, 200), 255, dtype=np.uint8)
    img[20:150, 20:180] = 0     # dark band 1
    img[250:380, 20:180] = 0    # dark band 2
    bbox = (0, 0, 200, 400)
    assert is_large_region(bbox, 200, 400, coverage=0.7)
    parts = split_large_region(bbox, img)
    # Reference semantics (cv_yolo_extractor.py:162-186): boundaries at the
    # CENTERS of below-threshold (dark) runs -> two bands give 3 sections
    # split at ~85 and ~315.
    assert len(parts) == 3
    assert parts[0][1] == 0 and parts[-1][3] == 400
    assert abs(parts[0][3] - 85) <= 3 and abs(parts[1][3] - 315) <= 3
    assert all(x1 == 0 and x2 == 200 for x1, _, x2, _ in parts)
    # sections under 30 px are dropped
    small = np.full((50, 200), 255, dtype=np.uint8)
    assert split_large_region((0, 0, 200, 29), small) == []


def test_a5_postprocess_fallback_and_order():
    import numpy as np

    from document_text_extraction_ray.functions.layout import (
        classify_section_position,
        default_sections,
        merge_nearby_regions,
        postprocess_detections,
    )

    img = np.full((400, 200), 255, dtype=np.uint8)
    # no detections -> 4 fixed bands in reading order
    out = postprocess_detections([], img)
    assert [d["class_name"] for d in out] == [
        "header", "summary", "experience", "education"]
    assert out == sorted(out, key=lambda d: (d["bbox"][1], d["bbox"][0]))
    assert len(default_sections(200, 400)) == 4
    # positional classifier follows the reference's thresholds
    assert classify_section_position(0, 5) == "header"
    assert classify_section_position(1, 5) == "summary"
    assert classify_section_position(2, 5) == "experience"
    assert classify_section_position(4, 5) == "skills"
    # adjacent same-width regions merge across small gaps
    merged = merge_nearby_regions([(0, 0, 10, 20), (0, 25, 10, 40),
                                   (0, 100, 10, 120)], max_gap_px=10)
    assert merged == [(0, 0, 10, 40), (0, 100, 10, 120)]


def test_ocr_stub_glyph_roundtrip():
    """Rasterize -> recognize is a true bit-level round trip, and corrupt
    bitmaps fail loudly (become in-band error rows in the stage)."""
    import numpy as np
    import pytest

    from document_text_extraction_ray.functions.ocr_stub import (
        StubOcrEngine,
        render_glyph_bitmap,
    )

    eng = StubOcrEngine()
    text = "John Doe 42, Python & SQL"
    bits = render_glyph_bitmap(text)
    assert bits.shape == (7, len(text))
    assert eng.recognize_glyph_bitmap(bits) == text
    # single-pixel corruption misreads exactly like real OCR noise
    bad = bits.copy(); bad[0, 0] ^= 1
    assert eng.recognize_glyph_bitmap(bad) != text
    with pytest.raises(ValueError):
        eng.recognize_glyph_bitmap(np.zeros((3, 5)))


def test_layout_do_ocr_extracts_scanned_pages():
    """Scanned docs (bitmap glyphs, no text layer) extract their golden
    reading order ONLY with do_ocr=True — the parse_cv_docling.py:216-221
    do_ocr lifecycle, end-to-end through the actor-pool stage."""
    from document_text_extraction_ray.sources.synth_pdf import (
        synth_scanned_pdf_doc,
    )

    rows = [synth_scanned_pdf_doc(i) for i in range(12)]
    ds = ray.data.from_items(
        [{k: r[k] for k in ("url", "payload")} for r in rows]
    )
    with_ocr = layout_extract(ds, core="vector", concurrency=2,
                              do_ocr=True).to_pandas()
    expected = {r["url"]: r["expected_reading_order"] for r in rows}
    assert set(with_ocr["status"]) == {"ok"}
    for _, row in with_ocr.iterrows():
        assert row["extracted_text"] == expected[row["url"]]

    without = layout_extract(ds, core="vector", concurrency=2).to_pandas()
    assert set(without["status"]) == {"ok"}
    assert (without["extracted_text"] == "").all()  # no text layer, no OCR
