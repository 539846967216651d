"""Layout / geometry operators L1-L12 (SURVEY.md §2.3): ink histograms, 1-D
gap finding, grid region building, pixel<->point mapping, block-gap column
detection and reading-order assembly.

Pure numpy re-implementations of the reference's per-page math
(parameter semantics preserved; cv2 replaced by numpy kernels):
  L1 histograms      grid_detector_v1.py:9-30, grid_detector_v3.py:23-43
  L2 gap finder      grid_detector_v1.py:32-85, column_detector_v2.py:26-72
  L3 gap merger      column_detector_v2.py:74-87
  L4 2-col chooser   column_detector_v2.py:89-121
  L5 true gaps       grid_detector_v3.py:116-178
  L6 grid regions    grid_detector_v2.py:93-153
  L7 bbox clip       grid_detector_v2.py:9-21
  L9 px<->pt scale   grid_detector_v1.py:184-203
  L10 block gaps     new_approaches/final.py:44-69
  L11 column assign  new_approaches/final.py:71-104
  L12 reading order  grid_detector_v2.py:342 (per-doc sorted(), never ds.sort)

Production thresholds are the v4 values (grid_detector_v4.py:274-286):
vertical min_gap=0.025 thr=0.025 margin=0.03; horizontal 0.05/0.20/0.05.
"""

from __future__ import annotations

import numpy as np

# grid_detector_v4.py:274-286 production parameters.
V4_VERTICAL = dict(min_gap_ratio=0.025, threshold_ratio=0.025, margin_ratio=0.03)
V4_HORIZONTAL = dict(min_gap_ratio=0.05, threshold_ratio=0.20, margin_ratio=0.05)


def _box_blur_1d(x: np.ndarray, k: int) -> np.ndarray:
    if k <= 1:
        return x.astype(np.float64)
    kernel = np.ones(k) / k
    return np.convolve(x.astype(np.float64), kernel, mode="same")


def binarize(img: np.ndarray, threshold: int = 200) -> np.ndarray:
    """L1a: grayscale -> inverted binary ink mask (ink=1 where darker than
    threshold) — the reference's cv2.threshold(..., THRESH_BINARY_INV)."""
    return (img < threshold).astype(np.float64)


def compute_histograms(img: np.ndarray, threshold: int = 200,
                       v_smooth: int = 3, h_smooth: int = 3):
    """L1: per-x-column and per-y-row ink mass with asymmetric smoothing
    (v3's (3,1)/(1,k) kernels preserve narrow column gaps)."""
    ink = binarize(img, threshold)
    vertical = _box_blur_1d(ink.sum(axis=0), v_smooth)    # len W
    horizontal = _box_blur_1d(ink.sum(axis=1), h_smooth)  # len H
    return vertical, horizontal


def find_gaps(hist: np.ndarray, min_gap_ratio: float = 0.025,
              threshold_ratio: float = 0.025, margin_ratio: float = 0.03):
    """L2: group consecutive below-threshold positions into gaps
    {start,end,center,width}; keep gaps >= min_gap_ratio * len outside the
    margins."""
    n = len(hist)
    if n == 0:
        return []
    thr = threshold_ratio * float(hist.max()) if hist.max() > 0 else 0.0
    below = hist <= thr
    min_gap = max(1, int(min_gap_ratio * n))
    margin = int(margin_ratio * n)
    gaps = []
    start = None
    for i in range(n):
        if below[i]:
            if start is None:
                start = i
        else:
            if start is not None:
                _maybe_add_gap(gaps, start, i - 1, min_gap, margin, n)
                start = None
    if start is not None:
        _maybe_add_gap(gaps, start, n - 1, min_gap, margin, n)
    return gaps


def _maybe_add_gap(gaps, start, end, min_gap, margin, n):
    width = end - start + 1
    if width < min_gap:
        return
    if end < margin or start > n - 1 - margin:
        return
    gaps.append(
        {"start": int(start), "end": int(end),
         "center": int((start + end) // 2), "width": int(width)}
    )


def merge_gaps(gaps, total_len: int, merge_distance_ratio: float = 0.05):
    """L3: merge gaps whose centers are within merge_distance_ratio*len."""
    if not gaps:
        return []
    limit = merge_distance_ratio * total_len
    merged = [dict(gaps[0])]
    for g in gaps[1:]:
        last = merged[-1]
        if g["center"] - last["center"] <= limit:
            last["end"] = g["end"]
            last["width"] = last["end"] - last["start"] + 1
            last["center"] = (last["start"] + last["end"]) // 2
        else:
            merged.append(dict(g))
    return merged


def choose_two_column_split(hist: np.ndarray, gaps, min_band_ratio: float = 0.10):
    """L4: score each candidate by balance x total mass via prefix sums;
    require both bands >= min_band_ratio of width; return best gap or None."""
    if not gaps:
        return None
    n = len(hist)
    prefix = np.cumsum(hist)
    total = float(prefix[-1])
    if total <= 0:
        return None
    best, best_score = None, -1.0
    for g in gaps:
        c = g["center"]
        if c < min_band_ratio * n or c > (1 - min_band_ratio) * n:
            continue
        left = float(prefix[c])
        right = total - left
        balance = 1.0 - abs(left - right) / total
        score = balance * total
        if score > best_score:
            best, best_score = g, score
    return best


def find_true_gaps(hist: np.ndarray, zero_ratio: float = 0.01,
                   min_height_ratio: float = 0.04):
    """L5: strict variant — only near-zero density (zero_ratio of max),
    min length ratio min_height_ratio."""
    return find_gaps(hist, min_gap_ratio=min_height_ratio,
                     threshold_ratio=zero_ratio, margin_ratio=0.0)


def clip_bbox(x1, y1, x2, y2, width, height):
    """L7: clamp to bounds, force >=1px validity."""
    x1 = max(0, min(int(x1), width - 1))
    y1 = max(0, min(int(y1), height - 1))
    x2 = max(x1 + 1, min(int(x2), width))
    y2 = max(y1 + 1, min(int(y2), height))
    return x1, y1, x2, y2


def px_to_pt(bbox_px, img_w: int, img_h: int, page_w_pt: float, page_h_pt: float):
    """L9: pixel -> PDF point coordinates."""
    sx, sy = page_w_pt / img_w, page_h_pt / img_h
    x1, y1, x2, y2 = bbox_px
    return (x1 * sx, y1 * sy, x2 * sx, y2 * sy)


def build_grid_regions(v_separators, h_separators, img_w: int, img_h: int,
                       page_w_pt: float, page_h_pt: float,
                       min_w_px: int = 50, min_h_px: int = 30):
    """L6: boundaries = [0] + separator centers + [W/H] (dedup + sorted);
    rows x cols cross-product; skip cells < min dims; clip; px->pt."""
    xs = sorted({0, img_w} | {g["center"] for g in v_separators})
    ys = sorted({0, img_h} | {g["center"] for g in h_separators})
    regions = []
    rid = 0
    for row in range(len(ys) - 1):
        for col in range(len(xs) - 1):
            x1, y1, x2, y2 = xs[col], ys[row], xs[col + 1], ys[row + 1]
            if (x2 - x1) < min_w_px or (y2 - y1) < min_h_px:
                continue
            x1, y1, x2, y2 = clip_bbox(x1, y1, x2, y2, img_w, img_h)
            regions.append(
                {
                    "id": rid,
                    "bbox_px": (x1, y1, x2, y2),
                    "bbox_pt": px_to_pt((x1, y1, x2, y2), img_w, img_h,
                                        page_w_pt, page_h_pt),
                    "width": x2 - x1,
                    "height": y2 - y1,
                    "row": row,
                    "col": col,
                }
            )
            rid += 1
    return regions


# ---- Vector-space path (no raster): PyMuPDF-style block tuples -------------

def block_gap_columns(blocks, page_width: float, min_chars: int = 10,
                      min_gap_pt: float = 40.0):
    """L10: column boundary from x-starts of substantial blocks; largest gap
    > min_gap_pt wins; None => single column (the reference's final.py:44-69,
    fallback page_width/2 left to the caller)."""
    xs = sorted({round(b["x0"], 1) for b in blocks if len(b.get("text", "")) > min_chars})
    if len(xs) < 2:
        return None
    best_gap, boundary = 0.0, None
    for a, b in zip(xs, xs[1:]):
        gap = b - a
        if gap > best_gap:
            best_gap, boundary = gap, (a + b) / 2
    return boundary if best_gap > min_gap_pt else None


def assign_columns(blocks, boundary):
    """L11: bucket blocks by center-x vs boundary; y-sort within column.

    Returns (left_blocks, right_blocks), each sorted by (y0, x0) —
    the reading-order definition for the multi-column path."""
    left, right = [], []
    for b in blocks:
        cx = (b["x0"] + b["x1"]) / 2
        (left if boundary is None or cx < boundary else right).append(b)
    key = lambda b: (b["y0"], b["x0"])  # noqa: E731
    return sorted(left, key=key), sorted(right, key=key)


def reading_order_text(blocks, page_width: float, joiner: str = "\n") -> str:
    """L10+L11+L12 composed: detect columns, assign, y-sort, concatenate.
    Single-column pages degrade to a plain y-sort."""
    boundary = block_gap_columns(blocks, page_width)
    left, right = assign_columns(blocks, boundary)
    ordered = left + right
    return joiner.join(b["text"] for b in ordered if b.get("text"))


def crop_regions_text(blocks, regions):
    """L8 analogue: assign each text block to the region containing its
    center; emit region-text records sorted (row, col) — the reference's
    page.crop(...).extract_text() semantics over vector blocks."""
    out = []
    for reg in sorted(regions, key=lambda r: (r["row"], r["col"])):
        x1, y1, x2, y2 = reg["bbox_pt"]
        texts = []
        for b in sorted(blocks, key=lambda b: (b["y0"], b["x0"])):
            cx, cy = (b["x0"] + b["x1"]) / 2, (b["y0"] + b["y1"]) / 2
            if x1 <= cx < x2 and y1 <= cy < y2 and b.get("text"):
                texts.append(b["text"])
        if texts:
            out.append(
                {
                    "region_id": reg["id"],
                    "row": reg["row"],
                    "col": reg["col"],
                    "text": "\n".join(texts),
                    "char_count": sum(len(t) for t in texts),
                }
            )
    return out


def render_page_raster(blocks, page_w_pt: float, page_h_pt: float,
                       dpi: int = 200) -> np.ndarray:
    """S5 analogue: rasterize block rectangles as ink on a white page
    (uint8 grayscale, 255=white, 0=ink) at the reference's 200 DPI."""
    scale = dpi / 72.0
    w, h = int(page_w_pt * scale), int(page_h_pt * scale)
    img = np.full((h, w), 255, dtype=np.uint8)
    for b in blocks:
        x1, y1, x2, y2 = clip_bbox(b["x0"] * scale, b["y0"] * scale,
                                   b["x1"] * scale, b["y1"] * scale, w, h)
        img[y1:y2, x1:x2] = 0
    return img


# ---------------------------------------------- A5: detection post-processing
# The reference's YOLO post-processing suite (cv_yolo_extractor.py:131-258):
# oversized detections are valley-split on the horizontal ink profile,
# empty pages fall back to fixed bands, and sections are classified by
# position.  Re-expressed over this module's grayscale raster model.

def is_large_region(bbox, img_w: int, img_h: int,
                    coverage: float = 0.7) -> bool:
    """cv_yolo_extractor.py:131-141: detection covering > ``coverage`` of
    the page is too large and must be split."""
    x1, y1, x2, y2 = bbox
    return (x2 - x1) * (y2 - y1) > coverage * img_w * img_h


def split_large_region(bbox, img: np.ndarray, min_section_px: int = 30,
                       gap_run: int = 8, threshold_ratio: float = 0.6):
    """cv_yolo_extractor.py:143-215: split an oversized region at the
    valleys of its smoothed horizontal intensity profile.

    Valleys = rows whose smoothed mean intensity falls below
    ``threshold_ratio`` * profile mean; runs longer than ``gap_run`` rows
    become section boundaries (at the run center); sections shorter than
    ``min_section_px`` are dropped.  Returns [(x1, y1, x2, y2), ...]."""
    x1, y1, x2, y2 = (int(v) for v in bbox)
    roi = img[y1:y2, x1:x2]
    if roi.size == 0:
        return []
    profile = roi.mean(axis=1)
    k = max(3, len(profile) // 100)
    smoothed = _box_blur_1d(profile.astype(np.float64), k)
    gaps = np.nonzero(smoothed < smoothed.mean() * threshold_ratio)[0]

    boundaries = [0]
    if len(gaps) > 10:
        run_start = prev = gaps[0]
        for pos in list(gaps[1:]) + [None]:
            if pos is not None and pos == prev + 1:
                prev = pos
                continue
            if prev - run_start + 1 > gap_run:
                boundaries.append((run_start + prev) // 2)
            if pos is not None:
                run_start = prev = pos
    boundaries.append(len(smoothed))

    out = []
    for a, b in zip(boundaries, boundaries[1:]):
        if b - a < min_section_px:
            continue
        out.append((x1, y1 + a, x2, y1 + b))
    return out


def default_sections(img_w: int, img_h: int):
    """cv_yolo_extractor.py:217-241: fixed fallback bands when detection
    finds nothing — header / summary / experience / education quarters."""
    names = ("header", "summary", "experience", "education")
    out = []
    for i, name in enumerate(names):
        out.append({
            "name": name,
            "bbox": (0, int(img_h * i / 4), img_w, int(img_h * (i + 1) / 4)),
        })
    return out


def classify_section_position(index: int, total: int) -> str:
    """cv_yolo_extractor.py:243-253: positional section label."""
    if index == 0:
        return "header"
    if index == 1:
        return "summary"
    if index < total * 0.6:
        return "experience"
    if index < total * 0.8:
        return "education"
    return "skills"


def merge_nearby_regions(regions, max_gap_px: int = 12):
    """Merge vertically adjacent regions with the same x-extent whose gap is
    <= ``max_gap_px`` (the reference's merge-nearby-boxes cleanup between
    split and extraction).  Input/output: [(x1, y1, x2, y2), ...] sorted by
    (y1, x1)."""
    if not regions:
        return []
    regions = sorted(regions, key=lambda r: (r[1], r[0]))
    merged = [list(regions[0])]
    for x1, y1, x2, y2 in regions[1:]:
        last = merged[-1]
        if x1 == last[0] and x2 == last[2] and y1 - last[3] <= max_gap_px:
            last[3] = max(last[3], y2)
        else:
            merged.append([x1, y1, x2, y2])
    return [tuple(r) for r in merged]


def postprocess_detections(detections, img: np.ndarray):
    """Full A5 chain over raw detections [(bbox, class_name), ...]:
    split-oversized -> merge-nearby -> fallback-bands -> reading-order sort
    (cv_yolo_extractor.py:96-128).  Returns [{'bbox', 'class_name'}, ...]."""
    h, w = img.shape[:2]
    out = []
    for bbox, cls in detections:
        if is_large_region(bbox, w, h):
            parts = merge_nearby_regions(split_large_region(bbox, img))
            if not parts:
                # Degenerate split (roi empty / every section < min px):
                # keep the detection whole rather than dropping the page's
                # main content region.
                out.append({"bbox": tuple(int(v) for v in bbox),
                            "class_name": cls})
                continue
            n = len(parts)
            for i, part in enumerate(parts):
                out.append({"bbox": part,
                            "class_name": classify_section_position(i, n)})
        else:
            out.append({"bbox": tuple(int(v) for v in bbox),
                        "class_name": cls})
    if not out:
        out = [{"bbox": s["bbox"], "class_name": s["name"]}
               for s in default_sections(w, h)]
    out.sort(key=lambda d: (d["bbox"][1], d["bbox"][0]))
    return out
