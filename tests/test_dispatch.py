"""Content-type dispatch: mixed corpus routed per row, union'd output."""

import pyarrow as pa
import ray.data

from document_text_extraction_ray.pipelines.dispatch import (
    DISPATCH_SCHEMA,
    FAKEPDF_TYPE,
    HTML_TYPE,
    extract_dispatch,
)
from document_text_extraction_ray.sources.synth import synth_page
from document_text_extraction_ray.sources.synth_pdf import synth_pdf_doc


def _mixed_corpus(n_html=20, n_pdf=10):
    rows = []
    expected = {}
    for i in range(n_html):
        p = synth_page(i)
        rows.append({"url": p["url"], "content_type": HTML_TYPE,
                     "payload": p["html"]})
        expected[p["url"]] = p["expected_text"]
    for i in range(n_pdf):
        d = synth_pdf_doc(i)
        rows.append({"url": d["url"], "content_type": FAKEPDF_TYPE,
                     "payload": d["payload"]})
        expected[d["url"]] = d["expected_reading_order"]
    rows.append({"url": "https://x/unknown", "content_type": "video/mp4",
                 "payload": b"\x00\x01"})
    schema = pa.schema([("url", pa.string()), ("content_type", pa.string()),
                        ("payload", pa.large_binary())])
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema)), expected


def test_dispatch_routes_and_matches_golden():
    corpus, expected = _mixed_corpus()
    out = extract_dispatch(corpus, concurrency=2)
    assert out.schema().base_schema.equals(DISPATCH_SCHEMA)
    df = out.to_pandas()
    assert len(df) == 31
    by_method = df.groupby("method").size().to_dict()
    assert by_method == {"html": 20, "vector": 10, "none": 1}
    ok = df[df["status"] == "ok"]
    assert len(ok) == 30
    for _, row in ok.iterrows():
        assert row["extracted_text"] == expected[row["url"]]
    bad = df[df["method"] == "none"].iloc[0]
    assert bad["status"].startswith("error")


def test_dispatch_real_pdf_fails_soft():
    """application/pdf routes through the import-guarded PyMuPDF branch:
    with the decoder absent, rows come back as in-band errors (never raise)."""
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.pipelines.dispatch import extract_dispatch

    corpus = rd.from_arrow(pa.table({
        "url": ["u1", "u2"],
        "content_type": ["application/pdf", "text/html"],
        "payload": [b"%PDF-1.4 fake", b"<html><title>T</title><body><p>hello world</p></body></html>"],
    }))
    out = extract_dispatch(corpus).to_pandas().set_index("url")
    assert out.loc["u1", "method"] == "pymupdf"
    assert out.loc["u1", "status"].startswith("error: pdf decoder unavailable")
    assert out.loc["u2", "status"] == "ok"


def test_dispatch_single_pass_equals_filter_union_plan():
    """The one-scan in-task router must produce exactly the rows of the
    explicit filter+union plan (order-insensitive)."""
    corpus, _ = _mixed_corpus(n_html=15, n_pdf=7)
    # add a real-PDF row (decoder absent -> in-band error on both plans)
    import pyarrow as _pa

    from document_text_extraction_ray.pipelines.dispatch import PDF_TYPE

    extra = ray.data.from_arrow(_pa.Table.from_pylist(
        [{"url": "https://x/real.pdf", "content_type": PDF_TYPE,
          "payload": b"%PDF-1.4 fake"}],
        schema=_pa.schema([("url", _pa.string()),
                           ("content_type", _pa.string()),
                           ("payload", _pa.large_binary())])))
    corpus = corpus.union(extra)
    a = (
        extract_dispatch(corpus, concurrency=2, single_pass=True)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    b = (
        extract_dispatch(corpus, concurrency=2, single_pass=False)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
