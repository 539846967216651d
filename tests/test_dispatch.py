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


def test_dispatch_real_pdf_extracts_and_fails_soft():
    """application/pdf: a REAL (synthesized classic-xref, FlateDecode) PDF
    payload round-trips to its text through the pure-Python minipdf
    fallback (PyMuPDF absent from this stack); a corrupt payload comes back
    as an in-band error row (never raises)."""
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.pipelines.dispatch import extract_dispatch
    from document_text_extraction_ray.sources.synth_pdf_real import build_pdf

    text = "John Doe\njohn@example.com\nSkills: Python, SQL"
    two_pages = build_pdf(["page one line", "page two line"], compress=False)
    corpus = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3", "u4"],
        "content_type": ["application/pdf", "text/html",
                         "application/pdf", "application/pdf"],
        "payload": [build_pdf([text]),
                    b"<html><title>T</title><body><p>hello world</p></body></html>",
                    b"%PDF-1.4 fake",
                    two_pages],
    }))
    out = extract_dispatch(corpus).to_pandas().set_index("url")
    assert out.loc["u1", "method"] == "minipdf"
    assert out.loc["u1", "status"] == "ok"
    assert out.loc["u1", "extracted_text"] == text
    assert out.loc["u2", "status"] == "ok"
    assert out.loc["u3", "status"].startswith("error")   # in-band, soft
    assert out.loc["u4", "extracted_text"] == "page one line\npage two line"


def test_dispatch_docx_route():
    """S3: a REAL synthesized .docx zip payload extracts via the stdlib
    route with python-docx paragraph semantics (every paragraph + newline);
    corrupt zips are in-band errors."""
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.pipelines.dispatch import (
        DOCX_TYPE,
        extract_dispatch,
    )
    from document_text_extraction_ray.sources.synth_docx import build_docx

    text = "Jane Doe\n\njane@corp.example\nSkills: Python | SQL"
    corpus = rd.from_arrow(pa.table({
        "url": ["d1", "d2"],
        "content_type": [DOCX_TYPE, DOCX_TYPE],
        "payload": [build_docx(text), b"PK\x03\x04 truncated junk"],
    }))
    for single_pass in (True, False):
        out = extract_dispatch(
            corpus, single_pass=single_pass
        ).to_pandas().set_index("url")
        assert out.loc["d1", "method"] == "docx-xml"
        assert out.loc["d1", "status"] == "ok"
        assert out.loc["d1", "extracted_text"] == text + "\n"
        assert out.loc["d2", "status"].startswith("error")


def test_dispatch_single_pass_equals_filter_union_plan():
    """The one-scan in-task router must produce exactly the rows of the
    explicit filter+union plan (order-insensitive)."""
    corpus, _ = _mixed_corpus(n_html=15, n_pdf=7)
    # add real-PDF rows (one valid -> minipdf text, one corrupt -> in-band
    # error on both plans) and a real DOCX row
    import pyarrow as _pa

    from document_text_extraction_ray.pipelines.dispatch import DOCX_TYPE, PDF_TYPE
    from document_text_extraction_ray.sources.synth_docx import build_docx
    from document_text_extraction_ray.sources.synth_pdf_real import build_pdf

    extra = ray.data.from_arrow(_pa.Table.from_pylist(
        [{"url": "https://x/real.pdf", "content_type": PDF_TYPE,
          "payload": b"%PDF-1.4 fake"},
         {"url": "https://x/good.pdf", "content_type": PDF_TYPE,
          "payload": build_pdf(["good pdf line"])},
         {"url": "https://x/good.docx", "content_type": DOCX_TYPE,
          "payload": build_docx("good docx line")}],
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
