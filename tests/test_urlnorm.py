"""URL canonicalization kernel + URL-level dedup stage."""

import duckdb
import pyarrow as pa
import ray.data as rd

from document_text_extraction_ray.functions.urlnorm import (
    canonical_sql,
    canonicalize_url_array,
)
from document_text_extraction_ray.stages.curation import url_dedup

CASES = [
    # (input, canonical)
    ("https://site7.com/page/3?a=1", "https://site7.com/page/3?a=1"),
    # scheme/host case, www., default port, trailing slash, tracking param
    ("HTTPS://WWW.Site7.COM:443/page/3/?a=1&utm_source=feed",
     "https://site7.com/page/3?a=1"),
    # duplicate slash, leading tracking param, fragment
    ("https://site7.com:443/page//3?utm_a=1&a=1#frag",
     "https://site7.com/page/3?a=1"),
    ("https://www.site7.com/page/3/?a=1#x", "https://site7.com/page/3?a=1"),
    # http default port + all-slash path collapses to root
    ("http://example.com:80//", "http://example.com/"),
    # non-default port kept
    ("http://example.com:8080/x/", "http://example.com:8080/x"),
    # non-URL passes through untouched
    ("not a url 42", "not a url 42"),
    # gclid/fbclid removed, kept param survives, host lowercased
    ("ftp://Host.Org/a//b/?gclid=zz&keep=1&fbclid=2",
     "ftp://host.org/a/b?keep=1"),
    # query collapses to empty -> dropped entirely
    ("https://h.io/?utm_a=1", "https://h.io/"),
    # empty path becomes /
    ("https://h.io", "https://h.io/"),
    # xutm_ is NOT a tracking param (anchored match)
    ("https://h.io/p?xutm_a=1", "https://h.io/p?xutm_a=1"),
]


def test_canonicalize_rules():
    got = canonicalize_url_array(pa.array([c[0] for c in CASES])).to_pylist()
    assert got == [c[1] for c in CASES]


def test_canonical_sql_mirrors_kernel():
    """The DuckDB replay must agree with the Arrow kernel case for case —
    this is what makes the url_dedup oracle an actual check of the rules."""
    con = duckdb.connect()
    con.register("u", pa.table({"url": pa.array([c[0] for c in CASES])}))
    sql = [r[0] for r in
           con.execute(f"SELECT {canonical_sql('url')} FROM u").fetchall()]
    assert sql == [c[1] for c in CASES]


def test_url_dedup_keeps_min_id_per_canonical():
    ds = rd.from_items([
        {"doc_id": 10, "url": "https://www.a.com/x/?utm_k=1"},
        {"doc_id": 3, "url": "HTTPS://A.COM:443/x"},
        {"doc_id": 7, "url": "https://a.com/x#frag"},
        {"doc_id": 5, "url": "https://b.com/y"},
    ])
    out = url_dedup(ds, "url", "doc_id", n_buckets=4).to_pandas()
    out = out.sort_values("canon_url").reset_index(drop=True)
    assert list(out["canon_url"]) == ["https://a.com/x", "https://b.com/y"]
    assert list(out["keep_doc"]) == [3, 5]
    assert list(out["n_dups"]) == [3, 1]


def test_url_template_kernel_adjacent_and_hex_segments():
    """Template kernel: adjacent numeric segments both collapse (the RE2
    two-pass overlap case), >=8-char hex collapses to <h>, short hex and
    static segments survive, query/fragment/scheme stripped."""
    import pyarrow as pa

    from document_text_extraction_ray.functions.urlnorm import (
        url_template_array,
    )

    urls = pa.array([
        "https://Site0.COM/a/12/34/56/78/x?q=1#f",
        "http://h.com/u/adeadbeef01/profile",
        "https://h.com/p/9/",
        "https://h.com/static/css/main.css",
        "https://h.com/u/ab12/x",          # short hex survives
        "https://h.com/12345678/x",        # 8 digits -> <n> (digit pass first)
    ])
    got = url_template_array(urls).to_pylist()
    assert got == [
        "site0.com/a/<n>/<n>/<n>/<n>/x",
        "h.com/u/<h>/profile",
        "h.com/p/<n>",
        "h.com/static/css/main.css",
        "h.com/u/ab12/x",
        "h.com/<n>/x",
    ]


def test_url_prefix_levels_edges():
    import pyarrow as pa

    from document_text_extraction_ray.functions.urlnorm import (
        url_prefix_levels,
    )

    t = url_prefix_levels(pa.chunked_array([pa.array([
        "https://a.com/x/y/z?q=1",   # deep path + query
        "http://b.com",               # host only
        "https://c.com/only#frag",    # one segment + fragment
    ])]), max_depth=2)
    rows = set(zip(t.column("depth").to_pylist(),
                   t.column("prefix").to_pylist()))
    assert rows == {(0, "a.com"), (0, "b.com"), (0, "c.com"),
                    (1, "a.com/x"), (1, "c.com/only"),
                    (2, "a.com/x/y")}
