"""JSONL / CSV / WARC source round-trip edge cases."""

import os

import ray.data as rd

from document_text_extraction_ray.sources.textfiles import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

ROWS = [
    {"doc_id": 1, "text": 'comma, "quoted", done', "lang": "en"},
    {"doc_id": 2, "text": "unicode: café — ok", "lang": "fr"},
    {"doc_id": 3, "text": "tab\there", "lang": "en"},
    {"doc_id": 4, "text": "", "lang": "de"},
]


def _roundtrip(write, read, path, empty_as_null=False):
    ds = rd.from_items(ROWS)
    out = read(write(ds, path), ["doc_id", "text", "lang"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = sorted(ROWS, key=lambda r: r["doc_id"])
    if empty_as_null:  # documented CSV caveat: '' reads back as null
        exp = [dict(r, text=(r["text"] or None)) for r in exp]
        out["text"] = out["text"].where(out["text"].notna(), None)
    assert out.to_dict("records") == exp


def test_jsonl_roundtrip_edges(tmp_path):
    _roundtrip(write_jsonl, read_jsonl, str(tmp_path / "jl"))


def test_csv_roundtrip_edges(tmp_path):
    _roundtrip(write_csv, read_csv, str(tmp_path / "csv"),
               empty_as_null=True)


def test_warc_roundtrip_plain_and_gz(tmp_path, ray_session):
    from document_text_extraction_ray.sources.warc import build_warc, read_warc

    docs = [(f"https://ex.org/p{i}",
             f"<html><body>doc {i} &amp; more</body></html>")
            for i in range(37)]
    d = str(tmp_path / "warcs")
    build_warc(os.path.join(d, "a.warc"), docs[:20])
    build_warc(os.path.join(d, "b.warc.gz"), docs[20:], gz=True)

    out = read_warc(d).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == 37                      # warcinfo records skipped
    assert set(out["warc_type"]) == {"response"}
    assert set(out["content_type"]) == {"text/html"}
    assert set(out["http_status"]) == {200}
    ref = sorted(docs)
    assert list(out["url"]) == [u for u, _ in ref]
    assert list(out["payload"]) == [h for _, h in ref]


def test_warc_truncated_tail_dropped(tmp_path, ray_session):
    from document_text_extraction_ray.sources.warc import build_warc, read_warc

    p = build_warc(str(tmp_path / "w" / "t.warc"),
                   [("https://a", "<p>one</p>"), ("https://b", "<p>two</p>")])
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-20])             # cut into the last record
    out = read_warc(str(tmp_path / "w")).to_pandas()
    assert list(out["url"]) == ["https://a"]   # partial tail dropped


def test_jsonl_gzip_roundtrip(tmp_path):
    """Gzip JSONL shards: files are genuinely gzipped on disk and the
    decompressing parallel read restores values exactly."""
    import glob
    import gzip

    import ray.data as rd

    from document_text_extraction_ray.sources.textfiles import (
        read_jsonl, write_jsonl,
    )

    ds = rd.from_items([
        {"id": 1, "s": "plain"},
        {"id": 2, "s": "unié and \"quotes\""},
        {"id": 3, "s": ""},
    ])
    path = write_jsonl(ds, str(tmp_path / "gz"), compression="gzip")
    f = glob.glob(path + "/*")[0]
    with open(f, "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"  # gzip magic
    with gzip.open(f, "rt") as fh:
        assert fh.readline().startswith("{")
    back = (read_jsonl(path, ["id", "s"], compression="gzip")
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert back["s"].tolist() == ["plain", 'unié and "quotes"', ""]


def test_orc_roundtrip_identity_and_pruning(ray_session, tmp_path):
    import ray.data as rd

    from document_text_extraction_ray.sources.textfiles import (
        read_orc, write_orc,
    )

    rows = [{"a": i, "b": f"s{i}", "c": float(i) / 4} for i in range(100)]
    ds = rd.from_items(rows)
    path = write_orc(ds, str(tmp_path / "orc"))
    back = read_orc(path).to_pandas().sort_values("a").reset_index(drop=True)
    import pandas as pd
    assert back.equals(pd.DataFrame(rows))
    pruned = read_orc(path, columns=["a"]).to_pandas()
    assert list(pruned.columns) == ["a"]
    assert sorted(pruned["a"]) == list(range(100))
