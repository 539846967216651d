"""JSONL / CSV source round-trip edge cases (quoting, unicode, newlines)."""

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
