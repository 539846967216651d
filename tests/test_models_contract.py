"""Stub/real backend CONTRACT for the model stages (VERDICT r4 #7).

The real model libraries (spaCy, transformers, Ollama) are absent from this
sandbox, so the A-family stages run on deterministic stubs.  These tests pin
the part that must survive a backend swap:

* every stage declares ``OUTPUT_FIELDS`` — the exact (name, arrow type)
  columns it appends — and the STUB's actual output matches it
  field-for-field (names, types, order);
* ``backend="real"`` raises a clear NotImplementedError while the lib is
  absent (never a silent fallback to the stub);
* if a real lib IS importable (future environments), the real backend is
  exercised end-to-end on a tiny batch and must append the same
  ``OUTPUT_FIELDS`` — so the moment the environment gains the dependency,
  this suite starts verifying the real path instead of skipping it.
"""

from __future__ import annotations

import importlib.util

import pyarrow as pa
import pytest

from document_text_extraction_ray.stages.models import (
    LlmStructuredExtractor,
    SimpleNER,
    ZeroShotSectionClassifier,
)

_BATCH = pa.table({
    "doc_id": pa.array([1, 2], pa.int64()),
    "text": pa.array(
        ["John Smith worked at Acme Corp in experience section",
         "skills: python, sql and docker"], pa.large_string()),
    "extracted_text": pa.array(
        ["Jane Doe\nskills python sql", ""], pa.large_string()),
})

_STAGES = [
    (ZeroShotSectionClassifier, dict(text_column="text"), "transformers"),
    (SimpleNER, dict(text_column="text"), "spacy"),
    (LlmStructuredExtractor, dict(text_column="extracted_text"), "ollama"),
]


def _appended_fields(cls, kwargs, backend):
    stage = cls(backend=backend, **kwargs)
    out = stage(_BATCH)
    appended = [f for f in out.schema if f.name not in _BATCH.column_names]
    return [(f.name, f.type) for f in appended]


@pytest.mark.parametrize("cls,kwargs,_lib", _STAGES)
def test_stub_output_matches_declared_schema(cls, kwargs, _lib):
    assert _appended_fields(cls, kwargs, "stub") == list(cls.OUTPUT_FIELDS)


@pytest.mark.parametrize("cls,kwargs,lib", _STAGES)
def test_real_backend_contract(cls, kwargs, lib):
    if importlib.util.find_spec(lib) is None:
        with pytest.raises(NotImplementedError, match="real"):
            cls(backend="real", **kwargs)
        return
    # Real lib present (future environment): the real path must run and
    # append exactly the declared fields.
    assert _appended_fields(cls, kwargs, "real") == list(cls.OUTPUT_FIELDS)


def test_layout_extractor_matches_declared_schema():
    # A4: the layout stage's cores are real (pure numpy); the contract is
    # that every core appends exactly OUTPUT_FIELDS.
    import json

    from document_text_extraction_ray.stages.layout import LayoutExtractor

    payload = json.dumps({"pages": [{
        "width_pt": 612.0, "height_pt": 792.0,
        "blocks": [{"x0": 72, "y0": 72, "x1": 300, "y1": 90,
                    "text": "hello layout"}],
    }]}).encode()
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([payload], pa.large_binary())})
    for core in ("vector", "raster"):
        out = LayoutExtractor(core=core)(batch)
        appended = [(f.name, f.type) for f in out.schema
                    if f.name not in ("doc_id",)]
        assert appended == list(LayoutExtractor.OUTPUT_FIELDS)
        assert out.column("status").to_pylist() == ["ok"]


def test_stub_and_real_share_one_declared_schema():
    # The contract object itself: one OUTPUT_FIELDS per stage, arrow-typed.
    for cls, _kw, _lib in _STAGES:
        assert len(cls.OUTPUT_FIELDS) >= 1
        for name, typ in cls.OUTPUT_FIELDS:
            assert isinstance(name, str) and isinstance(typ, pa.DataType)
