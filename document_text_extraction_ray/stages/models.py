"""Model-backed stages (SURVEY.md §2.4 A1-A3, A7), actor-pool shaped.

The real models (spaCy, transformers, Ollama) are not installed in this
environment, so each stage import-guards the real backend and falls back to a
clearly-marked DETERMINISTIC STUB that keeps the Ray-side plumbing — actor
construction cost in __init__, batched inference in __call__, output schema,
in-band errors — fully real and tested.  Swap the stub for the real backend
by constructing with ``backend="real"`` where available.

Parity notes: A1 spaCy NER approach4_v1.py:12-19,149-177; A2 zero-shot
classifier cv_doclayout_extractor.py:18-43,107-124; A7 Ollama extractor
llm_approach/1.py:10-97 (prompt truncation to 3000 chars, pinned decode
options, response cleanup M15).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions import fields as F
from ..functions.structured import clean_llm_json

try:  # pragma: no cover
    import spacy  # noqa: F401
    _HAVE_SPACY = True
except ImportError:
    _HAVE_SPACY = False

try:  # pragma: no cover
    import ollama  # noqa: F401
    _HAVE_OLLAMA = True
except ImportError:
    _HAVE_OLLAMA = False

try:  # pragma: no cover
    from transformers import pipeline as _hf_pipeline  # noqa: F401
    _HAVE_TRANSFORMERS = True
except ImportError:
    _HAVE_TRANSFORMERS = False

SECTION_LABELS = [
    "contact information", "professional summary", "work experience",
    "education", "technical skills", "projects", "certifications",
    "references", "other",
]

_LABEL_KEYWORDS = {
    "contact information": ("email", "phone", "contact", "@"),
    "professional summary": ("summary", "objective", "profile", "passionate"),
    "work experience": ("experience", "worked", "company", "engineer", "managed"),
    "education": ("university", "bachelor", "master", "gpa", "degree"),
    "technical skills": ("skills", "python", "java", "sql", "docker"),
    "projects": ("project", "built", "developed", "github"),
    "certifications": ("certified", "certificate", "certification"),
    "references": ("reference", "referee"),
}

NER_ENTITY_TYPE = pa.struct(
    [("persons", pa.list_(pa.string())), ("orgs", pa.list_(pa.string())),
     ("locations", pa.list_(pa.string()))]
)

_CAP_SEQ_RE = re.compile(r"\b([A-Z][a-z]+(?: [A-Z][a-z]+)+)\b")
_ORG_RE = re.compile(
    r"\b([A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)* (?:Inc|Corp|Ltd|LLC|GmbH|University|Institute|College|Labs))\b"
)


class ZeroShotSectionClassifier:
    """A2 — classify each text against candidate section labels.

    Stub scorer: keyword-hit counts normalized to [0,1] (deterministic).
    Real backend (``backend="real"``, needs transformers): a zero-shot
    classification pipeline loaded ONCE per actor in ``__init__``; both
    backends append exactly ``OUTPUT_FIELDS`` (contract-tested), so
    swapping backends never changes the downstream schema."""

    OUTPUT_FIELDS = (("section_label", pa.string()),
                     ("section_score", pa.float64()))

    def __init__(self, text_column: str = "text", labels=None,
                 backend: str = "stub",
                 model: str = "facebook/bart-large-mnli"):
        self.text_column = text_column
        self.labels = list(labels or SECTION_LABELS)
        self.backend = backend
        if backend == "real":  # pragma: no cover — lib absent in sandbox
            if not _HAVE_TRANSFORMERS:
                raise NotImplementedError(
                    "backend='real' needs transformers, which is not "
                    "installed in this environment")
            self._pipe = _hf_pipeline("zero-shot-classification",
                                      model=model)

    def _score(self, text: str):
        if self.backend == "real":  # pragma: no cover
            out = self._pipe(text[:2000] or " ", self.labels)
            return out["labels"][0], round(float(out["scores"][0]), 6)
        low = text.lower()
        best, best_score = "other", 0.0
        for label in self.labels:
            hits = sum(low.count(k) for k in _LABEL_KEYWORDS.get(label, ()))
            score = hits / (1.0 + hits)
            if score > best_score:
                best, best_score = label, score
        return best, round(best_score, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels, scores = [], []
        for t in batch.column(self.text_column).to_pylist():
            label, score = self._score(t or "")
            labels.append(label)
            scores.append(score)
        batch = batch.append_column("section_label", pa.array(labels, pa.string()))
        return batch.append_column("section_score", pa.array(scores, pa.float64()))


class SimpleNER:
    """A1/A3 — entity extraction per document.

    Stub: capitalized-sequence persons (shape-validated via likely_name,
    parse_cv_docling.py:57-66) + suffix-based orgs; len>2 filter and
    sorted-set dedup per the reference (approach4_v1.py:160-171).  Real
    backend: spaCy en_core_web_sm loaded once per actor."""

    OUTPUT_FIELDS = (("entities", NER_ENTITY_TYPE),)

    def __init__(self, text_column: str = "text", backend: str = "stub",
                 max_chars: int = 10_000, model: str = "en_core_web_sm"):
        self.text_column = text_column
        self.max_chars = max_chars  # approach4_v1.py:152-154 truncation
        self.backend = backend
        if backend == "real":  # pragma: no cover — lib absent in sandbox
            if not _HAVE_SPACY:
                raise NotImplementedError(
                    "backend='real' needs spaCy, which is not installed "
                    "in this environment")
            self._nlp = spacy.load(model)  # once per actor

    def _entities(self, text: str) -> dict:
        text = text[: self.max_chars]
        if self.backend == "real":  # pragma: no cover
            # approach4_v1.py:149-177 — label routing + len>2 filter +
            # sorted-set dedup, identical output shape to the stub.
            doc = self._nlp(text)
            persons, orgs, locs = set(), set(), set()
            for ent in doc.ents:
                s = ent.text.strip()
                if len(s) <= 2:
                    continue
                if ent.label_ == "PERSON":
                    persons.add(s)
                elif ent.label_ == "ORG":
                    orgs.add(s)
                elif ent.label_ in ("GPE", "LOC"):
                    locs.add(s)
            return {"persons": sorted(persons), "orgs": sorted(orgs),
                    "locations": sorted(locs)}
        orgs = set(_ORG_RE.findall(text))
        persons = {
            m for m in _CAP_SEQ_RE.findall(text)
            if F.likely_name(m) and m not in orgs and len(m) > 2
        }
        return {
            "persons": sorted(persons),
            "orgs": sorted(o for o in orgs if len(o) > 2),
            "locations": [],
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ents = [self._entities(t or "") for t in batch.column(self.text_column).to_pylist()]
        return batch.append_column(
            pa.field("entities", NER_ENTITY_TYPE), pa.array(ents, NER_ENTITY_TYPE)
        )


class LlmStructuredExtractor:
    """A7 — LLM structured extraction with the reference's lifecycle:
    client + warm model in __init__, 3000-char prompt truncation, pinned
    decode options, M15 response cleanup, two-tier in-band error fallback.

    Stub model: deterministically renders the JSON an ideal model would
    return (from the regex field extractors), wrapped in markdown fences so
    the cleanup path is exercised for real."""

    DECODE_OPTIONS = {"temperature": 0.0, "top_k": 10}  # 1.py:86-97 style

    OUTPUT_FIELDS = (("llm_json", pa.large_string()),
                     ("llm_status", pa.string()))

    def __init__(self, text_column: str = "extracted_text",
                 model: str = "stub-llm", backend: str = "stub",
                 prompt_chars: int = 3000):
        if backend == "real" and not _HAVE_OLLAMA:  # pragma: no cover
            raise NotImplementedError(
                "backend='real' needs ollama, which is not installed in "
                "this environment")
        self.text_column = text_column
        self.model = model
        self.prompt_chars = prompt_chars
        self.backend = backend
        if backend == "real":  # pragma: no cover — lib absent in sandbox
            self._client = ollama.Client()  # once per actor (1.py:10-14)
        # Warmup call (1_batch.py:21-31): for the stub, a no-op generation.
        self._generate("warmup")

    def _generate(self, prompt: str) -> str:
        import json as _json

        if self.backend == "real":  # pragma: no cover
            resp = self._client.generate(model=self.model, prompt=prompt,
                                         options=self.DECODE_OPTIONS)
            return resp["response"]
        fields = F.extract_all_fields(prompt)
        payload = {
            "name": F.extract_name(prompt),
            "emails": fields["emails"],
            "phones": fields["phones"],
            "skills": fields["skills"],
        }
        return "```json\n" + _json.dumps(payload, sort_keys=True) + "\n```"

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, statuses = [], []
        import json as _json

        for t in batch.column(self.text_column).to_pylist():
            prompt = (t or "")[: self.prompt_chars]
            try:
                response = self._generate(prompt)
                obj, err = clean_llm_json(response)
                if obj is None:
                    outs.append("{}")
                    statuses.append(f"error: {err}")
                else:
                    outs.append(_json.dumps(obj, sort_keys=True))
                    statuses.append("ok")
            except Exception as exc:
                outs.append("{}")
                statuses.append(f"error: {type(exc).__name__}")
        batch = batch.append_column("llm_json", pa.array(outs, pa.large_string()))
        return batch.append_column("llm_status", pa.array(statuses, pa.string()))


def classify_sections(ds, text_column: str = "text", concurrency: int = 4, **kw):
    from ..util import pool_size

    return ds.map_batches(
        ZeroShotSectionClassifier, batch_format="pyarrow",
        concurrency=pool_size(concurrency),
        fn_constructor_kwargs=dict(text_column=text_column, **kw),
    )


def ner_entities(ds, text_column: str = "text", concurrency: int = 4, **kw):
    from ..util import pool_size

    return ds.map_batches(
        SimpleNER, batch_format="pyarrow", concurrency=pool_size(concurrency),
        fn_constructor_kwargs=dict(text_column=text_column, **kw),
    )


def llm_extract(ds, text_column: str = "extracted_text", concurrency: int = 2,
                batch_size: int = 16, **kw):
    from ..util import pool_size

    return ds.map_batches(
        LlmStructuredExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=pool_size(concurrency),
        fn_constructor_kwargs=dict(text_column=text_column, **kw),
    )
