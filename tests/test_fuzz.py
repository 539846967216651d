"""Property-based robustness: the kernels must never crash, always be
deterministic, and keep their structural invariants on arbitrary input —
poison documents become error rows only if the kernel itself raises, so the
kernel raising on weird bytes would silently degrade corpus coverage."""

from hypothesis import given, settings
from hypothesis import strategies as st

from document_text_extraction_ray.functions import dedup as D
from document_text_extraction_ray.functions import fields as F
from document_text_extraction_ray.functions import textstats as T
from document_text_extraction_ray.functions.html_extract import (
    extract_main_text,
    visible_text,
)
from document_text_extraction_ray.functions.structured import (
    clean_llm_json,
    fold_structured,
)

html_like = st.binary(max_size=2000) | st.text(max_size=2000).map(
    lambda s: s.encode("utf-8", "replace")
)


@settings(max_examples=150, deadline=None)
@given(html_like)
def test_extract_never_crashes_and_is_deterministic(data):
    text1, spans1 = extract_main_text(data)
    text2, spans2 = extract_main_text(data)
    assert text1 == text2 and spans1 == spans2
    for start, end, kind in spans1:
        assert 0 <= start <= end <= len(data)
        assert isinstance(kind, str)
    # Normalization invariant: blocks carry no edge whitespace or runs.
    for block in text1.split("\n\n"):
        assert block == " ".join(block.split())


@settings(max_examples=100, deadline=None)
@given(html_like)
def test_visible_text_superset_property(data):
    visible = visible_text(data)
    assert visible == visible_text(data)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1000))
def test_fields_never_crash_outputs_sorted(text):
    out = F.extract_all_fields(text)
    for key, vals in out.items():
        assert vals == sorted(vals), key
        assert len(set(vals)) == len(vals), key
    assert isinstance(F.extract_name(text), str)
    assert isinstance(F.extract_address(text), str)
    F.segment_sections(text)
    F.chunk_paragraphs(text)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_textstats_invariants(text):
    assert 0 <= T.quality_score(text)["score"] <= 1
    assert T.detect_language(text) in set(T.STOPWORDS) | {"und"}
    assert T.count_tokens_ws(text) == len(text.split())
    h = T.content_hash(text)
    assert 0 <= h < 2 ** 63


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=500), st.text(max_size=500))
def test_dedup_kernel_invariants(a, b):
    assert 0.0 <= D.ngram_jaccard(a, b) <= 1.0
    assert D.ngram_jaccard(a, a) == 1.0
    sig = D.minhash_signature(a)
    assert sig.shape == (128,)
    assert (sig == D.minhash_signature(a)).all()
    assert 0 <= D.simhash(a) < 2 ** 64
    assert D.hamming64(D.simhash(a), D.simhash(a)) == 0


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_structured_fold_total(text):
    out = fold_structured(text)
    assert set(out) == {
        "name", "contact", "summary", "experience", "education",
        "skills", "references",
    }
    obj, err = clean_llm_json(text)
    assert (obj is None) == bool(err)
