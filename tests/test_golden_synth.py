"""Golden parity: the extractor must reproduce the generator's recorded
main content byte-identically, per url, including spans (FIXTURES.md §1.2)."""

import html as _html

from document_text_extraction_ray.functions.html_extract import extract_main_text
from document_text_extraction_ray.sources.synth import synth_page

N = 400  # sf-small scale


def test_golden_byte_identity():
    for i in range(N):
        row = synth_page(i, seed=42)
        text, spans = extract_main_text(row["html"])
        assert text == row["expected_text"], f"text mismatch at row {i}"
        exp = [(s["start"], s["end"], s["kind"]) for s in row["expected_spans"]]
        assert spans == exp, f"span mismatch at row {i}"


def test_spans_slice_back_to_block_text():
    """Each span, sliced from the ORIGINAL html bytes (inline tags stripped),
    normalizes to the corresponding block of extracted text."""
    import re

    tag = re.compile(rb"<[^>]*>")
    for i in range(0, N, 7):
        row = synth_page(i, seed=42)
        text, spans = extract_main_text(row["html"])
        blocks = text.split("\n\n")
        assert len(blocks) == len(spans)
        for block, (s, e, _) in zip(blocks, spans):
            raw = _html.unescape(tag.sub(b" ", row["html"][s:e]).decode("utf-8"))
            assert " ".join(raw.split()) == block


def test_title_golden():
    from document_text_extraction_ray.functions.html_extract import extract_page

    for i in range(0, N, 5):
        row = synth_page(i, seed=42)
        assert extract_page(row["html"])["title"] == row["expected_title"], i


def test_generation_is_order_independent():
    a = synth_page(123, seed=42)
    b = synth_page(123, seed=42)
    assert a["html"] == b["html"] and a["url"] == b["url"]
    assert synth_page(123, seed=7)["html"] != a["html"]


def test_planted_entities_found():
    """Emails/gpa planted by the generator are recovered by the field suite
    (filler vocabulary cannot produce false regex matches for these kinds)."""
    found_email = found_gpa = 0
    for i in range(N):
        row = synth_page(i, seed=42)
        f = row["expected_fields"]
        found_email += len(f["emails"])
        found_gpa += len(f["gpa"])
        for em in f["emails"]:
            assert em in row["expected_text"]
    assert found_email > 0 and found_gpa > 0


def test_skew_tail_exists():
    sizes = [len(synth_page(i, seed=42)["html"]) for i in range(1000)]
    sizes.sort()
    median = sizes[len(sizes) // 2]
    assert sizes[-1] > 10 * median, "skewed giant-page tail missing"
