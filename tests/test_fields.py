"""Unit tests for field extractors M1-M13 — reference regex semantics
(file:line cites in functions/fields.py docstrings)."""

from document_text_extraction_ray.functions import fields as F


def test_emails():
    t = "Contact me at john.doe+cv@example-mail.co.uk or admin@test.io today"
    assert F.extract_emails(t) == ["admin@test.io", "john.doe+cv@example-mail.co.uk"]
    assert F.extract_emails("no emails here") == []


def test_phones():
    t = "Call +1-555-123-4567 or (071) is wrong but 555-123-9999 works"
    out = F.extract_phones(t)
    assert "+1-555-123-4567" in out
    assert "555-123-9999" in out
    # len>=7 filter drops short fragments
    assert all(len(p) >= 7 for p in out)


def test_linkedin_github():
    t = "See LinkedIn.com/in/Jane-Doe and GITHUB.com/janedoe42 now"
    assert F.extract_linkedin(t) == ["linkedin.com/in/jane-doe"]
    assert F.extract_github(t) == ["github.com/janedoe42"]


def test_name_positional():
    t = "John Michael Smith\nSoftware Engineer\njohn@x.com"
    assert F.extract_name(t) == "John Michael Smith"
    assert F.extract_name("a\nb\nc\nd\ne\nJohn Smith") == ""  # beyond 5 lines


def test_likely_name():
    assert F.likely_name("Jane O'Brien-Smith")
    assert not F.likely_name("Jane")                # 1 word
    assert not F.likely_name("Work Experience")     # section keyword
    assert not F.likely_name("x " * 40)             # too long


def test_address():
    t = "John Smith\nAddress: 42 Elm Street, Springfield, IL 62704\nmore"
    out = F.extract_address(t)
    assert "42 Elm Street" in out and "Springfield" in out


def test_skills_substring_vocab():
    t = "Experienced in Python, Docker and machine learning pipelines"
    out = F.extract_skills(t)
    assert "Python" in out and "Docker" in out and "Machine Learning" in out
    assert out == sorted(out)


def test_split_skills():
    out = F.split_skills(["Python, Java | C++ • SQL; a"])
    assert out == ["C++", "Java", "Python", "SQL"]  # 'a' too short, sorted+dedup


def test_education():
    t = "Bachelor of Science, University of Somewhere, GPA: 3.72"
    edu = F.extract_education(t)
    assert "bachelor" in edu["degrees"]
    assert edu["institutions"] == ["University of Somewhere"]
    assert edu["gpa"] == ["3.72"]


def test_experience_years():
    assert F.extract_experience_years("over 5 years of experience in x") == ["5"]
    assert F.extract_experience_years("experience: 12 years") == ["12"]


def test_date_like():
    assert F.is_date_like("March 2019 - present")
    assert F.is_date_like("2021")
    assert not F.is_date_like("no time tokens")


def test_segment_sections():
    t = "John Smith\nintro line\nWORK EXPERIENCE\nacme corp\nEducation\nuni x"
    sections = F.segment_sections(t)
    names = [n for n, _ in sections]
    assert names == ["preamble", "experience", "education"]
    assert sections[1][1] == "acme corp"


def test_chunk_paragraphs():
    t = "first paragraph long enough to keep\n\nsecond paragraph also long enough"
    assert len(F.chunk_paragraphs(t)) == 2
    # fallback greedy merge
    t2 = "\n".join(["short line"] * 20)
    chunks = F.chunk_paragraphs(t2)
    assert chunks and all(len(c) >= 100 or c == chunks[-1] for c in chunks)


def test_extract_all_fields_shape():
    out = F.extract_all_fields("jane@x.io knows python, GPA: 3.5, Bachelor deg")
    assert set(out) == {"emails", "phones", "linkedin", "github", "skills", "degrees", "gpa"}
    assert out["emails"] == ["jane@x.io"]
