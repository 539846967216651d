"""Structured fold (M16 analogue), LLM-JSON cleaner (M15), model stages."""

import json

import ray.data

from document_text_extraction_ray.functions.structured import clean_llm_json, fold_structured
from document_text_extraction_ray.stages.models import (
    classify_sections,
    llm_extract,
    ner_entities,
)

CV_TEXT = """John Michael Smith
Passionate software developer with a decade of experience.
WORK EXPERIENCE
Senior Engineer
March 2019 - present
- built data pipelines
- led a team of four
Data Analyst
2015 - 2019
- dashboards and reports
EDUCATION
Bachelor Of Science
2011 - 2015
- graduated with honors, GPA: 3.8
SKILLS
Python, SQL | Docker
REFERENCES
available upon request"""


def test_fold_structured():
    out = fold_structured(CV_TEXT)
    assert out["name"] == "John Michael Smith"
    assert "Passionate software developer" in out["summary"]
    assert [e["title"] for e in out["experience"]] == ["Senior Engineer", "Data Analyst"]
    assert out["experience"][0]["dates"] == "March 2019 - present"
    assert out["experience"][0]["bullets"] == ["built data pipelines", "led a team of four"]
    assert out["education"][0]["degree"] == "Bachelor Of Science"
    assert out["skills"] == ["Docker", "Python", "SQL"]
    assert out["references"] == ["available upon request"]
    assert out["contact"]["gpa"] == ["3.8"]


def test_fold_structured_deterministic_and_safe():
    assert fold_structured(CV_TEXT) == fold_structured(CV_TEXT)
    assert fold_structured("")["name"] == ""


def test_clean_llm_json():
    obj, err = clean_llm_json('```json\n{"a": 1}\n```')
    assert obj == {"a": 1} and err == ""
    obj, err = clean_llm_json('json {"b": [1, 2]} trailing')
    assert obj == {"b": [1, 2]}
    obj, err = clean_llm_json("no json here")
    assert obj is None and "no JSON" in err
    obj, err = clean_llm_json("{broken json")
    assert obj is None


def test_classify_sections_stage():
    ds = ray.data.from_items(
        [
            {"sid": 0, "text": "University education: bachelor degree, GPA strong"},
            {"sid": 1, "text": "skills: python sql docker"},
            {"sid": 2, "text": "zxqw vvkpl"},
        ]
    )
    out = classify_sections(ds, concurrency=1).to_pandas().sort_values("sid")
    assert out["section_label"].tolist() == ["education", "technical skills", "other"]
    assert (out["section_score"] >= 0).all()


def test_ner_entities_stage():
    ds = ray.data.from_items(
        [{"sid": 0, "text": "Jane Doe worked at Acme Corp with Bob Smith."}]
    )
    out = ner_entities(ds, concurrency=1).to_pandas()
    ents = out["entities"][0]
    assert "Jane Doe" in list(ents["persons"]) and "Bob Smith" in list(ents["persons"])
    assert "Acme Corp" in list(ents["orgs"])


def test_llm_extract_stage():
    ds = ray.data.from_items(
        [{"sid": 0, "extracted_text": "Jane Doe\njane@x.io knows python"}]
    )
    out = llm_extract(ds, concurrency=1).to_pandas()
    assert out["llm_status"][0] == "ok"
    obj = json.loads(out["llm_json"][0])
    assert obj["emails"] == ["jane@x.io"]
    assert obj["name"] == "Jane Doe"


def test_flatten_structured():
    from document_text_extraction_ray.functions.structured import flatten_structured

    flat = flatten_structured(fold_structured(CV_TEXT))
    assert flat["Name"] == "John Michael Smith"
    assert flat["Skills"] == "Docker, Python, SQL"
    assert "Senior Engineer (March 2019 - present)" in flat["Experience"]
    assert "Data Analyst" in flat["Experience"] and " | " in flat["Experience"]
    assert flat["Education"].startswith("Bachelor Of Science")
    assert flatten_structured({})["Name"] == ""
