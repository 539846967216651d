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


CV_GRAPH_TEXT = (
    "Jane Mary Doe\n"
    "jane@x.com +12345678901 linkedin.com/in/janedoe\n"
    "SUMMARY\nBuilds distributed systems.\n"
    "EXPERIENCE\nSenior Engineer\nAcme Corp\nJan 2020 - Dec 2022\n"
    "- shipped the pipeline\n- led a team of four\n"
    "Lead Developer\nBeta Inc\n2023 - Present\n"
    "EDUCATION\nMaster Of Science\nState University\n2016 - 2018\n"
    "SKILLS\n- Python, SQL | Docker\n"
    "PROJECTS\nBuilt a crawler for fun.\n"
    "REFERENCES\nAvailable on request\n"
)


def test_fold_structured_graph_reference_shape():
    """M16: the $ref-graph walk reproduces the reference's structured-CV
    shape (parse_cv_docling.py:91-210) from a docling-style block graph."""
    from document_text_extraction_ray.functions.structured import (
        fold_structured_graph,
        text_to_block_graph,
    )

    g = text_to_block_graph(CV_GRAPH_TEXT)
    assert any(t["label"] == "section_header" for t in g["texts"])
    assert any(grp["name"] == "list" for grp in g["groups"])
    r = fold_structured_graph(g)
    assert r["name"] == "Jane Mary Doe"
    assert r["contact"]["email"] == "jane@x.com"
    assert r["contact"]["phone"] == "+12345678901"
    assert r["contact"]["linkedin"] == "https://linkedin.com/in/janedoe"
    assert r["summary"] == "Builds distributed systems."
    assert [j["title"] for j in r["experience"]] == [
        "Senior Engineer", "Lead Developer"]
    assert r["experience"][0]["company"] == "Acme Corp"
    assert r["experience"][0]["dates"] == "Jan 2020 - Dec 2022"
    assert r["experience"][0]["bullets"] == [
        "shipped the pipeline", "led a team of four"]
    assert r["education"] == [{"degree": "Master Of Science",
                               "institution": "State University",
                               "dates": "2016 - 2018", "details": []}]
    assert r["skills"] == ["Docker", "Python", "SQL"]
    assert r["projects"] == [{"name": "", "description": "Built a crawler for fun."}]
    assert r["references"] == ["Available on request"]


def test_export_markdown():
    """S9: markdown QA artifact from the block graph."""
    from document_text_extraction_ray.functions.structured import (
        export_markdown,
        text_to_block_graph,
    )

    md = export_markdown(text_to_block_graph(CV_GRAPH_TEXT))
    assert "## SUMMARY" in md and "## EXPERIENCE" in md
    assert "- shipped the pipeline" in md
    assert "Builds distributed systems." in md


def test_extract_projects_reference_scan():
    """M11: stateful projects-section scan (approach4_v2.py:195-218)."""
    from document_text_extraction_ray.functions.fields import extract_projects

    text = (
        "Intro line\nProjects\n"
        "Crawler that indexes docs\nacross many sites\n"
        "Tech Stack: Python, Ray\n"
        "Search engine frontend\n"
        "Tech Stack: React\n"
    )
    got = extract_projects(text)
    assert got[0] == "Crawler that indexes docs across many sites"
    assert got[1] == "Tech Stack: Python, Ray"
    assert got[2] == "Search engine frontend"
    assert got[3] == "Tech Stack: React"
    # cap at 5
    many = "Projects\n" + "\n".join(f"Tech Stack: {i}" for i in range(9))
    assert len(extract_projects(many)) == 5
    # a trailing project with no 'tech stack' line is DISCARDED, matching
    # the reference's scan which never flushes the final accumulator
    assert extract_projects("Projects\nBuilt a compiler") == []
