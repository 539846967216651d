"""Structured-document assembly: the ordered per-document fold that turns
extracted text into a nested structured record.

This is the Ray-side analogue of the reference's docling-tree fold
(M16, /root/reference/parse_cv_docling.py:91-210): walk the document's
blocks/lines IN ORDER with mutable fold state (current section, pending
entry), dispatch on line kind (header vs content vs date-like), flush
accumulated entries on section change.  Per-row and sequential by design —
never vectorize, never a dataset-level sort (SURVEY.md §7.5 item 4).

Also M15 (llm_approach/1.py:46-65): the LLM-JSON response cleaner, a pure
function usable after any model stage.
"""

from __future__ import annotations

import json
import re

from . import fields as F

JSON_BLOB_RE = re.compile(r"(\{.*\}|\[.*\])", re.DOTALL)
FENCE_RE = re.compile(r"^```(?:json)?\s*|\s*```$", re.MULTILINE)


def clean_llm_json(response: str):
    """M15 — strip markdown fences / 'json' prefixes, locate the first JSON
    object/array, parse it.  Returns (obj, error) — in-band error, never
    raises (the reference's two-tier fallback, 1.py:100-115)."""
    try:
        cleaned = FENCE_RE.sub("", response).strip()
        if cleaned.lower().startswith("json"):
            cleaned = cleaned[4:].strip()
        m = JSON_BLOB_RE.search(cleaned)
        if not m:
            return None, "no JSON object found"
        return json.loads(m.group(1)), ""
    except json.JSONDecodeError as exc:
        return None, f"JSONDecodeError: {exc}"
    except Exception as exc:  # defensive: cleaner must never throw
        return None, f"{type(exc).__name__}: {exc}"


def _flush_entry(state: dict, out: dict) -> None:
    entry = state.get("entry")
    if not entry:
        return
    section = state.get("entry_section")
    if section == "experience" and (entry.get("title") or entry.get("bullets")):
        out["experience"].append(
            {
                "title": entry.get("title", ""),
                "dates": entry.get("dates", ""),
                "bullets": list(entry.get("bullets", [])),
            }
        )
    elif section == "education" and (entry.get("title") or entry.get("bullets")):
        out["education"].append(
            {
                "degree": entry.get("title", ""),
                "dates": entry.get("dates", ""),
                "details": list(entry.get("bullets", [])),
            }
        )
    state["entry"] = None


def fold_structured(text: str) -> dict:
    """Ordered fold over a document's lines -> nested structured record.

    Fold state mirrors parse_cv_docling.py:108-129: ``current_section``,
    ``saw_name``, a pending experience/education entry with flush-on-boundary.
    Output shape follows the reference's structured CV (SURVEY.md §1.1
    'Structured CV (output)'), deterministic ordering throughout.
    """
    out = {
        "name": "",
        "contact": F.extract_all_fields(text),
        "summary": "",
        "experience": [],
        "education": [],
        "skills": [],
        "references": [],
    }
    state: dict = {"section": "preamble", "entry": None, "entry_section": None,
                   "saw_name": False}
    summary_lines: list = []
    skills_items: list = []

    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        if F._is_section_header(line):
            _flush_entry(state, out)
            state["section"] = F._normalize_section_name(line)
            continue
        section = state["section"]
        if not state["saw_name"] and section == "preamble" and F.likely_name(line):
            out["name"] = line
            state["saw_name"] = True
            continue
        if section in ("preamble", "summary"):
            summary_lines.append(line)
        elif section in ("experience", "education"):
            if F.is_date_like(line) and state["entry"] is not None:
                state["entry"]["dates"] = line
            elif state["entry"] is None or (
                line == line.title() and len(line) < 60 and not line.startswith(("-", "•"))
            ):
                _flush_entry(state, out)
                state["entry"] = {"title": line, "dates": "", "bullets": []}
                state["entry_section"] = section
            else:
                state["entry"]["bullets"].append(line.lstrip("-• ").strip())
        elif section == "skills":
            skills_items.append(line)
        elif section == "references":
            out["references"].append(line)
    _flush_entry(state, out)

    out["summary"] = " ".join(summary_lines)
    out["skills"] = F.split_skills(skills_items) if skills_items else out["contact"]["skills"]
    return out


def flatten_structured(record: dict) -> dict:
    """S7 — flatten a nested structured record into the reference's flat
    CSV-row shape (llm_approach/1_batch.py:141-179: pipe-joined experience/
    education, comma-joined skills; in-band empty strings for missing)."""
    contact = record.get("contact", {})

    def _fmt_exp(entries):
        if not entries or not isinstance(entries, list):
            return ""
        out = []
        for e in entries:
            if isinstance(e, dict):
                out.append(f"{e.get('title', '')} ({e.get('dates', '')})")
        return " | ".join(out)

    def _fmt_edu(entries):
        if not entries or not isinstance(entries, list):
            return ""
        out = []
        for e in entries:
            if isinstance(e, dict):
                out.append(f"{e.get('degree', '')} ({e.get('dates', '')})")
        return " | ".join(out)

    def _join(vals):
        return ", ".join(vals) if isinstance(vals, list) else str(vals or "")

    return {
        "Name": record.get("name", ""),
        "Emails": _join(contact.get("emails", [])),
        "Phones": _join(contact.get("phones", [])),
        "LinkedIn": _join(contact.get("linkedin", [])),
        "GitHub": _join(contact.get("github", [])),
        "Skills": _join(record.get("skills", [])),
        "Experience": _fmt_exp(record.get("experience", [])),
        "Education": _fmt_edu(record.get("education", [])),
        "Summary_Length": len(record.get("summary", "")),
    }


# ------------------------------------------------- M16: block-graph fold
# The reference's most intricate operator: an ordered walk of the docling
# document model's body.children $refs with node-label dispatch
# (/root/reference/parse_cv_docling.py:83-210).  The graph shape:
#   doc = {"body": {"children": [{"$ref": "#/texts/0"}, ...]},
#          "texts": [{"self_ref": "#/texts/0", "label": ..., "text": ...}],
#          "groups": [{"self_ref": "#/groups/0", "name": "list",
#                      "children": [{"$ref": "#/texts/3"}, ...]}]}

TOP_SECTIONS = {
    "SUMMARY": "summary",
    "WORK EXPERIENCE": "experience",
    "EXPERIENCE": "experience",
    "EDUCATION": "education",
    "KEY SKILLS": "skills",
    "SKILLS": "skills",
    "PROJECTS": "projects",
    "CERTIFICATES": "certifications",
    "CERTIFICATIONS": "certifications",
    "REFEREES": "references",
    "REFERENCES": "references",
}

_NON_PHONE_RE = re.compile(r"[^\d\+]")
_PHONEISH_RE = re.compile(r"[\+()]?[\d\s\-]{8,}")


def parse_contact_line(line: str) -> dict:
    """Contact fields from one line (parse_cv_docling.py:34-56 semantics):
    first email/linkedin/github hit, phone kept only when >= 10 digits after
    stripping separators; https:// prefixed onto bare profile urls."""
    out: dict = {}
    emails = F.EMAIL_RE.findall(line)
    if emails:
        out["email"] = emails[0]
    phones = _PHONEISH_RE.findall(line)
    if phones:
        cleaned = _NON_PHONE_RE.sub("", phones[0])
        if len(cleaned) >= 10:
            out["phone"] = cleaned
    low = line.lower()
    li = F.LINKEDIN_RE.findall(low)
    if li:
        out["linkedin"] = li[0] if li[0].startswith("http") else "https://" + li[0]
    gh = F.GITHUB_RE.findall(low)
    if gh:
        out["github"] = gh[0] if gh[0].startswith("http") else "https://" + gh[0]
    return out


def _deref(ref: dict, texts_by_ref: dict, groups_by_ref: dict):
    key = ref.get("$ref", "")
    if key.startswith("#/texts/"):
        return texts_by_ref.get(key)
    if key.startswith("#/groups/"):
        return groups_by_ref.get(key)
    return None


def fold_structured_graph(doc: dict) -> dict:
    """Ordered fold over a docling-style BLOCK GRAPH -> structured record
    (parse_cv_docling.py:91-210 semantics re-expressed).

    Dispatch per node: section_header (name detection -> canonical section ->
    per-section entry start), text (contact capture, summary append,
    dates/company/institution slotting), list groups (bullets / details /
    skills).  Mutable fold state with flush-on-boundary — per-document and
    sequential by design; parallelism comes from running one fold per row
    inside map_batches."""
    texts_by_ref = {t["self_ref"]: t for t in doc.get("texts", [])}
    groups_by_ref = {g["self_ref"]: g for g in doc.get("groups", [])}

    out = {
        "name": "",
        "contact": {},
        "summary": "",
        "experience": [],
        "education": [],
        "skills": [],
        "projects": [],
        "certifications": [],
        "references": [],
    }
    state = {"section": None, "saw_name": False, "job": None, "edu": None}

    def flush_job():
        job = state["job"]
        if job and (any(job.get(k) for k in ("title", "company", "dates"))
                    or job.get("bullets")):
            job.setdefault("bullets", [])
            out["experience"].append(job)
        state["job"] = None

    def flush_edu():
        edu = state["edu"]
        if edu and (any(edu.get(k) for k in ("degree", "institution", "dates"))
                    or edu.get("details")):
            edu.setdefault("details", [])
            out["education"].append(edu)
        state["edu"] = None

    for child_ref in doc.get("body", {}).get("children", []):
        node = _deref(child_ref, texts_by_ref, groups_by_ref)
        if not node:
            continue
        label = node.get("label")
        text = (node.get("text") or "").strip()

        if label == "section_header":
            if not state["saw_name"] and F.likely_name(text):
                out["name"] = text
                state["saw_name"] = True
                state["section"] = None
                continue
            canonical = TOP_SECTIONS.get(text.upper())
            if canonical:
                flush_job()
                flush_edu()
                state["section"] = canonical
                continue
            if state["section"] == "experience":
                flush_job()
                state["job"] = {"title": text, "company": "", "dates": "",
                                "bullets": []}
            elif state["section"] == "education":
                flush_edu()
                state["edu"] = {"degree": text, "institution": "", "dates": "",
                                "details": []}

        elif label == "text":
            if state["saw_name"] and not out["contact"]:
                c = parse_contact_line(text)
                if c:
                    out["contact"] = c
            section = state["section"]
            if section == "summary":
                out["summary"] = (out["summary"] + " " + text).strip()
            elif section == "experience" and state["job"] is not None:
                if F.is_date_like(text):
                    state["job"]["dates"] = text
                elif not state["job"]["company"] and len(text.split()) <= 10:
                    state["job"]["company"] = text
            elif section == "education" and state["edu"] is not None:
                if F.is_date_like(text):
                    state["edu"]["dates"] = text
                elif not state["edu"]["institution"]:
                    state["edu"]["institution"] = text
                else:
                    state["edu"]["details"].append(text)
            elif section == "projects" and text:
                out["projects"].append({"name": "", "description": text})
            elif section == "certifications" and text:
                out["certifications"].append(text)
            elif section == "references" and text:
                out["references"].append(text)

        elif node.get("name") == "list":
            items = []
            for li_ref in node.get("children", []):
                li = _deref(li_ref, texts_by_ref, groups_by_ref)
                if li and li.get("label") == "list_item":
                    items.append((li.get("text") or "").strip())
            section = state["section"]
            if section == "experience" and state["job"] is not None:
                state["job"]["bullets"].extend(items)
            elif section == "education" and state["edu"] is not None:
                state["edu"]["details"].extend(items)
            elif section == "skills":
                out["skills"].extend(F.split_skills(items))

    flush_job()
    flush_edu()
    out["skills"] = sorted({s for s in out["skills"] if s and len(s) <= 40})
    return out


def text_to_block_graph(text: str) -> dict:
    """Deterministic docling-style block graph from plain text — the
    sandbox's stand-in for the docling converter (A6): ALL-CAPS short lines
    and likely-name lines become section_header nodes, bullet runs fold into
    list groups, everything else becomes text nodes.  Lets the graph fold run
    over the synthetic corpora end-to-end."""
    texts, groups, children = [], [], []
    bullet_run: list = []

    def flush_bullets():
        if not bullet_run:
            return
        item_refs = []
        for item in bullet_run:
            ref = f"#/texts/{len(texts)}"
            texts.append({"self_ref": ref, "label": "list_item", "text": item})
            item_refs.append({"$ref": ref})
        gref = f"#/groups/{len(groups)}"
        groups.append({"self_ref": gref, "name": "list", "children": item_refs})
        children.append({"$ref": gref})
        bullet_run.clear()

    first_content = True
    section = None
    at_entry_boundary = False  # right after a section header / dates / list
    had_bullets = False
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        if line.startswith(("-", "•", "*")):
            bullet_run.append(line.lstrip("-•* ").strip())
            had_bullets = True
            continue
        if had_bullets:
            flush_bullets()
            had_bullets = False
            at_entry_boundary = True
        is_header = (
            (line.isupper() and len(line) < 50)
            or line.upper() in TOP_SECTIONS
            or (first_content and F.likely_name(line))
        )
        if line.upper() in TOP_SECTIONS:
            section = TOP_SECTIONS[line.upper()]
            at_entry_boundary = True
        elif not is_header and section in ("experience", "education"):
            # Sub-header = the entry TITLE: a short title-case, non-date
            # line at an entry boundary (docling labels entry titles as
            # headers; companies/institutions stay text nodes).
            if (at_entry_boundary and line == line.title() and len(line) < 60
                    and not F.is_date_like(line)):
                is_header = True
            at_entry_boundary = F.is_date_like(line)
        ref = f"#/texts/{len(texts)}"
        texts.append({
            "self_ref": ref,
            "label": "section_header" if is_header else "text",
            "text": line,
        })
        children.append({"$ref": ref})
        first_content = False
    flush_bullets()
    return {"body": {"children": children}, "texts": texts, "groups": groups}


def export_markdown(doc: dict) -> str:
    """S9 — markdown rendering of a block graph (the reference writes
    docling's export_to_markdown as a human-QA artifact,
    parse_cv_docling.py:235-236): section headers -> '## ', list items ->
    '- ', text nodes verbatim, blocks separated by blank lines."""
    texts_by_ref = {t["self_ref"]: t for t in doc.get("texts", [])}
    groups_by_ref = {g["self_ref"]: g for g in doc.get("groups", [])}
    parts = []
    for child_ref in doc.get("body", {}).get("children", []):
        node = _deref(child_ref, texts_by_ref, groups_by_ref)
        if not node:
            continue
        if node.get("label") == "section_header":
            parts.append("## " + (node.get("text") or ""))
        elif node.get("label") == "text":
            parts.append(node.get("text") or "")
        elif node.get("name") == "list":
            items = []
            for li_ref in node.get("children", []):
                li = _deref(li_ref, texts_by_ref, groups_by_ref)
                if li and li.get("label") == "list_item":
                    items.append("- " + (li.get("text") or ""))
            if items:
                parts.append("\n".join(items))
    return "\n\n".join(parts)
