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
