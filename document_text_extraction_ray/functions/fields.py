"""Field extractors M1-M13 (SURVEY.md §2.2): pure ``text -> value`` functions
with the reference's exact regex/keyword semantics.

Parity notes (reference file:line):
  - emails            /root/reference/approach4_v1.py:48-49
  - phones            /root/reference/approach4_v1.py:51-65
  - linkedin/github   /root/reference/approach4_v1.py:69-73
  - name (positional) /root/reference/approach4_v2.py:27-37
  - name (shape)      /root/reference/parse_cv_docling.py:57-66
  - address           /root/reference/approach4_v2.py:70-85
  - skills (keyword)  /root/reference/approach4_v1.py:85-109
  - skills (split)    /root/reference/parse_cv_docling.py:74-81
  - education         /root/reference/approach4_v1.py:111-127, approach4_v2.py:122-162
  - experience        /root/reference/approach4_v1.py:129-147
  - date-like         /root/reference/parse_cv_docling.py:68-72
  - sections          /root/reference/new_approaches/final.py:120-186
  - GPA               /root/reference/approach4_v2.py:150-155 style

One deliberate deviation: the reference uses ``list(set(...))`` whose order is
process-dependent; we use ``sorted(set(...))`` everywhere (the deterministic
ordering the reference itself uses for skills, parse_cv_docling.py:81), so
output is byte-stable under Ray's parallel, retry-prone execution.
All regexes are compiled once at import (module constants) so map_batches
tasks pay no per-batch compile cost.
"""

from __future__ import annotations

import re

EMAIL_RE = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")

PHONE_RES = [
    re.compile(r"\+\d{1,3}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,9}"),  # international
    re.compile(r"\(\d{3}\)[-.\s]?\d{3}[-.\s]?\d{4}"),                    # (123) 456-7890
    re.compile(r"\d{3}[-.\s]?\d{3}[-.\s]?\d{4}"),                        # 123-456-7890
    re.compile(r"\d{10,}"),                                               # bare digits
]

LINKEDIN_RE = re.compile(r"linkedin\.com/in/[\w-]+")
GITHUB_RE = re.compile(r"github\.com/[\w-]+")

NAME_LINE_RE = re.compile(r"^[A-Za-z\s]+$")
NAME_WORD_RE = re.compile(r"^[A-Za-z'.\-]+$")
SECTION_KEYWORDS = (
    "experience", "education", "skills", "projects", "summary",
    "referees", "references",
)

SKILL_KEYWORDS = [
    "python", "java", "javascript", "react", "nodejs", "sql", "mysql",
    "postgresql", "mongodb", "docker", "kubernetes", "aws", "azure",
    "git", "html", "css", "angular", "vue", "django", "flask",
    "machine learning", "data analysis", "excel", "tableau", "powerbi",
    "c++", "c#", "php", "ruby", "swift", "kotlin", "go", "rust",
    "tensorflow", "pytorch", "pandas", "numpy", "scikit-learn",
    "jenkins", "ci/cd", "agile", "scrum", "jira", "confluence",
    "linux", "windows", "macos", "bash", "powershell",
]

SKILL_SPLIT_RE = re.compile(r"[,\|/•;]+")
SKILL_TOKEN_RE = re.compile(r"^[A-Za-z0-9\.\+#\-\s]+$")

# Case-sensitive patterns applied to text.lower(): identical match set to the
# reference's IGNORECASE originals (matches are lowercased anyway), but ~2x
# faster (no per-char case folding) and the lowered string is shared across
# extractors in extract_all_fields.
DEGREE_RES = [
    re.compile(
        r"\b(bachelor|master|phd|doctorate|diploma|certificate"
        r"|b\.?\s*[a-z]+|m\.?\s*[a-z]+|ph\.?\s*d\.?)\b"
    ),
    re.compile(r"\b(undergraduate|graduate|postgraduate)\b"),
]
GPA_RE = re.compile(r"(?:gpa|cgpa)[:\s]*([0-9]\.[0-9]+)")
INSTITUTION_RE = re.compile(r"\b(?:University|Institute|College) of [A-Z][A-Za-z ]+")

EXPERIENCE_RES = [
    re.compile(r"(\d+)[\s\-\+]*year[s]?[\s]*(?:of\s)?(?:experience|exp)", re.IGNORECASE),
    re.compile(r"(\d+)[\s\-\+]*yr[s]?[\s]*(?:of\s)?(?:experience|exp)", re.IGNORECASE),
    re.compile(r"experience[:\s]*(\d+)[\s]*year[s]?", re.IGNORECASE),
    re.compile(r"(\d+)[\s]*year[s]?[\s]*experience", re.IGNORECASE),
]

DATE_YEAR_RE = re.compile(r"\b(19|20)\d{2}\b")
MONTH_TOKENS = (
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
)

SECTION_CANON = {
    "summary": ("summary", "objective", "profile", "about"),
    "experience": ("experience", "employment", "work history", "career"),
    "education": ("education", "academic", "qualification"),
    "skills": ("skills", "technologies", "tech stack", "competencies"),
    "projects": ("projects", "portfolio"),
    "certifications": ("certifications", "certificates", "licenses"),
    "references": ("references", "referees"),
    "contact": ("contact", "personal details"),
}


def extract_emails(text: str) -> list:
    """M1 — approach4_v1.py:48-49.  The '@' guard is implied by the regex
    (it cannot match without one), so '@'-free documents — most of a web
    corpus — skip the scan entirely (profiled kernel win)."""
    if "@" not in text:
        return []
    return sorted(set(EMAIL_RE.findall(text)))


_DIGIT_RE = re.compile(r"\d")


def extract_phones(text: str) -> list:
    """M2 — approach4_v1.py:51-65 (4 alternative patterns, len>=7 filter).
    Guard is regex-implied (every pattern needs a digit)."""
    if _DIGIT_RE.search(text) is None:
        return []
    phones = []
    for pat in PHONE_RES:
        phones.extend(pat.findall(text))
    return sorted({p.strip() for p in phones if len(p.strip()) >= 7})


def extract_linkedin(text: str, _low: str | None = None) -> list:
    """M3 — approach4_v1.py:69-70 (match on lowercased text).  Guard is
    regex-implied ('linkedin' literal prefix)."""
    low = _low if _low is not None else text.lower()
    if "linkedin" not in low:
        return []
    return sorted(set(LINKEDIN_RE.findall(low)))


def extract_github(text: str, _low: str | None = None) -> list:
    """M3 — approach4_v1.py:72-73.  Guard is regex-implied."""
    low = _low if _low is not None else text.lower()
    if "github" not in low:
        return []
    return sorted(set(GITHUB_RE.findall(low)))


def extract_name(text: str) -> str:
    """M4 — approach4_v2.py:27-37: first 5 lines, 5<len<50, no @/+, letters+spaces."""
    for line in text.split("\n")[:5]:
        line = line.strip()
        if 5 < len(line) < 50 and "@" not in line and "+" not in line:
            if NAME_LINE_RE.match(line):
                return line
    return ""


def likely_name(text: str) -> bool:
    """M5 — parse_cv_docling.py:57-66."""
    t = text.strip()
    if not t or len(t) > 60:
        return False
    words = t.split()
    if not (2 <= len(words) <= 5):
        return False
    if any(k in t.lower() for k in SECTION_KEYWORDS):
        return False
    return all(NAME_WORD_RE.match(w) for w in words)


def extract_address(text: str) -> str:
    """M6 — approach4_v2.py:70-85: scan first 10 lines for address markers."""
    for line in text.split("\n")[:10]:
        if any(k in line.lower() for k in ("contact details:", "address:")):
            address_parts = []
            for part in line.split(","):
                part = part.strip()
                if "@" not in part and "+" not in part and "contact" not in part.lower():
                    if len(part) > 3:
                        address_parts.append(part)
            return ", ".join(address_parts)
    return ""


def extract_skills(text: str, _low: str | None = None) -> list:
    """M7 — approach4_v1.py:85-109: substring match against fixed vocabulary,
    title-cased output. Vocabulary is a module constant => naturally broadcast
    (captured once in the task closure, never re-shipped per batch)."""
    text_lower = _low if _low is not None else text.lower()
    return sorted({s.title() for s in SKILL_KEYWORDS if s in text_lower})


def split_skills(items) -> list:
    """M8 — parse_cv_docling.py:74-81."""
    skills = []
    for item in items:
        for part in SKILL_SPLIT_RE.split(item):
            s = part.strip()
            if 2 <= len(s) <= 40 and SKILL_TOKEN_RE.match(s):
                skills.append(s)
    return sorted(set(skills))


def extract_education(text: str, _low: str | None = None) -> dict:
    """M9 — approach4_v1.py:111-127 degrees + institution/GPA regex family
    (approach4_v2.py:122-162)."""
    low = _low if _low is not None else text.lower()
    degrees = set()
    for pat in DEGREE_RES:
        degrees.update(pat.findall(low))
    # Guards below are regex-implied literals (INSTITUTION_RE needs one of
    # the three capitalized words; GPA_RE needs 'gpa' — 'cgpa' contains it).
    insts = (sorted(set(INSTITUTION_RE.findall(text)))
             if ("University" in text or "Institute" in text
                 or "College" in text) else [])
    gpa = sorted(set(GPA_RE.findall(low))) if "gpa" in low else []
    return {
        "degrees": sorted(degrees),
        "institutions": insts,
        "gpa": gpa,
    }


def extract_experience_years(text: str) -> list:
    """M10 — approach4_v1.py:129-147."""
    years = []
    for pat in EXPERIENCE_RES:
        years.extend(pat.findall(text))
    return sorted(set(years))


def is_date_like(text: str) -> bool:
    """M13 — parse_cv_docling.py:68-72."""
    t = text.lower()
    if DATE_YEAR_RE.search(t):
        return True
    return any(m in t for m in MONTH_TOKENS)


def _is_section_header(line: str) -> bool:
    """new_approaches/final.py:120-140 style: short keyword line or ALL-CAPS."""
    s = line.strip()
    if not s or len(s) >= 50:
        return False
    low = s.lower()
    for names in SECTION_CANON.values():
        if any(k in low for k in names):
            return True
    return s.isupper() and len(s.split()) <= 3


def _normalize_section_name(line: str) -> str:
    low = line.strip().lower()
    for canon, names in SECTION_CANON.items():
        if any(k in low for k in names):
            return canon
    return "other"


def segment_sections(text: str) -> list:
    """M12 — new_approaches/final.py:120-186: split text into named sections.

    Returns an ordered ``[(name, body)]`` list (Arrow: list<struct<name,body>>).
    """
    sections = []
    current_name = "preamble"
    current_lines: list = []
    for line in text.split("\n"):
        if _is_section_header(line):
            if current_lines:
                sections.append((current_name, "\n".join(current_lines).strip()))
            current_name = _normalize_section_name(line)
            current_lines = []
        else:
            current_lines.append(line)
    if current_lines:
        sections.append((current_name, "\n".join(current_lines).strip()))
    return [(n, b) for n, b in sections if b]


def chunk_paragraphs(text: str, min_chunk: int = 20,
                     target: int = 100, min_fallback: int = 15) -> list:
    """M14 — cv_doclayout_extractor.py:47-105: split on blank lines keeping
    chunks > ``min_chunk`` chars; fallback greedy line-merge into ~``target``
    char chunks keeping > ``min_fallback``."""
    chunks = [c.strip() for c in re.split(r"\n\s*\n", text) if len(c.strip()) > min_chunk]
    if chunks:
        return chunks
    out, buf = [], ""
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        buf = (buf + " " + line).strip()
        if len(buf) >= target:
            out.append(buf)
            buf = ""
    if buf and len(buf) > min_fallback:
        out.append(buf)
    return out


def extract_all_fields(text: str) -> dict:
    """Run the full field-extraction suite over one document's text.

    Output shape mirrors FIXTURES.md §1.2 ``expected_fields``.
    """
    low = text.lower()  # shared across the lowercase-matching extractors
    edu = extract_education(text, _low=low)
    return {
        "emails": extract_emails(text),
        "phones": extract_phones(text),
        "linkedin": extract_linkedin(text, _low=low),
        "github": extract_github(text, _low=low),
        "skills": extract_skills(text, _low=low),
        "degrees": edu["degrees"],
        "gpa": edu["gpa"],
    }


def extract_projects(text: str, limit: int = 5) -> list:
    """M11 — approach4_v2.py:195-218: stateful scan of the projects section.

    Entering on a short line containing 'projects'; 'tech stack' lines flush
    the accumulated project and are kept verbatim; other non-indented lines
    accumulate; capped at ``limit`` entries."""
    projects: list = []
    in_projects = False
    current = ""
    for line in text.split("\n"):
        if "projects" in line.lower() and len(line.strip()) < 20:
            in_projects = True
            continue
        if not in_projects:
            continue
        if "tech stack" in line.lower():
            if current:
                projects.append(current.strip())
            current = ""
            projects.append(line.strip())
        elif line.strip() and not line.startswith(" " * 8):
            current += " " + line.strip()
    # NOTE: a trailing accumulated project with no following 'tech stack'
    # line is DISCARDED — faithful to the reference (approach4_v2.py:218
    # returns without flushing current_project).
    return projects[:limit]
