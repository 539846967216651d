"""Deterministic synthetic Common-Crawl-style corpus generator (FIXTURES.md §1).

Every page is assembled from labeled fragments with per-row seeded RNG
(``random.Random(f"{seed}:{i}")`` — sha512 string seeding, stable across
processes), so generation is order- and partitioning-independent: the same row
index always yields the same bytes whether built on the driver or sharded
across Ray tasks.  While building we track byte offsets, so the golden answer
(main-content text + byte spans into ``html``) is recorded at generation time,
independent of the extractor.

Noise fragments are constructed to violate at least one keep-rule robustly
(nav/aside/footer tags, blocklisted classes, link density 1.0, or short
crumbs), and main-content fragments to satisfy all keep-rules, so the golden
labels are unambiguous under the documented ExtractConfig thresholds.
"""

from __future__ import annotations

import html as _html
import random

from ..functions import fields as F
from ..functions.html_extract import visible_text

EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds

# Filler vocabulary: plain ASCII words, no digits, no '@' — cannot match the
# email/phone/gpa/url field regexes, so planted entities are the only matches.
WORDS = (
    "lorem ipsum dolor amet consectetur adipiscing elit sed eiusmod tempor "
    "incididunt labore dolore magna aliqua enim minim veniam quis nostrud "
    "exercitation ullamco laboris nisi aliquip commodo consequat aute irure "
    "voluptate velit esse cillum fugiat nulla pariatur excepteur sint occaecat "
    "cupidatat non proident sunt culpa officia deserunt mollit anim laborum "
    "perspiciatis unde omnis iste natus error voluptatem accusantium totam"
).split()

LANGS = ["en", "en", "en", "de", "fr", "es", "ta"]  # seeded weights via cycling draw

FIRST_NAMES = ["alice", "bruno", "chandra", "dmitri", "elena", "farid", "gita", "hans"]
LAST_NAMES = ["silva", "keller", "osei", "tanaka", "varga", "moreno", "patel", "larsen"]
DEGREES = [
    "Bachelor of Science", "Master of Engineering", "Bachelor of Arts",
    "Master of Science", "PhD", "Postgraduate Diploma",
]
SKILL_PLANTS = [
    "python", "java", "docker", "kubernetes", "react", "tensorflow",
    "machine learning", "sql", "aws", "linux",
]


class _PageBuilder:
    """Accumulates byte fragments while tracking absolute byte offsets."""

    def __init__(self):
        self.chunks: list = []
        self.pos = 0

    def emit(self, data) -> tuple:
        if isinstance(data, str):
            data = data.encode("utf-8")
        start = self.pos
        self.chunks.append(data)
        self.pos += len(data)
        return start, self.pos

    def bytes(self) -> bytes:
        return b"".join(self.chunks)


def _words(rng: random.Random, lo: int, hi: int) -> list:
    return [rng.choice(WORDS) for _ in range(rng.randint(lo, hi))]


def _entity(rng: random.Random) -> str:
    """One seeded noise entity matching the reference field-regex shapes."""
    kind = rng.randrange(7)
    if kind == 0:
        return f"{rng.choice(FIRST_NAMES)}.{rng.choice(LAST_NAMES)}@{rng.choice(WORDS)}mail.com"
    if kind == 1:
        return f"+1-555-{rng.randrange(1000):03d}-{rng.randrange(10000):04d}"
    if kind == 2:
        return f"linkedin.com/in/{rng.choice(FIRST_NAMES)}-{rng.choice(LAST_NAMES)}"
    if kind == 3:
        return f"github.com/{rng.choice(FIRST_NAMES)}{rng.randrange(100)}"
    if kind == 4:
        return rng.choice(DEGREES)
    if kind == 5:
        return f"GPA: {rng.randrange(2, 4)}.{rng.randrange(100):02d}"
    return rng.choice(SKILL_PLANTS)


def _main_paragraph(rng: random.Random) -> tuple:
    """Compose one main-content paragraph.

    Returns ``(html_inner, text)`` where ``text`` is the normalized visible
    text (the golden answer for this block) and ``html_inner`` the escaped
    inner HTML (optionally with one short inline anchor, link density < 0.4).
    """
    words = _words(rng, 12, 60)
    if rng.random() < 0.35:
        words.insert(rng.randrange(len(words)), _entity(rng))
    if rng.random() < 0.25:
        # One short inline link: anchor of 1-2 words out of >=12 keeps density low.
        k = rng.randint(1, 2)
        at = rng.randrange(len(words) - k)
        anchor = " ".join(words[at:at + k])
        pre = " ".join(words[:at])
        post = " ".join(words[at + k:])
        # Exact extractor-side density: len(anchor) / sum of stripped piece
        # lengths.  Guard with margin so golden labels stay unambiguous.
        denom = len(pre) + len(anchor) + len(post)
        if denom > 0 and len(anchor) / denom < 0.35:
            text = " ".join(w for w in [pre, anchor, post] if w)
            inner = (
                (_html.escape(pre) + " " if pre else "")
                + f'<a href="/{rng.choice(WORDS)}">{_html.escape(anchor)}</a>'
                + (" " + _html.escape(post) if post else "")
            )
            return inner, text
    text = " ".join(words)
    return _html.escape(text), text


def synth_page(i: int, seed: int = 42) -> dict:
    """Build one deterministic page. Returns corpus + golden columns."""
    rng = random.Random(f"{seed}:{i}")
    b = _PageBuilder()
    main_blocks: list = []   # (start, end, kind, text)

    url = f"https://site{i % 97}.example/{rng.randrange(16**8):08x}/page{i}"
    title = " ".join(_words(rng, 2, 5)).title()

    b.emit("<!DOCTYPE html>\n<html>\n<head>\n")
    b.emit(f"<title>{_html.escape(title)}</title>\n")
    b.emit('<meta charset="utf-8">\n<style>body { margin: 0; }</style>\n')
    b.emit("</head>\n<body>\n")

    # Boilerplate: header (tag drop), nav (tag drop + link density).
    b.emit(f'<header class="site-header"><h1>Site {i % 97}</h1>'
           f"<p>{_html.escape(' '.join(_words(rng, 3, 6)))}</p></header>\n")
    b.emit("<nav><ul>\n")
    for _ in range(rng.randint(3, 8)):
        w = rng.choice(WORDS)
        b.emit(f'<li><a href="/{w}">{w.title()} page link</a></li>\n')
    b.emit("</ul></nav>\n")

    if rng.random() < 0.5:
        b.emit('<div class="sidebar">\n')
        for _ in range(rng.randint(2, 4)):
            b.emit(f"<p>{_html.escape(' '.join(_words(rng, 4, 10)))}</p>\n")
        b.emit("</div>\n")

    # A links-only bar dropped purely by link density (no blocklisted class).
    if rng.random() < 0.4:
        b.emit("<div>")
        for _ in range(rng.randint(2, 4)):
            w = " ".join(_words(rng, 1, 2))
            b.emit(f'<a href="/{rng.choice(WORDS)}">{_html.escape(w.title())}</a> ')
        b.emit("</div>\n")

    # Main content.
    b.emit("<main>\n<article>\n")
    heading = f"Chapter {i % 41}: {' '.join(_words(rng, 2, 4)).title()}"
    b.emit("<h1>")
    h_start, h_end = b.emit(_html.escape(heading))
    b.emit("</h1>\n")
    main_blocks.append((h_start, h_end, "h1", heading))

    n_paras = rng.randint(1, 8)
    if rng.random() < 0.01:  # skewed giant-page tail (FIXTURES.md §1)
        n_paras = rng.randint(60, 150)
    two_col = rng.random() < 0.15

    def emit_para(inner: str, text: str):
        b.emit("<p>")
        s, e = b.emit(inner)
        b.emit("</p>\n")
        main_blocks.append((s, e, "p", text))

    if two_col and n_paras >= 2:
        # Reading order = document order: left cell paragraphs then right.
        half = n_paras // 2
        b.emit('<table><tr>\n<td>\n')
        for _ in range(half):
            emit_para(*_main_paragraph(rng))
        b.emit("</td>\n<td>\n")
        for _ in range(n_paras - half):
            emit_para(*_main_paragraph(rng))
        b.emit("</td>\n</tr></table>\n")
    else:
        for _ in range(n_paras):
            emit_para(*_main_paragraph(rng))

    if rng.random() < 0.3:
        b.emit("<ul>\n")
        for _ in range(rng.randint(2, 5)):
            item = " ".join(_words(rng, 4, 12))
            b.emit("<li>")
            s, e = b.emit(_html.escape(item))
            b.emit("</li>\n")
            main_blocks.append((s, e, "li", item))
        b.emit("</ul>\n")

    b.emit("</article>\n</main>\n")

    # Trailing boilerplate: comments (class drop), short crumb (min_chars
    # drop), footer (tag drop), script (invisible).
    if rng.random() < 0.5:
        b.emit('<div class="comments">\n')
        for _ in range(rng.randint(1, 4)):
            b.emit(f"<p>{_html.escape(' '.join(_words(rng, 3, 15)))}</p>\n")
        b.emit("</div>\n")
    b.emit("<p>(c) MMXXV</p>\n")
    b.emit(f"<footer><p>{_html.escape(' '.join(_words(rng, 4, 8)))} footer</p></footer>\n")
    b.emit('<script>var x = "<p>not text</p>";</script>\n')
    b.emit("</body>\n</html>\n")

    html_bytes = b.bytes()
    expected_text = "\n\n".join(t for _, _, _, t in main_blocks)
    lang = LANGS[rng.randrange(len(LANGS))]
    fields = F.extract_all_fields(expected_text)
    return {
        "url": url,
        "warc_ts": EPOCH_US + i * 137_000_000,   # timestamp[us] value
        "html": html_bytes,
        "text": visible_text(html_bytes),
        "lang": lang,
        "expected_text": expected_text,
        "expected_title": title,
        "expected_spans": [
            {"start": s, "end": e, "kind": k} for s, e, k, _ in main_blocks
        ],
        "expected_fields": fields,
    }


def synth_rows(start: int, stop: int, seed: int = 42):
    """Generate rows [start, stop) — the unit of distributed generation."""
    return [synth_page(i, seed) for i in range(start, stop)]
