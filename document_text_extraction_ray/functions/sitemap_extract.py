"""Sitemap extraction — the crawl-frontier companion to feed_extract.

Web crawls discover URLs through ``sitemap.xml`` payloads
(``application/xml`` next to robots.txt): either a namespaced
``<urlset><url><loc>`` leaf sitemap (with optional ``lastmod`` /
``priority`` per URL) or a ``<sitemapindex><sitemap><loc>`` index pointing
at child sitemaps.  The reference routes payloads by content type
(approach4_v1.py:186-193); a production extraction job must turn a sitemap
into per-URL frontier records rather than strip it as tag soup.  Pure
stdlib ElementTree, namespace-correct (regex-ish parsers miss the 0.9
namespace and double-count nested tags).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

SITEMAP_TYPE = "application/xml"


def extract_sitemap(payload: bytes) -> list:
    """Parse one sitemap payload into ``[(kind, loc, lastmod), ...]`` in
    document order; ``kind`` is ``'url'`` (leaf urlset entry) or
    ``'sitemap'`` (index entry), ``lastmod`` is ``''`` when absent.
    Raises on non-sitemap XML (in-band errors are the dispatch caller's
    job, the feed_extract convention)."""
    root = ET.fromstring(payload)
    out = []
    if root.tag == SITEMAP_NS + "urlset":
        for u in root.findall(SITEMAP_NS + "url"):
            loc = u.findtext(SITEMAP_NS + "loc") or ""
            if loc:
                out.append(("url", loc.strip(),
                            (u.findtext(SITEMAP_NS + "lastmod") or "").strip()))
    elif root.tag == SITEMAP_NS + "sitemapindex":
        for s in root.findall(SITEMAP_NS + "sitemap"):
            loc = s.findtext(SITEMAP_NS + "loc") or ""
            if loc:
                out.append(("sitemap", loc.strip(),
                            (s.findtext(SITEMAP_NS + "lastmod") or "").strip()))
    else:
        raise ValueError(f"unsupported sitemap root: {root.tag!r}")
    return out


# --------------------------------------------------------- synthesizers
#
# Deterministic builders used by fixtures and the registered query; loc
# values are entity-escaped so any corpus-derived URL round-trips.


def build_urlset(doc_id: int, n_urls: int) -> bytes:
    """Leaf sitemap: every odd entry carries a lastmod, so extraction must
    handle both presence and absence per row."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for i in range(n_urls):
        out.append("<url>")
        out.append(f"<loc>{escape(_page_loc(doc_id, i))}</loc>")
        if i % 2 == 1:
            out.append(f"<lastmod>{_lastmod(doc_id, i)}</lastmod>")
        out.append(f"<priority>0.{(i % 9) + 1}</priority>")
        out.append("</url>")
    out.append("</urlset>")
    return "".join(out).encode("utf-8")


def build_sitemapindex(doc_id: int, n_children: int) -> bytes:
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for i in range(n_children):
        out.append("<sitemap>")
        out.append(f"<loc>{escape(_child_loc(doc_id, i))}</loc>")
        out.append(f"<lastmod>{_lastmod(doc_id, i)}</lastmod>")
        out.append("</sitemap>")
    out.append("</sitemapindex>")
    return "".join(out).encode("utf-8")


def _page_loc(doc_id: int, i: int) -> str:
    return f"https://site{doc_id}.example/page/{i}"


def _child_loc(doc_id: int, i: int) -> str:
    return f"https://site{doc_id}.example/sitemap{i}.xml"


def _lastmod(doc_id: int, i: int) -> str:
    return f"2026-{(i % 9) + 1:02d}-{(doc_id % 27) + 1:02d}"
