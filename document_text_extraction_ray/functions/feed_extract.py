"""RSS/Atom feed-item extraction — pure stdlib ``xml.etree.ElementTree``.

Web-crawl corpora carry syndication payloads (``application/rss+xml``,
``application/atom+xml``) next to ``text/html``; the reference routes by
content type (approach4_v1.py:186-193) and a production extraction job must
turn a feed into per-item records (title, link, summary) rather than strip
it as tag soup through the HTML kernel.  Two genuinely different XML shapes
are handled:

* RSS 2.0 — ``<rss><channel><item>`` with element-text links and CDATA
  descriptions; channel-level decoys (``<image><title>``) must NOT leak
  into the item list, so only DIRECT ``<item>`` children of ``<channel>``
  count.
* Atom — namespaced ``<feed><entry>`` where the link rides an ATTRIBUTE
  (``<link href=.../>``) and summaries are entity-escaped text.

Entity decoding (``&amp;``, numeric ``&#8211;``) and CDATA passthrough are
exercised by the synthesizers below, so a regex-ish "parser" that skips
real XML decoding mismatches the oracle byte-for-byte.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

ATOM_NS = "{http://www.w3.org/2005/Atom}"

RSS_TYPE = "application/rss+xml"
ATOM_TYPE = "application/atom+xml"


def extract_feed_items(payload: bytes) -> list:
    """Parse one feed payload into ``[(fmt, title, link, summary), ...]``
    in document order.  Raises on non-feed XML (callers keep failures
    in-band, the dispatch convention)."""
    root = ET.fromstring(payload)
    items = []
    if root.tag == ATOM_NS + "feed":
        for e in root.findall(ATOM_NS + "entry"):
            link_el = e.find(ATOM_NS + "link")
            items.append((
                "atom",
                e.findtext(ATOM_NS + "title") or "",
                (link_el.get("href") or "") if link_el is not None else "",
                e.findtext(ATOM_NS + "summary") or "",
            ))
    elif root.tag == "rss":
        channel = root.find("channel")
        if channel is None:
            raise ValueError("rss payload without <channel>")
        for e in channel.findall("item"):
            items.append((
                "rss",
                e.findtext("title") or "",
                e.findtext("link") or "",
                e.findtext("description") or "",
            ))
    else:
        raise ValueError(f"unsupported feed root: {root.tag!r}")
    return items


def feed_to_text(payload: bytes) -> str:
    """Dispatch-route fold: one text blob per feed (title + summary per
    item, blank-line separated) for the uniform extraction schema."""
    parts = []
    for _fmt, title, _link, summary in extract_feed_items(payload):
        parts.append(title + "\n" + summary)
    return "\n\n".join(parts)


# --------------------------------------------------------- synthesizers
#
# Deterministic feed builders used by fixtures and the registered query.
# Titles carry a named entity (&amp;) and a numeric entity (&#8211;, the
# en dash); RSS descriptions ride CDATA (returned verbatim by a real XML
# parser), Atom summaries are plain escaped text — both decode to the SAME
# closed form so one oracle covers both container shapes.


def _title_xml(doc_id: int, i: int) -> str:
    return f"Item {i} &amp; more &#8211; feed {doc_id}"


def _link(doc_id: int, i: int) -> str:
    return f"https://feeds.example/e/{doc_id}/{i}"


def build_rss(doc_id: int, text: str, n_items: int) -> bytes:
    """RSS 2.0 container: channel metadata + an <image><title> decoy that a
    naive 'every <title> is an item' scraper would mis-emit."""
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<rss version="2.0"><channel>',
        f"<title>Feed {doc_id}</title>",
        f"<link>https://feeds.example/{doc_id}</link>",
        f"<description>channel {doc_id}</description>",
        f"<image><title>logo {doc_id}</title>"
        "<url>https://feeds.example/logo.png</url></image>",
    ]
    # A ']]>' inside the snippet would close the CDATA section early; the
    # standard split (']]' ends one section, '>' starts the next) keeps
    # the payload well-formed, and expat merges adjacent CDATA character
    # data back into one .text — so the parsed description equals
    # text[:40] verbatim for ANY corpus content.
    snippet = text[:40].replace("]]>", "]]]]><![CDATA[>")
    for i in range(n_items):
        out.append(
            "<item>"
            f"<title>{_title_xml(doc_id, i)}</title>"
            f"<link>{_link(doc_id, i)}</link>"
            f"<description><![CDATA[{snippet}]]></description>"
            "</item>"
        )
    out.append("</channel></rss>")
    return "".join(out).encode("utf-8")


def build_atom(doc_id: int, text: str, n_items: int) -> bytes:
    """Atom container: namespaced entries, href-attribute links, escaped
    (non-CDATA) summaries."""
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<feed xmlns="http://www.w3.org/2005/Atom">',
        f"<title>Feed {doc_id}</title>",
        f"<id>urn:feed:{doc_id}</id>",
    ]
    # Entity-escape the snippet (Atom summaries are plain escaped text):
    # a raw '&' or '<' in document text would otherwise make
    # ET.fromstring raise; the parser decodes back to text[:40] verbatim.
    snippet = escape(text[:40])
    for i in range(n_items):
        out.append(
            "<entry>"
            f"<title>{_title_xml(doc_id, i)}</title>"
            f'<link rel="alternate" href="{_link(doc_id, i)}"/>'
            f"<summary>{snippet}</summary>"
            f"<id>urn:entry:{doc_id}:{i}</id>"
            "</entry>"
        )
    out.append("</feed>")
    return "".join(out).encode("utf-8")
