"""Charset sniffing + decode for web payloads — the encoding ladder every
Common-Crawl-style extraction front-end runs before any text processing
(WHATWG encoding sniffing, condensed):

    1. BOM          — UTF-8 / UTF-16 LE / UTF-16 BE byte-order marks win.
    2. meta charset — ``<meta charset=...>`` or the http-equiv
                      ``content="text/html; charset=..."`` form, scanned in
                      the first 1024 bytes (ASCII-compatible prefix, the
                      WHATWG prescan).
    3. UTF-8 try    — strict decode; web text is overwhelmingly UTF-8.
    4. latin-1      — the never-fails fallback (every byte maps).

Pure stdlib; returns the decoded text so the contract is an IDENTITY round
trip, not just a label.
"""

from __future__ import annotations

import codecs
import re

# The charset declaration only counts INSIDE a <meta ...> tag (the WHATWG
# prescan walks tags, not raw bytes): body text mentioning e.g.
# 'charset=shift_jis' early in a UTF-8 page must not beat the strict-UTF-8
# rung.  One regex over the prefix: a '<meta' open, then any run of
# non-'>' bytes, then the charset attribute — still inside the tag.
_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,256}?charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)",
    re.IGNORECASE)


def sniff_decode(payload: bytes) -> tuple:
    """-> (encoding, method, text). ``method`` in ``bom | meta | utf8 |
    fallback``; ``encoding`` is the codec actually used (python codec
    canonical name).  A declared-but-unknown meta charset falls through
    to the UTF-8 rung rather than failing."""
    payload = bytes(payload or b"")
    if payload.startswith(codecs.BOM_UTF8):
        return "utf-8", "bom", payload[3:].decode("utf-8", "replace")
    if payload.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le", "bom", payload[2:].decode("utf-16-le", "replace")
    if payload.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be", "bom", payload[2:].decode("utf-16-be", "replace")
    m = _CHARSET_RE.search(payload[:1024])
    if m:
        name = m.group(1).decode("ascii", "replace")
        try:
            codec = codecs.lookup(name)
            if not codec.name.startswith("utf-16"):  # BOM-less utf-16 lies
                return codec.name, "meta", payload.decode(codec.name,
                                                          "replace")
        except LookupError:
            pass
    try:
        return "utf-8", "utf8", payload.decode("utf-8")
    except UnicodeDecodeError:
        return "iso8859-1", "fallback", payload.decode("latin-1")
