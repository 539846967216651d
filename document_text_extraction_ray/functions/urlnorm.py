"""URL canonicalization — the key-normalization step in front of URL-level
dedup (a CC-style crawl carries the same page under scheme-case, ``www.``,
default-port, trailing-slash, tracking-param and fragment variants; crawl
curation pipelines dedup on the canonical form before any content dedup).

Pure vectorized pyarrow kernels (no per-row Python): one ``extract_regex``
parse + lower/replace/if_else recombination.  Every rule is deliberately
regex-expressible so the whole kernel has an exact DuckDB replay (the
``url_dedup`` query oracle mirrors it step for step).

Rules (applied only to URLs matching ``URL_RE``; non-URLs pass through
unchanged so the canonical column is total):
  * scheme and host lowercased; a leading ``www.`` stripped from the host;
  * default ports dropped (``http:80``, ``https:443``), others kept;
  * duplicate slashes in the path collapsed, trailing slashes stripped
    (the root path stays ``/``; an empty path becomes ``/``);
  * tracking params (``utm_*``, ``gclid*``, ``fbclid*``) removed from the
    query, empty query dropped, other params kept in order;
  * the fragment always dropped.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Named groups for arrow's extract_regex; DuckDB addresses the same groups
# by number (1=scheme 2=host 3=port 4=path 5=query).
URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]*)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)

TRACKING_RE = r"(^|&)(utm_|gclid|fbclid)[^&]*"


def canonicalize_url_array(urls) -> pa.Array:
    """Canonicalize a string array of URLs (see module rules).  Rows that
    don't parse as ``scheme://host...`` come back unchanged."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    urls = urls.cast(pa.string())
    parts = pc.extract_regex(urls, URL_RE)
    matched = parts.is_valid()

    def grp(name):
        return pc.fill_null(pc.struct_field(parts, name).cast(pa.string()), "")

    scheme = pc.utf8_lower(grp("scheme"))
    host = pc.replace_substring_regex(
        pc.utf8_lower(grp("host")), r"^www\.", ""
    )
    port = grp("port")
    default_port = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    port_part = pc.if_else(
        pc.or_(pc.equal(port, ""), default_port),
        "",
        pc.binary_join_element_wise(":", port, ""),
    )

    path = grp("path")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    path = pc.replace_substring_regex(path, r"/{2,}", "/")
    path = pc.replace_substring_regex(path, r"(.+?)/+$", r"\1")

    q = grp("query")
    q = pc.replace_substring_regex(q, TRACKING_RE, "")
    q = pc.replace_substring_regex(q, r"&{2,}", "&")
    q = pc.replace_substring_regex(q, r"^&+|&+$", "")
    q_part = pc.if_else(
        pc.equal(q, ""), "", pc.binary_join_element_wise("?", q, "")
    )

    canon = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, q_part, ""
    )
    return pc.if_else(matched, canon, urls)


def canonicalize_urls(ds, url_column: str = "url",
                      out_column: str = "canon_url"):
    """Dataset stage: append the canonical form of ``url_column``."""

    def kernel(t: pa.Table) -> pa.Table:
        return t.append_column(
            out_column, canonicalize_url_array(t.column(url_column))
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


# The DuckDB replay of the kernel, parameterized on the url expression —
# kept NEXT TO the kernel so rule changes update both sides together.
def canonical_sql(url_expr: str) -> str:
    """SQL expression computing the canonical form of ``url_expr`` —
    step-for-step the same rules as ``canonicalize_url_array``."""
    pat = URL_RE.replace("?P<scheme>", "").replace("?P<host>", "") \
                .replace("?P<port>", "").replace("?P<path>", "") \
                .replace("?P<query>", "")
    # DuckDB string literals: escape backslashes once (regexp args are
    # plain strings, no extra escaping needed beyond quoting).
    return f"""
        CASE WHEN NOT regexp_matches({url_expr}, '{pat}') THEN {url_expr}
        ELSE
          lower(regexp_extract({url_expr}, '{pat}', 1)) || '://'
          || regexp_replace(lower(regexp_extract({url_expr}, '{pat}', 2)),
                            '^www\\.', '')
          || CASE WHEN regexp_extract({url_expr}, '{pat}', 3) = '' THEN ''
                  WHEN lower(regexp_extract({url_expr}, '{pat}', 1)) = 'http'
                       AND regexp_extract({url_expr}, '{pat}', 3) = '80' THEN ''
                  WHEN lower(regexp_extract({url_expr}, '{pat}', 1)) = 'https'
                       AND regexp_extract({url_expr}, '{pat}', 3) = '443' THEN ''
                  ELSE ':' || regexp_extract({url_expr}, '{pat}', 3) END
          || regexp_replace(
               regexp_replace(
                 CASE WHEN regexp_extract({url_expr}, '{pat}', 4) = ''
                      THEN '/' ELSE regexp_extract({url_expr}, '{pat}', 4) END,
                 '/{{2,}}', '/', 'g'),
               '(.+?)/+$', '\\1')
          || CASE WHEN regexp_replace(regexp_replace(regexp_replace(
                     regexp_extract({url_expr}, '{pat}', 5),
                     '(^|&)(utm_|gclid|fbclid)[^&]*', '', 'g'),
                     '&{{2,}}', '&', 'g'), '^&+|&+$', '', 'g') = '' THEN ''
                  ELSE '?' || regexp_replace(regexp_replace(regexp_replace(
                     regexp_extract({url_expr}, '{pat}', 5),
                     '(^|&)(utm_|gclid|fbclid)[^&]*', '', 'g'),
                     '&{{2,}}', '&', 'g'), '^&+|&+$', '', 'g') END
        END
    """


def url_template_array(urls) -> pa.Array:
    """URL -> structural template: lowercase, strip scheme / query /
    fragment, collapse all-digit path segments to ``<n>`` and >=8-char
    hex segments to ``<h>``, drop the trailing slash.  Clusters crawl
    URLs by page TYPE ("site0.com/article/<n>/view") — the pattern-mining
    signal behind per-template crawl budgets and URL-frontier dedup.

    RE2 (pyarrow and DuckDB both) has no lookahead, so segment patterns
    consume their trailing '/' — adjacent variable segments overlap.  The
    kernel appends a sentinel '/', runs each segment pass TWICE (a run of
    adjacent matches thins to isolated ones after pass 1), then strips
    trailing slashes.  ``template_sql`` emits the identical DuckDB chain."""
    import pyarrow.compute as pc

    x = pc.utf8_lower(urls)
    x = pc.replace_substring_regex(x, r"^[a-z]+://", "")
    x = pc.replace_substring_regex(x, r"[?#].*$", "")
    x = pc.replace_substring_regex(x, r"$", "/")
    for _ in range(2):
        x = pc.replace_substring_regex(x, r"/[0-9]+/", "/<n>/")
    for _ in range(2):
        x = pc.replace_substring_regex(x, r"/[0-9a-f]{8,}/", "/<h>/")
    return pc.replace_substring_regex(x, r"/+$", "")


def template_sql(url_expr: str) -> str:
    """DuckDB replay of ``url_template_array`` (same RE2 passes)."""
    x = f"lower({url_expr})"
    x = f"regexp_replace({x}, '^[a-z]+://', '')"
    x = f"regexp_replace({x}, '[?#].*$', '')"
    x = f"{x} || '/'"
    for _ in range(2):
        x = f"regexp_replace({x}, '/[0-9]+/', '/<n>/', 'g')"
    for _ in range(2):
        x = f"regexp_replace({x}, '/[0-9a-f]{{8,}}/', '/<h>/', 'g')"
    return f"regexp_replace({x}, '/+$', '')"


def url_prefix_levels(urls, max_depth: int = 2) -> pa.Table:
    """Explode URLs into hierarchical path prefixes (depth 0 = host,
    depth 1 = host/seg1, ...): the crawl-analytics rollup key — traffic
    per site section without an N-way GROUPING SETS pass.  One row per
    (url, depth) where the path is deep enough.

    Pure vectorized arrow regex: scheme and query/fragment stripped, one
    anchored extract per depth — every pass RE2-replayable in DuckDB
    (``prefix_sql``)."""
    import numpy as np
    stripped = pc.replace_substring_regex(
        urls, pattern=r"^[A-Za-z][A-Za-z0-9+.-]*://", replacement="")
    stripped = pc.replace_substring_regex(
        stripped, pattern=r"[?#].*$", replacement="")
    depths, prefixes = [], []
    pat = r"^(?P<p>[^/]+"
    for depth in range(max_depth + 1):
        ext = pc.extract_regex(stripped, pattern=pat + r")")
        pref = pc.struct_field(ext, [0])
        kept = pc.drop_null(pref)
        depths.append(pa.array(
            np.full(len(kept), depth, np.int64), pa.int64()))
        prefixes.append(kept.combine_chunks()
                        if isinstance(kept, pa.ChunkedArray) else kept)
        pat += r"/[^/]+"
    arrs = []
    for p in prefixes:
        arrs.extend(p.chunks if isinstance(p, pa.ChunkedArray) else [p])
    dep = []
    for d in depths:
        dep.extend(d.chunks if isinstance(d, pa.ChunkedArray) else [d])
    return pa.table({"depth": pa.concat_arrays(dep),
                     "prefix": pa.concat_arrays(arrs)})


def prefix_sql(url_expr: str, depth: int) -> str:
    """DuckDB replay of one ``url_prefix_levels`` depth: NULL when the
    path is not deep enough (regexp_extract returns '' on no-match, so
    the emptiness check mirrors arrow's null)."""
    pat = "^([^/]+" + "/[^/]+" * depth + ")"
    base = (f"regexp_replace(regexp_replace({url_expr}, "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://', ''), '[?#].*$', '')")
    return (f"NULLIF(regexp_extract({base}, '{pat}', 1), '')")
