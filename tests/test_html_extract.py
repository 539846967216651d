"""Unit tests for the HTML extraction kernel (tokenizer, scoring, spans)."""

import html as _html

from document_text_extraction_ray.functions.html_extract import (
    ExtractConfig,
    extract_blocks,
    extract_main_text,
    visible_text,
)


def test_basic_paragraph_kept():
    html = b"<html><body><p>This is the main content paragraph.</p></body></html>"
    text, spans = extract_main_text(html)
    assert text == "This is the main content paragraph."
    s, e, kind = spans[0]
    assert kind == "p"
    assert html[s:e] == b"This is the main content paragraph."


def test_nav_and_footer_dropped():
    html = (
        b"<body><nav><a href='/'>Home sweet home</a></nav>"
        b"<p>Real content stays here fine.</p>"
        b"<footer>Copyright two thousand twenty five</footer></body>"
    )
    text, _ = extract_main_text(html)
    assert text == "Real content stays here fine."


def test_class_blocklist_drops_subtree():
    html = (
        b'<body><div class="sidebar"><p>Sidebar junk text long enough.</p></div>'
        b"<p>Main body paragraph content.</p></body>"
    )
    text, _ = extract_main_text(html)
    assert text == "Main body paragraph content."


def test_link_density_drops_linkbar():
    html = (
        b'<body><div><a href="/a">Link number one</a> <a href="/b">Link number two</a></div>'
        b"<p>Actual article body text goes on and on.</p></body>"
    )
    text, _ = extract_main_text(html)
    assert text == "Actual article body text goes on and on."


def test_low_link_density_kept():
    html = (
        b"<body><p>A long paragraph of text that happens to contain "
        b'<a href="/x">one link</a> but is mostly prose and so it stays.</p></body>'
    )
    text, _ = extract_main_text(html)
    assert "one link" in text
    assert text.startswith("A long paragraph")


def test_min_chars_drops_crumbs():
    html = b"<body><p>(c) MMXX</p><p>This paragraph is long enough to keep.</p></body>"
    text, _ = extract_main_text(html)
    assert text == "This paragraph is long enough to keep."


def test_script_style_comment_head_invisible():
    html = (
        b"<html><head><title>Page title text here</title>"
        b"<style>p { color: red; }</style></head>"
        b"<body><script>var x = '<p>fake</p>';</script>"
        b"<!-- <p>commented out</p> -->"
        b"<p>Only this visible paragraph counts.</p></body></html>"
    )
    text, _ = extract_main_text(html)
    assert text == "Only this visible paragraph counts."
    assert visible_text(html) == "Only this visible paragraph counts."


def test_entities_unescaped():
    html = b"<body><p>Tom &amp; Jerry &lt;3 &quot;cartoons&quot; forever.</p></body>"
    text, _ = extract_main_text(html)
    assert text == 'Tom & Jerry <3 "cartoons" forever.'


def test_whitespace_normalized():
    html = b"<body><p>\n   spaced \t\t out\n\n words   here okay\n</p></body>"
    text, _ = extract_main_text(html)
    assert text == "spaced out words here okay"


def test_inline_tags_transparent():
    html = b"<body><p>Some <b>bold</b> and <i>italic</i> inline words here.</p></body>"
    text, _ = extract_main_text(html)
    assert text == "Some bold and italic inline words here."


def test_br_becomes_whitespace():
    html = b"<body><p>line one here<br>line two there</p></body>"
    text, _ = extract_main_text(html)
    assert text == "line one here line two there"


def test_span_inner_content_clean_element():
    html = b"<body>\n<p>\n  padded inner content here\n</p>\n</body>"
    _, spans = extract_main_text(html)
    s, e, _ = spans[0]
    # Span is exactly the inner content of the <p> element.
    assert html[s - 3: s] == b"<p>"
    assert html[e: e + 4] == b"</p>"


def test_span_fallback_mixed_container():
    # Text directly in a div that also holds a <p>: fallback to text-run span.
    html = b"<body><div><p>first paragraph of content</p>trailing text run also long</div></body>"
    text, spans = extract_main_text(html)
    assert text == "first paragraph of content\n\ntrailing text run also long"
    s, e, _ = spans[1]
    assert html[s:e] == b"trailing text run also long"


def test_reading_order_two_columns():
    html = (
        b"<body><table><tr>"
        b"<td><p>left column first para</p><p>left column second para</p></td>"
        b"<td><p>right column only para</p></td>"
        b"</tr></table></body>"
    )
    text, _ = extract_main_text(html)
    assert text.split("\n\n") == [
        "left column first para",
        "left column second para",
        "right column only para",
    ]


def test_unbalanced_html_tolerated():
    html = b"<body><div><p>unclosed paragraph keeps its text anyway</div></body>"
    text, _ = extract_main_text(html)
    assert text == "unclosed paragraph keeps its text anyway"


def test_config_thresholds_respected():
    html = b"<body><p>tiny</p><p>a block of twenty-five chars plus</p></body>"
    strict = ExtractConfig(min_chars=100)
    text, _ = extract_main_text(html, strict)
    assert text == ""


def test_blocks_metadata():
    html = b"<body><p>paragraph with enough characters</p></body>"
    blocks, _ = extract_blocks(html)
    assert blocks[0]["n_chars"] == len("paragraph with enough characters")
    assert blocks[0]["link_density"] == 0.0


def test_utf8_multibyte_spans():
    para = "Füße über Straße — größer ähnlich".encode()
    html = b"<body><p>" + _html.escape("Füße über Straße — größer ähnlich").encode() + b"</p></body>"
    text, spans = extract_main_text(html)
    assert text == "Füße über Straße — größer ähnlich"
    s, e, _ = spans[0]
    assert _html.unescape(html[s:e].decode()) == "Füße über Straße — größer ähnlich"
    assert para  # byte-offset slicing stayed on char boundaries


def test_title_extraction():
    from document_text_extraction_ray.functions.html_extract import extract_page

    html = (b"<html><head><title>My  Page &amp; Title</title></head>"
            b"<body><p>body paragraph content here</p></body></html>")
    page = extract_page(html)
    assert page["title"] == "My Page & Title"
    assert page["text"] == "body paragraph content here"
    # no title -> empty string; only the FIRST title counts
    assert extract_page(b"<p>no title anywhere here</p>")["title"] == ""
    two = b"<title>first one</title><title>second</title><p>content text here</p>"
    assert extract_page(two)["title"] == "first one"


def test_extract_outlinks_boilerplate_and_rawtext_exclusion():
    """Outlinks: nav/footer/class-blocked containers and script content
    excluded; entities unescaped; single/double/bare-quoted hrefs all
    parsed; document order preserved."""
    from document_text_extraction_ray.functions.html_extract import (
        extract_outlinks,
    )

    h = (b"<html><head><title>t</title></head><body>"
         b'<nav><a href="/menu">m</a></nav>'
         b'<div class="sidebar"><a href="/side">s</a></div>'
         b"<main><p>a <a href=\"https://x.com/?a=1&amp;b=2\">L</a>"
         b" b <a href='/single'>S</a> c <a href=/bare>B</a></p>"
         b"<script>document.write('<a href=\"/js\">x</a>')</script>"
         b"<!-- <a href=\"/comment\">c</a> -->"
         b"</main><footer><a href=\"/foot\">f</a></footer></body></html>")
    assert extract_outlinks(h) == [
        "https://x.com/?a=1&b=2", "/single", "/bare"]

    # anchors with no href are skipped; void/self-closing tags don't
    # corrupt the stack
    h2 = (b"<body><p><a name=\"anchor\">no-href</a><br>"
          b"<img src=\"i.png\"/><a href=\"/ok\">k</a></p></body>")
    assert extract_outlinks(h2) == ["/ok"]


def test_extract_tables_cells_nesting_and_script():
    from document_text_extraction_ray.functions.html_extract import (
        extract_tables,
    )

    html = (b"<html><body><p>noise</p>"
            b"<table><tr><th>a&amp;b</th><th> c  d </th></tr>"
            b"<tr><td>1</td><td></td></tr></table>"
            b"<table><tr><td>outer <table><tr><td>inner</td></tr></table>"
            b"</td><td>2</td></tr></table>"
            b"<script>var x = '<table><tr><td>fake</td></tr></table>';"
            b"</script></body></html>")
    rows = sorted(extract_tables(html))
    assert rows == [
        (0, 0, 0, "a&b"), (0, 0, 1, "c d"),
        (0, 1, 0, "1"), (0, 1, 1, ""),
        (1, 0, 0, "outer"), (1, 0, 1, "2"),
        (2, 0, 0, "inner"),
    ]


def test_extract_tables_unclosed_and_rowless():
    from document_text_extraction_ray.functions.html_extract import (
        extract_tables,
    )

    # cell before any <tr> lands in row 0; unclosed table still emits
    assert extract_tables(b"<table><td>x</td>") == [(0, 0, 0, "x")]
    assert extract_tables(b"no tables here") == []


def test_extract_outlinks_text_anchors_and_boilerplate():
    """(href, anchor) pairs: boilerplate judgment matches extract_outlinks;
    inner markup contributes text; whitespace normalized; entities
    unescaped; an unclosed <a> is implicitly closed by the next one."""
    from document_text_extraction_ray.functions.html_extract import (
        extract_outlinks,
        extract_outlinks_text,
    )

    h = (b"<html><head><title>t</title></head><body>"
         b'<nav><a href="/menu">menu text</a></nav>'
         b"<main><p>x <a href=\"https://a.com/1\">First <b>bold</b>"
         b" anchor</a> y <a href='/two'>two\n  lines &amp; more</a>"
         b'<a href="/three">un-closed <a href="/four">four</a></p>'
         b"<script>var s='<a href=\"/js\">j</a>';</script></main>"
         b'<footer><a href="/foot">foot</a></footer></body></html>')
    pairs = extract_outlinks_text(h)
    assert pairs == [
        ("https://a.com/1", "First bold anchor"),
        ("/two", "two lines & more"),
        ("/three", "un-closed"),
        ("/four", "four"),
    ]
    # href list identical to the bare extractor's judgment
    assert [p[0] for p in pairs] == extract_outlinks(h)
    # anchor spanning a dropped subtree boundary never leaks nav text
    assert extract_outlinks_text(
        b'<body><div class="sidebar"><a href="/s">s</a></div>'
        b'<p><a href="/k">keep</a></p></body>') == [("/k", "keep")]


def test_extract_head_meta_fields_and_first_wins():
    from document_text_extraction_ray.functions.html_extract import (
        extract_head_meta,
    )

    h = (b"<html><head><title> A &amp; B </title>"
         b'<meta name="description" content="first desc">'
         b'<meta name="description" content="second desc">'
         b'<meta property="og:title" content="OGT">'
         b'<meta property="og:description" content="OGD">'
         b'<meta name="robots" content="noindex, nofollow">'
         b'<link rel="canonical" href="https://e.com/c?x=1&amp;y=2">'
         b"</head><body>"
         b'<meta name="description" content="body meta ignored? no - '
         b'scanning stops at body">'
         b"</body></html>")
    m = extract_head_meta(h)
    assert m == {
        "title": "A & B",
        "description": "first desc",
        "robots": "noindex, nofollow",
        "og_title": "OGT",
        "og_description": "OGD",
        "canonical": "https://e.com/c?x=1&y=2",
    }
    # everything optional; scanning stops at </head>
    m2 = extract_head_meta(
        b"<head><title>t</title></head>"
        b'<meta name="description" content="after head">')
    assert m2["title"] == "t" and m2["description"] is None


def test_publish_date_ladder_and_validation():
    from document_text_extraction_ray.functions.html_extract import (
        extract_publish_date)

    # meta beats time beats url
    html = (b'<html><head>'
            b'<meta property="article:published_time" content="2023-04-07">'
            b'</head><body><time datetime="2022-01-01">x</time></body>')
    assert extract_publish_date(html, "https://x/2020/01/02/s") \
        == ("2023-04-07", "meta")
    assert extract_publish_date(
        b'<html><body><time datetime="2022-01-01">x</time></body>',
        "https://x/2020/01/02/s") == ("2022-01-01", "time")
    assert extract_publish_date(b"<html></html>",
                                "https://x/2020/1/2/s") \
        == ("2020-01-02", "url")
    # invalid month falls through the ladder; commented-out meta ignored
    assert extract_publish_date(
        b'<html><meta name="date" content="2023-13-01">'
        b'<!-- <time datetime="2021-01-01"> --></html>',
        "nope") == (None, "none")
