"""HTML -> text extraction (webhtml): contract edge cases.

The gate query `html_extract` cross-checks the whole chain against a
first-principles DuckDB oracle at sf scale; these tests pin the tricky
single-row behaviors (script containing a fake close tag, bare '<' in
prose, entity once-only decoding, malformed UTF-8, link ordering,
relative-link host resolution)."""

import pyspark.sql.functions as F
import pytest


def _extract(spark, html: bytes):
    from watertower_spark.operators.webhtml import extract_html_text

    df = spark.createDataFrame([(html,)], "html binary")
    row = extract_html_text(df).select("text", "title").collect()[0]
    return row.text, row.title


def test_script_style_comment_removed_block_breaks(spark):
    html = (
        b"<html><head><title>T1</title>"
        b"<style>p { color: red; }</style>"
        b'<SCRIPT type="x">if (1 < 2) { alert("</div>"); }</SCRIPT>'
        b"</head><body><!-- secret --><h1>Head</h1>"
        b"<p>one</p><P>two</P></body></html>"
    )
    text, title = _extract(spark, html)
    assert title == "T1"
    assert text == "T1\nHead\none\ntwo"
    assert "secret" not in text and "alert" not in text and "color" not in text


def test_bare_lt_in_prose_survives_tag_strip(spark):
    text, _ = _extract(spark, b"<p>1 < 2 and a <b>bold</b> claim</p>")
    assert text == "1 < 2 and a bold claim"


def test_entities_decode_once_amp_last(spark):
    # "&amp;lt;" is the ESCAPED text "&lt;" — must decode to the literal
    # four chars, not to "<" (double decoding)
    text, _ = _extract(spark, b"<p>&amp;lt; &lt;x&gt; &quot;q&quot; a&nbsp;b &#39;s&#39;</p>")
    assert text == '&lt; <x> "q" a b \'s\''


def test_malformed_utf8_replaced_not_failed(spark):
    text, _ = _extract(spark, b"<p>ok \xff\xfe end</p>")
    assert text.startswith("ok ") and text.endswith(" end")


def test_links_order_and_quoting(spark):
    from watertower_spark.operators.webhtml import extract_links

    html = (
        b'<a href="https://a.com/1">x</a>'
        b"<a class='z' href='http://b.org/2'>y</a>"
        b'<a href="/rel">z</a>'
    )
    df = spark.createDataFrame([(html,)], "html binary")
    links = extract_links(df).select("links").collect()[0].links
    # double-quoted hrefs in document order first, then single-quoted
    assert links == ["https://a.com/1", "/rel", "http://b.org/2"]


def test_host_link_edges_relative_resolves_to_source_host(spark):
    from watertower_spark.operators.webhtml import host_link_edges

    rows = [
        ("http://src.com/p", b'<a href="https://dst.com/a">a</a><a href="/loc">l</a>'),
        ("http://src.com/q", b'<a href="https://dst.com/b">b</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    edges = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_edges(df).collect()
    }
    assert edges == {("src.com", "dst.com"): 2, ("src.com", "src.com"): 1}


def test_whitespace_normalization(spark):
    text, _ = _extract(
        spark, b"<p>a   b\t c</p>\n\n  <p>  d  </p><br><br/><p>e</p>"
    )
    assert text == "a b c\nd\ne"


def test_lookalike_element_names_not_special(spark):
    """<scriptable>/<browser>/<abbr href=...> must NOT be treated as
    script/br/a — the \\b guard after the element name."""
    from watertower_spark.operators.webhtml import extract_links

    html = (
        b"<scriptable>kept words</scriptable>"
        b"<p>a<browser>b</browser>c</p>"
        b'<abbr href="https://not-a-link.com">x</abbr>'
    )
    df = spark.createDataFrame([(html,)], "html binary")
    text, _ = _extract(spark, html)
    assert "kept words" in text
    assert "a b c" in text  # <browser> stripped as a generic tag, not \n
    assert extract_links(df).collect()[0].links == []


def test_no_title_yields_empty_string(spark):
    text, title = _extract(spark, b"<body><p>body only</p></body>")
    assert title == ""
    assert text == "body only"
