"""General (non-fixture) HTML extraction: crafted real-world documents —
nested divs, scripts, malformed markup, charsets, link farms, truncation
(round-5 verdict #1). The fixture byte-identity contract lives in
test_extract.py; this file pins the extractor's behavior beyond the
fixture template."""

import pandas as pd
import pytest

from fastdup_spark.functions.extract import (
    ERR_DECODE, ERR_NO_TEXT, GENERIC_MIN_CHARS, _extract_batch,
    extract_main_text,
)


def one(hb: bytes, min_chars: int = 1, fallback: str | None = None):
    res = _extract_batch(pd.Series([hb]), min_chars, fallback)
    return res.extracted_text[0], res.error_code[0]


def test_nested_divs_scripts_styles():
    html = (b'<html><head><title>T</title>'
            b'<style>p{color:red}</style>'
            b'<script>var s = "</nav><p>fake</p>";</script></head>'
            b'<body><div id="wrap"><div class="inner">'
            b'<p>Real content sentence one. With more words.</p>'
            b'<P CLASS="X">Uppercase tag paragraph works too.</P>'
            b'</div></div>'
            b'<script>trailing();</script>'
            b'<footer>all rights reserved</footer></body></html>')
    text, err = one(html)
    assert err == ""
    assert text == ("Real content sentence one. With more words.\n\n"
                    "Uppercase tag paragraph works too.")


def test_semantic_boilerplate_subtrees_dropped():
    html = (b'<html><body>'
            b'<header><h1>Site name</h1></header>'
            b'<nav><a href="/">home</a><a href="/x">x</a></nav>'
            b'<aside>Related: <a href="/y">link</a></aside>'
            b'<p>The one real sentence of this page.</p>'
            b'<footer>contact | imprint</footer></body></html>')
    text, err = one(html)
    assert err == ""
    assert text == "The one real sentence of this page."


def test_unclosed_p_recovery():
    # real pages routinely omit </p>; block-open boundaries recover both
    text, err = one(b'<html><body><p>First never closed'
                    b'<p>Second one here.</body></html>')
    assert err == ""
    assert text == "First never closed\n\nSecond one here."


def test_link_dense_block_dropped_without_nav_tag():
    html = (b'<html><body>'
            b'<div><a href="/a">one</a> <a href="/b">two</a> '
            b'<a href="/c">three</a> <a href="/d">four</a></div>'
            b'<p>Actual prose, clearly long enough to keep around.</p>'
            b'</body></html>')
    text, err = one(html)
    assert err == ""
    assert text == "Actual prose, clearly long enough to keep around."


def test_generic_container_needs_prose_evidence():
    # short punctuation-free div text = label/button boilerplate
    _, err = one(b'<html><body><div>Read more</div></body></html>')
    assert err == ERR_NO_TEXT
    # same text with sentence punctuation is prose
    text, err = one(b'<html><body><div>Read more about it here.</div>'
                    b'</body></html>')
    assert err == ""
    assert text == "Read more about it here."
    # or long enough without punctuation
    long_div = b"word " * (GENERIC_MIN_CHARS // 5 + 2)
    text, err = one(b'<html><body><div>' + long_div + b'</div></body></html>')
    assert err == ""
    assert text.startswith("word word")


def test_truncated_markup_drops_tail():
    # cut mid-transfer: no </body>/</html>, trailing block dropped
    _, err = one(b'<html><body><p>this paragraph never clo')
    assert err == ERR_NO_TEXT
    # earlier COMPLETE blocks survive truncation of the tail
    text, err = one(b'<html><body><p>Complete first sentence here.</p>'
                    b'<p>cut mid sent')
    assert err == ""
    assert text == "Complete first sentence here."


def test_plain_text_payload_kept():
    body = b"Plain text payload with no markup at all. Two sentences even."
    text, err = one(body)
    assert err == ""
    assert text == body.decode()


def test_charset_declared_latin1():
    raw = ('<html><head><meta charset="iso-8859-1"></head>'
           '<body><p>caf\xe9 cr\xe8me tr\xe8s bien.</p></body></html>')
    text, err = one(raw.encode("latin-1"))
    assert err == ""
    assert text == "café crème très bien."


def test_charset_http_equiv_form():
    raw = (b'<html><head><meta http-equiv="Content-Type" '
           b'content="text/html; charset=windows-1252"></head>'
           b'<body><p>smart \x93quotes\x94 here.</p></body></html>')
    text, err = one(raw)
    assert err == ""
    assert text == "smart “quotes” here."


def test_charset_declared_but_wrong_quarantines():
    # page claims utf-8 but carries invalid bytes -> conservative quarantine
    raw = (b'<html><head><meta charset="utf-8"></head><body><p>ok '
           b'\xff\xfe\xc0</p></body></html>')
    _, err = one(raw)
    assert err == ERR_DECODE


def test_undeclared_legacy_bytes_quarantine_unless_fallback():
    raw = '<html><body><p>caf\xe9 sans declaration.</p></body></html>'.encode("latin-1")
    _, err = one(raw)
    assert err == ERR_DECODE
    text, err = one(raw, fallback="latin-1")
    assert err == ""
    assert text == "café sans declaration."


def test_utf8_bom():
    raw = "﻿<html><body><p>BOM page content here.</p></body></html>"
    text, err = one(raw.encode("utf-8"))
    assert err == ""
    assert text == "BOM page content here."


def test_utf16_bom():
    raw = "<html><body><p>UTF-16 page content here.</p></body></html>"
    text, err = one("﻿".encode("utf-16-le") + raw.encode("utf-16-le"))
    assert err == ""
    assert text == "UTF-16 page content here."


def test_entities_and_quoted_gt_attr():
    text, err = one(b'<html><body>'
                    b'<p title="a>b">5 &lt; 6 &amp;&amp; x &gt; y. '
                    b'&#233;t&#233;. A&nbsp;B.</p></body></html>')
    assert err == ""
    assert text == "5 < 6 && x > y. été. A B."


def test_comments_cannot_resurrect_markup():
    text, err = one(b'<html><body><!-- <p>hidden</p> -->'
                    b'<p>Visible sentence here.</p>'
                    b'<!-- unclosed comment swallows the rest <p>gone</p>')
    assert err == ""
    assert text == "Visible sentence here."


def test_whitespace_normalization_inside_blocks():
    text, err = one(b'<html><body><p>  spread\n   over\t\tlines. '
                    b' </p></body></html>')
    assert err == ""
    assert text == "spread over lines."


def test_empty_and_whitespace_only():
    assert one(b"")[1] == ERR_NO_TEXT
    assert one(b'<html><body>  \n\t </body></html>')[1] == ERR_NO_TEXT


def test_extract_main_text_block_list():
    blocks = extract_main_text(
        '<html><body><p>One.</p><div>Generic but punctuated, so kept.</div>'
        '<p>Two.</p></body></html>')
    assert blocks == ["One.", "Generic but punctuated, so kept.", "Two."]


@pytest.mark.parametrize("tag", ["blockquote", "pre"])
def test_content_tags_trusted(tag):
    raw = f'<html><body><{tag}>short no punct</{tag}></body></html>'.encode()
    text, err = one(raw)
    assert err == ""
    assert text == "short no punct"


def test_card_link_wrapping_block_is_link_dense():
    """Anchors legally wrap block tags (card-style links). The open-anchor
    state must survive the block flush, so the card body counts as linked
    text and dies on link density (round-6 review finding: flush used to
    reset in_link and the promo card slipped through as content)."""
    html = (b'<html><body>'
            b'<a href="/deal"><div>Buy cheap pills, great deals today.'
            b'</div></a>'
            b'<p>Actual prose, clearly long enough to keep around.</p>'
            b'</body></html>')
    text, err = one(html)
    assert err == ""
    assert text == "Actual prose, clearly long enough to keep around."
