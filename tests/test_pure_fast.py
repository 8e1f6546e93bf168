"""Equivalence proof for the guarded fast-path extractor (engine/pure.py
``_fast_scan``) against the pinned HTMLParser reference dialect.

The contract: whenever ``_fast_scan`` returns non-None, its (text, hrefs)
must be byte-identical to what the HTMLParser classes produce; whenever a
page leaves the guarded dialect subset it must return None (the public
functions then run the reference path, so equality is trivial).  These
tests attack that contract three ways: every fixture-corpus page (where the
fast path MUST engage — it carries the crawl speedup), an adversarial list
of dialect-edge strings, and hypothesis-composed markup soup.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.pure import (
    _canon_links,
    _CombinedExtractor,
    _fast_scan,
    extract_links,
    extract_text_and_links,
    html_to_text,
)

BASE = "http://base.example.test/a/b"


def _reference(html: str) -> tuple[str, list[str]]:
    """The pinned dialect: what the HTMLParser classes say."""
    p = _CombinedExtractor()
    p.feed(html)
    p.close()
    return p.text(), p.hrefs


def _assert_public_equals_reference(html: str) -> None:
    """The public functions must equal the reference path whatever route
    (fast or fallback) they took internally."""
    ref_text, ref_hrefs = _reference(html)
    ref_links = _canon_links(ref_hrefs, BASE)
    assert html_to_text(html) == ref_text
    assert extract_links(html, BASE) == ref_links
    t, ls = extract_text_and_links(html, BASE)
    assert t == ref_text
    assert ls == ref_links


# --------------------------------------------------------------------------
# 1. fixture corpus: fast path must ENGAGE and must match
# --------------------------------------------------------------------------


def test_fast_path_engages_and_matches_on_corpus():
    from fixtures.gen import gen_corpus

    corpus = gen_corpus("S")
    n = 0
    for page in corpus.pages:
        html = page["html"].decode("utf-8", "replace")
        fast = _fast_scan(html)
        assert fast is not None, f"corpus page fell off the fast path: {page['url']}"
        ref_text, ref_hrefs = _reference(html)
        assert fast[0] == ref_text
        assert fast[1] == ref_hrefs
        assert page["text"] == ref_text  # fixture text column unchanged
        n += 1
    assert n > 0


# --------------------------------------------------------------------------
# 2. adversarial dialect edges
# --------------------------------------------------------------------------

# pages the guards MUST reject (reference semantics are subtle there)
MUST_FALL_BACK = [
    "a<!-- comment -->b",
    "<!DOCTYPE html><p>x</p>",
    "<?pi data?><p>x</p>",
    "<p class='single'>x</p>",  # single-quoted attr
    "<a href=unquoted>x</a>",  # unquoted attr value
    "<p>x &amp; y</p>",  # charref in text data
    "<p>x &#65; y</p>",
    "<p>x &undefined y</p>",  # '&' in data at all
    "a < b and c > d",  # stray '<' in text
    '<p title="a>b">x</p>',  # '>' inside quoted value
    '<p title="a<b">x</p>',  # '<' inside quoted value
    "<script>var a=1;",  # unterminated cdata
    "<script/>x",  # self-closed cdata element
    "<script>a<script>b</script>c</script>",  # nested same-tag cdata
    "x</script>y",  # orphan close tag
    "<\x00p>x",  # NUL byte
    "\x01<p>x</p>",  # SOH byte (the guard's internal placeholder)
    '<p a=">x',  # unclosed quote: html.parser emits the tag as DATA
    "<a <p>y",  # tag-in-tag attr soup
    "x<" "<b>" 'a y="u">z',  # splice bait: removal must not assemble a tag
    "< p>spaced tag</p>",
    "<a href=\"x\" <b>>y</b>",  # '<' inside a tag body
    "<p foo=bar>x</p>",  # unquoted attr on block tag
    "</p class=\"x\">y",  # attrs on an end tag
    "<a href=\"u\"",  # unterminated tag at EOF
]

# pages the fast path SHOULD handle (and must match exactly)
MUST_STAY_FAST = [
    "",
    "plain words only",
    "<html><head><title>t</title></head><body><p>x</p></body></html>",
    "<P>Upper <B>case</B> tags</P>",
    '<a href="http://h/p?a=1&b=2">raw amp in href</a>',
    '<a href="http://h/p?a=1&amp;b=2">entity in href</a>',
    '<A HREF="http://h/q">upper attr</A>',
    '<a href="">empty href</a><a>no href</a>',
    '<a href="x" href="y">duplicate hrefs</a>',
    "<br/><hr /><p>self closing blocks</p>",
    "<script>var a = 1;</script><p>after script</p>",
    "<style>.x{}</style><p>after style</p>",
    "<SCRIPT>var b=2;</SCRIPT><p>upper cdata</p>",
    "<script>skip<div>tag soup inside</div></script><p>kept</p>",
    "pre<script>mid</script>post",  # no flush around skip tags
    "<p>  lots   of \t whitespace  </p>",
    "<ul><li>a</li><li>b</li></ul>",
    "<div><p>nested</p><blockquote>blocks</blockquote></div>",
    '<p class="c" id="i">attrs on block</p>',
    "<b>inline</b><i>only</i><span>unknown inline</span>",
    "<brand>unknown tag starting like br</brand>",
    "text &lt; escaped? no — stays slow",  # actually has & → fallback; kept in MUST_FALL_BACK? no: guard catches, public still equal
    "</ script>odd close outside cdata",  # hmm: skip-left matches → fallback
    "<td>table</td><th>cells</th><tr></tr>",
    "trailing text after <p>block</p> end",
]


@pytest.mark.parametrize("html", MUST_FALL_BACK)
def test_guards_reject_and_public_matches(html):
    assert _fast_scan(html) is None
    _assert_public_equals_reference(html)


@pytest.mark.parametrize("html", MUST_STAY_FAST)
def test_fast_or_fallback_public_matches(html):
    # fast where possible, but equality with the reference is the contract
    _assert_public_equals_reference(html)
    fast = _fast_scan(html)
    if fast is not None:
        ref_text, ref_hrefs = _reference(html)
        assert fast == (ref_text, ref_hrefs)


# --------------------------------------------------------------------------
# 3. hypothesis markup soup: fast (when engaged) ≡ reference, always
# --------------------------------------------------------------------------

_PIECES = st.sampled_from(
    [
        "word",
        " spaced  words ",
        "\n\t",
        "<p>",
        "</p>",
        "<P >",
        "<div>",
        "</div>",
        "<b>",
        "</b>",
        "<i>",
        "</i>",
        "<br/>",
        "<span>",
        "</span>",
        '<a href="http://h.example.test/x?a=1&b=2">',
        '<a href="rel/path">',
        '<a href="">',
        "<a>",
        "</a>",
        "<A HREF=\"HTTP://H/UP\">",
        "<script>var a=1;</script>",
        "<style>.c{}</style>",
        "<script>",
        "</script>",
        "&amp;",
        "&#65;",
        "&nosuch;",
        "&",
        "<",
        ">",
        "<!-- c -->",
        "<!doctype html>",
        "<p class='q'>",
        "<p foo=bar>",
        '<p t="a>b">',
        '<a href="x" href="y">',
        "<pre>",
        "</pre>",
        "<brand>",
        '<p a=">',
        "<a <p>",
        '</p class="x">',
        "x<",
        "<<b>",
        'a y="u">z',
        '<a href="<b>">',
    ]
)


def test_block_regexes_agree():
    # the hand-grouped case-sensitive block pattern must accept exactly
    # the same tag-name set as the generated case-insensitive one
    from engine.pure import _BLOCK_TAGS, _FAST_BLOCK_CI_RE, _FAST_BLOCK_CS_RE

    negatives = [
        "s", "pz", "brand", "b", "i", "a", "span", "strong", "pr",
        "hea", "heade", "lii", "ull", "tit", "bo", "h7", "h0", "fig",
        "figcap", "art", "x",
    ]
    for name in sorted(_BLOCK_TAGS) + negatives:
        for form in (f"<{name}>", f"</{name}>", f"<{name} >", f"<{name}/>"):
            expect = name in _BLOCK_TAGS
            assert bool(_FAST_BLOCK_CS_RE.fullmatch(form)) == expect, form
            assert bool(_FAST_BLOCK_CI_RE.fullmatch(form)) == expect, form
            up = form.upper()
            assert bool(_FAST_BLOCK_CI_RE.fullmatch(up)) == expect, up


@given(st.lists(_PIECES, max_size=25).map("".join))
@settings(max_examples=400, deadline=None)
def test_fast_scan_equals_reference_whenever_engaged(html):
    fast = _fast_scan(html)
    if fast is not None:
        assert fast == _reference(html)
    _assert_public_equals_reference(html)


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_random_bytes_public_matches(b):
    html = b.decode("utf-8", "replace")
    _assert_public_equals_reference(html)


# --- compressed pages index (html_z) round-trip -------------------------


def test_html_z_roundtrip():
    """decompress_html(compress_html(x)) == x exactly, so extraction over
    the compressed index is byte-identical to extraction over raw html
    (engine/crawl.pages_index stores html_z; extract_both_z_udf inflates)."""
    from engine.pure import compress_html, decompress_html
    from fixtures.gen import gen_corpus

    pages = gen_corpus(n_hosts=6, mean_pages=5, body_words=200).pages
    assert pages, "fixture corpus must be non-empty"
    for p in pages:
        html = p["html"]  # fixture pages carry bytes
        z = compress_html(html)
        assert isinstance(z, bytes) and len(z) < len(html)
        # the invariant the crawl relies on: the EXTRACTOR sees the same
        # string either way (bytes inputs were always utf-8(replace)
        # decoded before parsing — html_to_text does the same decode)
        want = html.decode("utf-8", "replace") if isinstance(html, bytes) else html
        assert decompress_html(z) == want
        assert extract_text_and_links(decompress_html(z), BASE) == (
            extract_text_and_links(html, BASE)
        )
    # null and bytes-input behavior
    assert compress_html(None) is None
    assert decompress_html(None) is None
    assert decompress_html(compress_html(b"<p>x</p>")) == "<p>x</p>"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=4000))
def test_html_z_roundtrip_hypothesis(s):
    from engine.pure import compress_html, decompress_html

    assert decompress_html(compress_html(s)) == s
