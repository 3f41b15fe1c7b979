from ocr_pipeline_ray.functions.html import strip_boilerplate


MAIN = "the quick brown fox jumps over the lazy dog again and again today"


def page(body: str) -> str:
    return f"<html><body>{body}</body></html>"


def test_keeps_long_low_link_paragraph():
    assert strip_boilerplate(page(f"<p>{MAIN}</p>")) == MAIN


def test_drops_nav_and_footer():
    html = page(
        f'<nav><a href="/">home</a> <a href="/a">about this site and more</a></nav>'
        f"<p>{MAIN}</p>"
        f'<footer><a href="/t">terms of service page link</a></footer>'
    )
    assert strip_boilerplate(html) == MAIN


def test_drops_link_dense_block():
    html = page(
        f'<div><a href="/1">one link text here</a> <a href="/2">two link text here</a></div>'
        f"<p>{MAIN}</p>"
    )
    assert strip_boilerplate(html) == MAIN


def test_drops_short_block():
    html = page(f"<div>(c) corp 2026</div><p>{MAIN}</p>")
    assert strip_boilerplate(html) == MAIN


def test_inline_markup_does_not_split_blocks():
    html = page(f"<p>the quick <b>brown</b> fox jumps over the lazy dog again and again today</p>")
    assert strip_boilerplate(html) == MAIN


def test_script_and_style_dropped():
    html = page(f"<script>var aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa=1;</script><p>{MAIN}</p>")
    assert strip_boilerplate(html) == MAIN


def test_multiple_paragraphs_in_order():
    html = page(f"<p>{MAIN}</p><p>{MAIN} second paragraph of content</p>")
    assert strip_boilerplate(html) == f"{MAIN} {MAIN} second paragraph of content"


def test_plain_text_passthrough():
    assert strip_boilerplate("just   plain\ttext here") == "just plain text here"


def test_empty():
    assert strip_boilerplate("") == ""


# ---------------------------------------------------------------------------
# differential suite: the fast regex tokenizer vs the stdlib HTMLParser
# reference must agree block-for-block on every input
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from ocr_pipeline_ray.functions.html import strip_boilerplate_ref


DIFFERENTIAL_CASES = [
    "",
    "plain text with &amp; entities and no tags at all, long enough to matter",
    page(f"<p>{MAIN}</p><nav><a href='/'>x</a></nav>"),
    page(f"<P>{MAIN}</P>"),  # case-insensitive tags
    page(f"<p>{MAIN}</p><!-- comment with <p>fake</p> inside -->"),
    page(f"<script>var x = '<p>not text</p>';</script><p>{MAIN}</p>"),
    page(f"<br/><p>{MAIN}</p><br />trailing tail text that is long enough to keep"),
    page(f'<a href="x>y">deep link</a> {MAIN}'),  # '>' inside quoted attr
    page(f"<a href='a>b'>q</a> {MAIN}"),
    page(f'<div title="5 > 3 && 2 < 4">{MAIN}</div>'),
    page(f"<div data-x='mixed \"quotes\"'>{MAIN}</div>"),
    page(f"<footer><p>{MAIN}</p></footer><p>{MAIN} two</p>"),
    page(f"<ul><li>{MAIN}</li><li>short</li></ul>"),
    page(f"<pre>{MAIN}\n  preserves   runs</pre>"),
    page(f"<p>{MAIN} &lt;escaped&gt; &amp; more</p>"),
    f"<p>{MAIN}",  # unterminated block
    f"{MAIN} <p",  # dangling open bracket
    page(f"<p>{MAIN}</p><aside>{MAIN}</aside>"),
    page(f'<a href=x" y>dangling quote</a> {MAIN}'),  # quote not after '='
    page(f"<a href=x' y>dangling squote</a> {MAIN}"),
    page(f'<p a="x > y">{MAIN}</p>'),  # '>' inside quoted value
    page(f'<a href = "spaced > quote">{MAIN}</a> {MAIN}'),
    page('<a ' + '"" ' * 10 + f">weird attrs</a> {MAIN}"),
    # malformed closing tags with trailing slash must still close
    page(f"<nav>junk</nav/>{MAIN} and still long enough to be kept"),
    page(f"<a>link</a/>{MAIN} and still long enough to be kept"),
    # CDATA opacity: tags inside script/style are NOT events
    page(f"<script><nav><p>inner</p></nav></script><p>{MAIN}</p>"),
    page(f"<style>.x {{ content: '<footer>'; }}</style><p>{MAIN}</p>"),
    page(f"<SCRIPT>x</SCRIPT>{MAIN} outside and long enough to be kept"),
    page(f"<script>var s = '</scrip' + 't>';</script><p>{MAIN}</p>"),
    page(f"<script>unclosed cdata swallows the rest <p>{MAIN}</p>"),
    # noscript/template parse normally (not CDATA)
    page(f"<template><nav>t</nav></template><p>{MAIN}</p>"),
]


def test_no_catastrophic_backtracking():
    """A document truncated mid-tag with many quote pairs must strip in
    linear time (the overlapping-alternation regex hung here)."""
    import time

    for evil in ['<a ' + '"" ' * 200, '<a ' + '" ' * 200, '<a ' + '="" ' * 200, '<a ' + '=" ' * 120]:
        t0 = time.time()
        strip_boilerplate(evil + MAIN)
        assert time.time() - t0 < 0.5


def test_differential_targeted():
    for html in DIFFERENTIAL_CASES:
        assert strip_boilerplate(html) == strip_boilerplate_ref(html), html


_frag = st.sampled_from(
    [
        f"<p>{MAIN}</p>",
        "<div>short</div>",
        f"<nav><a href='/x'>nav link</a></nav>",
        f"<li>{MAIN} in a list</li>",
        "<script>ignored()</script>",
        f"<a href=\"q>r\">{MAIN}</a>",
        "<!-- c -->",
        "loose tail text fragment that runs long enough to pass the block threshold",
        "&amp; entity soup &#65; here",
        "<br/>",
        f"<footer>{MAIN}</footer>",
        f"<blockquote>{MAIN} quoted</blockquote>",
        "</nav/>",
        "</a/>",
        "</script/>",
        "<script><nav>opaque</nav></script>",
        "<SCRIPT>x</SCRIPT>",
        f"<template><footer>t</footer></template>",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_frag, min_size=0, max_size=8))
def test_differential_random_compositions(frags):
    html = page("".join(frags))
    assert strip_boilerplate(html) == strip_boilerplate_ref(html)
