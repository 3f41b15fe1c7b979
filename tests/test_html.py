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
