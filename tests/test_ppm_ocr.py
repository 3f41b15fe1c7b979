"""The real raster kernel: PPM parse + glyph template-match OCR."""

import pytest

from ocr_pipeline_ray.functions.ppm_ocr import (
    PpmOcrEngine,
    decode_pdf_ppm,
    decode_text_ppm,
    encode_pdf_ppm,
    parse_ppm,
    render_text_ppm,
)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("HELLO WORLD", "HELLO WORLD"),
        ("lowercase maps up", "LOWERCASE MAPS UP"),
        ("digits 0123456789", "DIGITS 0123456789"),
        ("punct,goes-to_underscore!", "PUNCT_GOES_TO_UNDERSCORE_"),
        ("", ""),
    ],
)
def test_roundtrip(text, expected):
    assert decode_text_ppm(render_text_ppm(text)) == expected


def test_parse_ppm_handles_comments_and_whitespace():
    img = parse_ppm(b"P6\n# a comment\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0]))
    assert img.shape == (1, 2, 3)
    assert img[0, 0, 0] == 255 and img[0, 1, 1] == 255


def test_decode_is_noise_tolerant():
    """Template matching is nearest-glyph: flipping one pixel per
    glyph (for glyphs whose min inter-glyph Hamming distance is >=5)
    must not change the decode (real-OCR robustness property)."""
    text = "WALKS"  # every glyph has min distance >=5 in this font
    payload = bytearray(render_text_ppm(text))
    raster_off = payload.index(b"255\n") + 4
    w = 6 * len(text)
    for cell in range(len(text)):
        y, x = 3, cell * 6 + 2  # one in-glyph pixel per cell
        byte_idx = raster_off + (y * w + x) * 3
        for ch in range(3):  # flip the full RGB triple across binarize
            payload[byte_idx + ch] ^= 0xFF
    assert decode_text_ppm(bytes(payload)) == text


def test_pdf_container_reading_order():
    pdf = encode_pdf_ppm([(2, 0, "THIRD"), (0, 5, "SECOND"), (0, 0, "FIRST")])
    assert decode_pdf_ppm(pdf) == "FIRST SECOND THIRD"
    assert decode_pdf_ppm(encode_pdf_ppm([])) == ""


def test_engine_interface():
    eng = PpmOcrEngine()
    assert eng.extract("image", "mem://x/1", render_text_ppm("ABC")) == "ABC"
    assert eng.extract("pdf", "mem://x/2", encode_pdf_ppm([(0, 0, "P")])) == "P"
    with pytest.raises(ValueError):
        eng.extract("video", "mem://x/3", b"")
    with pytest.raises(ValueError):
        eng.extract("image", "mem://x/4", b"not a ppm")


# ---------------------------------------------------------------------------
# detection boxes + T3 polygon refinement
# ---------------------------------------------------------------------------


def test_detect_boxes_words_and_geometry():
    from ocr_pipeline_ray.functions.ppm_ocr import detect_boxes_ppm

    regs = detect_boxes_ppm(render_text_ppm("HELLO WORLD X"))
    assert [r["text"] for r in regs] == ["HELLO", "WORLD", "X"]
    # cell-grid geometry: word i starts at 6*sum(len+1) of prior words
    assert [(r["x0"], r["x1"]) for r in regs] == [(0, 29), (36, 65), (72, 77)]
    assert all(r["y0"] == 0 and r["y1"] == 7 for r in regs)
    # exact rendering -> perfect template match
    assert all(r["confidence"] == 1.0 for r in regs)
    # poly defaults off, like the reference (std-detection/test.py:53)
    assert all(r["polygon"] is None for r in regs)
    assert detect_boxes_ppm(render_text_ppm("")) == []


def test_detect_boxes_noise_confidence():
    from ocr_pipeline_ray.functions.ppm_ocr import detect_boxes_ppm

    payload = bytearray(render_text_ppm("WALKS"))
    header_len = len(b"P6\n30 7\n255\n")
    # flip one pixel (3 bytes RGB) of the first glyph
    for b in range(3):
        payload[header_len + b] = 255 - payload[header_len + b]
    (reg,) = detect_boxes_ppm(bytes(payload))
    assert reg["text"] == "WALKS"  # still nearest glyph
    assert 0.9 < reg["confidence"] < 1.0  # but no longer a perfect match


def test_polygon_golden_from_font():
    """The 14-point polygon must equal the contour computed directly
    from the font bitmaps (independent reimplementation)."""
    import numpy as np

    from ocr_pipeline_ray.functions.ppm_ocr import _FONT, _FONT_CHARS, detect_boxes_ppm

    word = "TAIL"
    (reg,) = detect_boxes_ppm(render_text_ppm(word), poly=True)
    # reassemble the word's mask from font bitmaps: 6px pitch, 5px glyphs
    w = 6 * (len(word) - 1) + 5
    mask = np.zeros((7, w), dtype=np.uint8)
    for i, ch in enumerate(word):
        mask[:, 6 * i : 6 * i + 5] = _FONT[_FONT_CHARS.index(ch)]
    edges = np.linspace(0, w, 8).astype(int)
    top, bot = [], []
    for s in range(7):
        rows = np.nonzero(mask[:, edges[s] : edges[s + 1]].any(axis=1))[0]
        xc = int(edges[s] + edges[s + 1] - 1) // 2
        top.append([xc, int(rows[0])])
        bot.append([xc, int(rows[-1])])
    assert reg["polygon"] == top + bot[::-1]
    assert len(reg["polygon"]) == 14


def test_polygon_small_box_fallback():
    from ocr_pipeline_ray.functions.ppm_ocr import detect_boxes_ppm

    # words narrower than 2 glyph pitches keep the rectangle (polygon
    # None), mirroring the reference's small-box fallback
    regs = detect_boxes_ppm(render_text_ppm("A BC DEF"), poly=True)
    assert [r["text"] for r in regs] == ["A", "BC", "DEF"]
    assert regs[0]["polygon"] is None and regs[1]["polygon"] is None
    assert regs[2]["polygon"] is not None


def test_link_refiner_links_single_space_words():
    """T4 LinkRefiner analog (reference refinenet.py:14-64, wiring
    test.py:140-153): single-space gaps link adjacent words into one
    line-level region; wider gaps (column breaks) stay separate; the
    refiner forces poly=True exactly like the reference test.py:153."""
    from ocr_pipeline_ray.functions.ppm_ocr import detect_boxes_ppm, render_text_ppm

    regs = detect_boxes_ppm(render_text_ppm("HELLO WORLD  NEXT"), link_refine=True)
    assert [r["text"] for r in regs] == ["HELLO WORLD", "NEXT"]
    # linked box spans both words
    words = detect_boxes_ppm(render_text_ppm("HELLO WORLD  NEXT"))
    assert regs[0]["x0"] == words[0]["x0"] and regs[0]["x1"] == words[1]["x1"]
    # poly forced on: the wide linked region gets a 14-point polygon
    assert regs[0]["polygon"] is not None and len(regs[0]["polygon"]) == 14
    # confidence counts only glyph cells (gap cells carry no glyph):
    # both words decode cleanly, so the linked region stays perfect
    assert regs[0]["confidence"] == 1.0


def test_link_refiner_off_is_unchanged():
    from ocr_pipeline_ray.functions.ppm_ocr import detect_boxes_ppm, render_text_ppm

    p = render_text_ppm("HELLO WORLD X")
    assert detect_boxes_ppm(p) == detect_boxes_ppm(p, link_refine=False)
    assert [r["text"] for r in detect_boxes_ppm(p)] == ["HELLO", "WORLD", "X"]
