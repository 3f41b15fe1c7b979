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
