import pytest

from ocr_pipeline_ray.functions.synthetic_media import (
    decode_image_payload,
    decode_pdf_payload,
    encode_image_payload,
    encode_pdf_payload,
)


def test_image_roundtrip():
    ref = "mem://doc-0/1"
    payload = encode_image_payload(ref, "hello ocr world")
    assert decode_image_payload(ref, payload) == "hello ocr world"


def test_image_requires_matching_ref():
    payload = encode_image_payload("mem://a/0", "secret text")
    with pytest.raises(Exception):
        out = decode_image_payload("mem://b/0", payload)
        assert out != "secret text"  # wrong key -> garbage or decode error


def test_image_corrupt_magic():
    with pytest.raises(ValueError):
        decode_image_payload("mem://a/0", b"NOPE")


def test_pdf_reading_order():
    pages = [
        [{"y": 10, "x": 500, "t": "right"}, {"y": 10, "x": 0, "t": "left"}],
        [{"y": 900, "x": 0, "t": "bottom"}, {"y": 0, "x": 0, "t": "top"}],
    ]
    payload = encode_pdf_payload(pages)
    assert decode_pdf_payload(payload) == "left right top bottom"
