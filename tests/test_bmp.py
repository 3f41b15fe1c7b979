"""BMP codec: roundtrip exactness, row padding, top-down DIBs."""

import numpy as np
import pytest

from ocr_pipeline_ray.functions.bmp import BMP_MAGIC, encode_bmp, parse_bmp


@pytest.mark.parametrize("h,w", [(1, 1), (7, 30), (5, 2), (3, 3), (8, 4), (2, 5)])
def test_roundtrip_exact(h, w):
    rng = np.random.default_rng(h * 100 + w)
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = encode_bmp(a)
    assert buf[:2] == BMP_MAGIC
    b = parse_bmp(buf)
    assert b.shape == (h, w, 3)
    assert (a == b).all()


def test_rows_are_padded_to_four_bytes():
    # w=2 -> 6 data bytes -> 8-byte rows on the wire
    a = np.zeros((3, 2, 3), dtype=np.uint8)
    buf = encode_bmp(a)
    import struct

    off = struct.unpack_from("<I", buf, 10)[0]
    assert len(buf) - off == 3 * 8


def test_top_down_negative_height():
    a = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    buf = bytearray(encode_bmp(a))
    import struct

    # flip sign of height and reverse the stored row order -> same image
    h = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -h)
    off = struct.unpack_from("<I", buf, 10)[0]
    row_len = 8  # w=2 -> padded to 8
    rows = [bytes(buf[off + i * row_len : off + (i + 1) * row_len]) for i in range(2)]
    buf[off:] = rows[1] + rows[0]
    b = parse_bmp(bytes(buf))
    assert (a == b).all()


def test_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        parse_bmp(b"NOPE")
    a = np.zeros((1, 1, 3), dtype=np.uint8)
    buf = bytearray(encode_bmp(a))
    import struct

    struct.pack_into("<H", buf, 28, 8)  # bpp=8 unsupported
    with pytest.raises(ValueError):
        parse_bmp(bytes(buf))
