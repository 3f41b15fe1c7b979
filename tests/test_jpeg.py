"""Baseline JPEG codec: DCT math vs the textbook definition, zigzag
vs the T.81 sequence, encoder output structure, round-trip quality,
and a decoder check against a BY-HAND spec-assembled file (so the
decoder is tested against ITU-T T.81 itself, not just our encoder)."""

import struct

import numpy as np

from ocr_pipeline_ray.functions.jpeg import (
    _C,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse else 99.0


def test_dct_matrix_matches_textbook_definition():
    ref = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            s = np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
            ref[k, n] = s * np.cos(np.pi * (2 * n + 1) * k / 16)
    assert np.allclose(_C, ref)
    assert np.allclose(_C @ _C.T, np.eye(8))  # orthonormal -> IDCT = C.T


def test_zigzag_is_the_t81_sequence():
    # first 16 entries of the published zigzag scan
    assert _ZIGZAG[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


def _gradient(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    return np.stack(
        [np.add.outer(y, x) / 2, np.tile(x, (h, 1)), np.tile(y[:, None], (1, w))], axis=-1
    ).astype(np.uint8)


def test_roundtrip_quality_and_shapes():
    img = _gradient(120, 160)
    for sub, q, floor in (("4:4:4", 95, 45), ("4:4:4", 75, 40), ("4:2:0", 95, 40), ("4:2:0", 75, 38)):
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        assert dec.shape == img.shape
        assert _psnr(img, dec) > floor, (sub, q)


def test_roundtrip_odd_dims_noise_and_gray():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, quality=95))
    assert dec.shape == (37, 53, 3)
    assert _psnr(noise, dec) > 30
    g = rng.integers(0, 256, (17, 9), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95, subsampling="4:2:0"))
    assert dec.shape == (17, 9, 3)
    # gray input -> near-gray output (chroma quantizes around 128)
    assert np.abs(dec.astype(int) - dec[:, :, :1].astype(int)).max() <= 3


def test_encoder_emits_wellformed_marker_stream():
    data = encode_jpeg(_gradient(24, 40), quality=75)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    pos, seen = 2, []
    while True:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        seen.append(marker)
        if marker == 0xDA:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + ln
    assert seen.count(0xDB) == 2 and seen.count(0xC4) == 4 and 0xC0 in seen and 0xE0 in seen
    # SOF carries the true dimensions
    sof = data.index(b"\xff\xc0")
    _, _, h, w, nc = struct.unpack(">HBHHB", data[sof + 2 : sof + 10])
    assert (h, w, nc) == (24, 40, 3)


def test_decoder_against_hand_assembled_spec_file():
    """Solid gray 8x8, one component, quant table of 1s, 1-bit Huffman
    codes — every byte below comes straight from T.81, none from our
    encoder. Y = 130 -> DC coeff 8*(130-128) = 16, category 5,
    extra bits 10000; EOB. ECS = '0' '10000' '0' + 1-pad = 0x41."""

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    data = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0]) + bytes([1] * 64))
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([5]))
        + seg(0xFFC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0]))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x41])
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 3)
    assert np.all(out == 130)


def test_decode_rejects_non_jpeg():
    import pytest

    with pytest.raises(ValueError):
        decode_jpeg(b"P6 1 1 255 \x00\x00\x00")


def test_decode_skips_fill_bytes():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; real encoders emit them. Regression: the marker parser
    previously read the second 0xFF as the marker byte and consumed
    the real marker as a bogus segment length."""
    import numpy as np

    from ocr_pipeline_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = (np.arange(16 * 24 * 3, dtype=np.uint8) % 251).reshape(16, 24, 3)
    data = encode_jpeg(img, quality=90)
    i = data.find(b"\xff\xdb")
    patched = data[:i] + b"\xff\xff" + data[i:]
    assert (decode_jpeg(patched) == decode_jpeg(data)).all()
