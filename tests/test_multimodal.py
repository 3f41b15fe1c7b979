"""Multimodal plumbing tests — the decode kernel is stubbed in this
container (no PIL/ffmpeg); schema, actor signature, error channel and
output layout are real."""

import pyarrow as pa
import pytest
import ray.data

from ocr_pipeline_ray.stages.multimodal import (
    ImageDecodeActor,
    decode_images,
    sample_frames,
)


def _media_ds(n=10):
    rows = {
        "media_ref": [f"mem://m/{i}" for i in range(n)],
        "modality": ["image"] * n,
        "payload": [f"payload-{i}".encode() for i in range(n)],
        "width": [640] * n,
        "height": [480] * n,
        "duration_ms": [0] * n,
    }
    return ray.data.from_arrow(pa.Table.from_pydict(rows))


def test_image_decode_schema_and_determinism():
    out = decode_images(_media_ds(8), batch_size=4, concurrency=2).to_pandas()
    assert list(out.columns) == ["media_ref", "height", "width", "channel_means", "error"]
    assert (out["height"] == 32).all()
    assert (out["error"] == "").all()
    out2 = decode_images(_media_ds(8), batch_size=2, concurrency=2).to_pandas()
    a = [tuple(v) for v in out.sort_values("media_ref")["channel_means"]]
    b = [tuple(v) for v in out2.sort_values("media_ref")["channel_means"]]
    assert a == b  # deterministic fake decode, batch-size invariant


def test_strict_mode_raises():
    actor = ImageDecodeActor(strict=True)
    if actor.pil is None:
        batch = pa.Table.from_pydict(
            {"media_ref": ["x"], "payload": [b"zz"]}
        )
        out = actor(batch)
        assert out["error"][0].as_py().startswith("decode failed")


def test_image_decode_real_ppm_path():
    """P6 payloads take the REAL decode path: parse pixels + bilinear
    resize — channel means reflect actual raster content, not the
    digest fake."""
    import numpy as np

    from ocr_pipeline_ray.functions.ppm_ocr import render_text_ppm

    payloads = [render_text_ppm("AAAA"), render_text_ppm("    ")]
    rows = {
        "media_ref": ["mem://p/0", "mem://p/1"],
        "modality": ["image"] * 2,
        "payload": payloads,
        "width": [0, 0],
        "height": [0, 0],
        "duration_ms": [0, 0],
    }
    out = (
        decode_images(ray.data.from_arrow(pa.Table.from_pydict(rows)), concurrency=1)
        .to_pandas()
        .sort_values("media_ref")
    )
    glyph_mean = np.mean(out["channel_means"].iloc[0])
    blank_mean = np.mean(out["channel_means"].iloc[1])
    assert glyph_mean > blank_mean == 0.0  # glyph pixels present, blank all-black
    assert (out["error"] == "").all()


def test_frame_sampling_layout():
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "media_ref": ["mem://v/0", "mem://v/1"],
                "modality": ["video"] * 2,
                "payload": [b"v0", b"v1"],
                "width": [0, 0],
                "height": [0, 0],
                "duration_ms": [8000, 4000],
            }
        )
    )
    out = sample_frames(ds, n_frames=4, concurrency=1).to_pandas()
    assert len(out) == 8
    v0 = out[out["media_ref"] == "mem://v/0"].sort_values("frame_idx")
    assert v0["ts_ms"].tolist() == [1000, 3000, 5000, 7000]  # evenly spaced midpoints


def test_dhash_identical_payloads_collide_distinct_rasters_dont():
    from ocr_pipeline_ray.functions.ppm_ocr import render_text_ppm
    from ocr_pipeline_ray.stages.multimodal import dhash_images

    p_a = render_text_ppm("spark join merge")
    p_b = render_text_ppm("zzzzz qqqqq wwwww")
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "media_ref": ["0", "1", "2"],
                "modality": ["image"] * 3,
                "payload": [p_a, p_a, p_b],
                "width": [0] * 3,
                "height": [0] * 3,
                "duration_ms": [0] * 3,
            }
        )
    )
    out = dhash_images(ds, concurrency=1).to_pandas().sort_values("media_ref")
    assert (out["error"] == "").all()
    h = out["dhash"].tolist()
    assert h[0] == h[1]            # byte-identical payloads -> same hash
    assert len(h[0]) == 16 and int(h[0], 16) >= 0
    assert h[0] != h[2]            # different raster -> different hash


def test_media_dhash_dupes_groups_prefix_sharing_docs():
    from ocr_pipeline_ray.pipelines.media import media_dhash_dupes

    out = media_dhash_dupes("/root/testdata/sf0.001")
    assert (out["n_docs"] >= 2).all()
    assert (out["min_doc"] < out["max_doc"]).all()
    assert len(out) > 0
