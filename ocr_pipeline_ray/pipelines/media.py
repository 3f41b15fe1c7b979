"""Multimodal pipelines over the ``documents`` table as QUERIES: wrap
each doc's leading tokens into a REAL P6 PPM raster (the deterministic
"camera" from functions/ppm_ocr.py), then run the actor-pool decode
stages over the binary payload column.

``media_dimensions`` is fully oracle-checkable: the raster geometry is
a pure function of the token text (width = 6 px per glyph cell, height
= one 7 px glyph row), so DuckDB can derive the expected dimensions
from the documents view while the Ray side must actually parse PPM
headers to produce them — a true end-to-end decode check.

``media_channel_stats`` aggregates real pixel statistics (fraction of
lit glyph pixels per doc raster) — not SQL-derivable (rows-only check
+ pytest property).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ocr_pipeline_ray.functions.ppm_ocr import render_text_ppm
from ocr_pipeline_ray.functions.textstats import TOKEN_RE
from ocr_pipeline_ray.pipelines.relational import ROUND_DECIMALS
from ocr_pipeline_ray.stages.multimodal import decode_images


def _media_payload_ds(sf_dir: str, fmt: str = "ppm") -> "ray.data.Dataset":
    """documents -> (media_ref=doc_id, payload=raster of the first
    5 tokens); the wrap runs inside map_batches. ``fmt='png'`` encodes
    the same glyph raster as a real PNG (stdlib zlib DEFLATE), so the
    decode stage exercises an actual wire format end to end."""

    def wrap(t: pa.Table) -> pa.Table:
        refs, payloads = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = TOKEN_RE.findall(text)
            refs.append(str(did))
            ppm = render_text_ppm(" ".join(toks[:5]))
            if fmt == "png":
                from ocr_pipeline_ray.functions.png import encode_png
                from ocr_pipeline_ray.functions.ppm_ocr import parse_ppm

                # Sub filter: exercises the decoder's cumsum unfilter path
                payloads.append(encode_png(parse_ppm(ppm), filter_type=1))
            else:
                payloads.append(ppm)
        return pa.Table.from_pydict(
            {
                "media_ref": pa.array(refs, pa.string()),
                "modality": pa.array(["image"] * len(refs), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([0] * len(refs), pa.int32()),
                "height": pa.array([0] * len(refs), pa.int32()),
                "duration_ms": pa.array([0] * len(refs), pa.int32()),
            }
        )

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        wrap, batch_format="pyarrow"
    )


def media_dimensions(sf_dir: str) -> pd.DataFrame:
    """Decode every payload's native raster dimensions (no resize) via
    the actor-pool decode stage. Output: (doc_id, width, height)."""
    out = decode_images(_media_payload_ds(sf_dir), target_size=None, concurrency=(1, 4)).to_pandas()
    out["doc_id"] = out["media_ref"].astype("int64")
    return (
        out[["doc_id", "width", "height"]]
        .astype({"width": "int64", "height": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def media_dimensions_png(sf_dir: str) -> pd.DataFrame:
    """Same geometry oracle as :func:`media_dimensions`, but the
    payloads are REAL PNGs (stdlib encoder, Sub-filtered scanlines):
    the Ray side must walk chunks, inflate IDAT and unfilter to
    produce the dimensions. Shares MEDIA_DIMENSIONS_SQL — the raster
    geometry is format-independent."""
    out = decode_images(
        _media_payload_ds(sf_dir, fmt="png"), target_size=None, concurrency=(1, 4)
    ).to_pandas()
    bad = out[out["error"] != ""]
    if len(bad):
        raise ValueError(f"png decode errors: {bad['error'].iloc[0]}")
    out["doc_id"] = out["media_ref"].astype("int64")
    return (
        out[["doc_id", "width", "height"]]
        .astype({"width": "int64", "height": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# width = 6 px per glyph cell over the OCR-normalized first-5-token
# string (normalization maps chars 1:1, so length is preserved);
# empty -> 1 px. height = one 7 px glyph row.
MEDIA_DIMENSIONS_SQL = r"""
WITH base AS (
  SELECT doc_id, array_to_string(regexp_extract_all(text, '[A-Za-z0-9_]+')[1:5], ' ') AS s
  FROM documents
)
SELECT doc_id,
       CAST(greatest(1, 6 * length(s)) AS BIGINT) AS width,
       CAST(7 AS BIGINT) AS height
FROM base ORDER BY doc_id
"""


def media_channel_stats(sf_dir: str) -> pd.DataFrame:
    """Real pixel statistics per doc raster: mean channel intensity of
    the decoded (resized) image — the feature-extraction stage shape.
    Output: (doc_id, mean_intensity) rounded; rows-only check +
    pytest property (glyph rasters are brighter than blanks)."""
    out = decode_images(_media_payload_ds(sf_dir), target_size=32, concurrency=(1, 4)).to_pandas()
    out["doc_id"] = out["media_ref"].astype("int64")
    out["mean_intensity"] = np.round(
        [float(np.mean(v)) for v in out["channel_means"]], ROUND_DECIMALS
    )
    return (
        out[["doc_id", "mean_intensity"]].sort_values("doc_id").reset_index(drop=True)
    )
