"""Output sinks beyond parquet: the reference-layout debug sink.

The reference persists per-document results as
``results/{request_id}/result.txt`` with one ``bbox\\ttext`` line per
region in detection order (reference pipeline/file_utils.py:25-51).
The modern analog here: per-doc text files with one
``offset\\tkind\\ttext`` line per span in offset order — a
human-greppable debug view written in parallel from the reassembled
Dataset (NOT part of the correctness surface; parquet is the real
sink, reference SURVEY.md S5/S6).
"""

from __future__ import annotations

import os

import pyarrow as pa


def _write_shard(batch: pa.Table, out_dir: str) -> pa.Table:
    os.makedirs(out_dir, exist_ok=True)
    for row in batch.to_pylist():
        path = os.path.join(out_dir, f"{row['doc_id']}.txt")
        with open(path, "w", encoding="utf-8") as f:
            for s in sorted(row["spans"], key=lambda s: s["offset"]):
                f.write(f"{s['offset']}\t{s['kind']}\t{s['text']}\n")
    return pa.Table.from_pydict({"doc_id": batch.column("doc_id").to_pylist()})


def write_result_txt(reassembled_ds, out_dir: str) -> int:
    """Write one ``{doc_id}.txt`` per document (parallel map over the
    reassembled docs); returns the number of docs written."""

    def f(batch: pa.Table) -> pa.Table:
        return _write_shard(batch, out_dir)

    return reassembled_ds.map_batches(f, batch_format="pyarrow").count()


# ---------------------------------------------------------------------------
# visualization sink (SURVEY S6): an actual image render, not just text.
# The reference draws region boxes onto the input image
# (pipeline/pipeline_utils.py:15-147 save_detection_result); here each
# doc renders to a P6 PPM overview: the doc_id in glyph raster at the
# top, then one bar per span — row position = span order, bar length
# proportional to extracted chars, color = span kind (text/image/pdf),
# red = error spans. Pure numpy + the repo's own raster font.
# ---------------------------------------------------------------------------

_KIND_COLORS = {
    "text": (64, 128, 255),
    "image": (64, 220, 96),
    "pdf": (255, 200, 64),
}
_ERROR_COLOR = (255, 64, 64)
_VIZ_W = 256
_BAR_H = 8


def render_doc_ppm(doc_id: str, spans: list[dict]) -> bytes:
    """Render one document's span overview to P6 PPM bytes."""
    import numpy as np

    from ocr_pipeline_ray.functions.ppm_ocr import parse_ppm, render_text_ppm

    header = parse_ppm(render_text_ppm(doc_id[:40]))
    spans = sorted(spans, key=lambda s: s["offset"])
    h = header.shape[0] + 2 + _BAR_H * max(1, len(spans))
    img = np.zeros((h, _VIZ_W, 3), dtype=np.uint8)
    img[: header.shape[0], : min(_VIZ_W, header.shape[1])] = header[
        :, : min(_VIZ_W, header.shape[1])
    ]
    y = header.shape[0] + 2
    for s in spans:
        color = _ERROR_COLOR if s.get("error") else _KIND_COLORS.get(s["kind"], (160, 160, 160))
        n = len(s.get("text") or "")
        bar_w = max(2, min(_VIZ_W, 2 + n // 4))
        img[y : y + _BAR_H - 1, :bar_w] = color
        y += _BAR_H
    return (
        f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode("ascii") + img.tobytes()
    )


def write_visual_ppm(reassembled_ds, out_dir: str) -> int:
    """Visualization sink: one ``{doc_id}.ppm`` per document, rendered
    and written in parallel from the reassembled Dataset (debug
    artifact, not a correctness surface). Returns docs written."""

    def f(batch: pa.Table) -> pa.Table:
        os.makedirs(out_dir, exist_ok=True)
        for row in batch.to_pylist():
            with open(os.path.join(out_dir, f"{row['doc_id']}.ppm"), "wb") as fh:
                fh.write(render_doc_ppm(row["doc_id"], row["spans"]))
        return pa.Table.from_pydict({"doc_id": batch.column("doc_id").to_pylist()})

    return reassembled_ds.map_batches(f, batch_format="pyarrow").count()
