"""Sequential single-process reference extractor (the correctness oracle).

Mirrors the reference's per-document loop semantics
(reference pipeline/app.py:157-212: decode → detect → ordered recognize
→ ordered emit): for each document, walk its spans in offset order,
extract each span's text with the same pure functions the Ray pipeline
uses, and emit the ordered span sequence. No Ray, no parallelism —
this is what pytest compares the distributed pipeline against
(SURVEY.md §7 step 2).

Error semantics: a span whose media lookup or decode fails stays in
the output with ``text=""`` (reference str-recognition/api.py:216-224
keeps failed regions in the response with an error field).
"""

from __future__ import annotations

import pyarrow as pa

from ocr_pipeline_ray.functions.html import strip_boilerplate
from ocr_pipeline_ray.functions.synthetic_media import (
    decode_image_payload,
    decode_pdf_payload,
)
from ocr_pipeline_ray.schema import DOCS_SCHEMA


def extract_span(kind: str, text: str, media_ref: str, media: dict[str, bytes]) -> str:
    if kind == "text":
        return strip_boilerplate(text)
    payload = media.get(media_ref)
    if payload is None:
        return ""
    try:
        if kind == "image":
            return decode_image_payload(media_ref, payload)
        if kind == "pdf":
            return decode_pdf_payload(payload)
    except Exception:
        return ""
    return ""


def extract_docs(docs: pa.Table, media: pa.Table) -> pa.Table:
    """Sequential extraction over a docs table; returns the golden-shaped table."""
    media_map = dict(
        zip(media["media_ref"].to_pylist(), media["payload"].to_pylist())
    )
    out_ids: list[str] = []
    out_spans: list[list[dict]] = []
    for row in docs.to_pylist():
        spans = sorted(row["spans"], key=lambda s: s["offset"])
        out = [
            {
                "kind": s["kind"],
                "text": extract_span(s["kind"], s["text"], s["media_ref"], media_map),
                "media_ref": s["media_ref"],
                "offset": s["offset"],
            }
            for s in spans
        ]
        out_ids.append(row["doc_id"])
        out_spans.append(out)
    return pa.Table.from_pydict({"doc_id": out_ids, "spans": out_spans}, schema=DOCS_SCHEMA)
