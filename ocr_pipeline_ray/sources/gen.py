"""Deterministic synthetic interleaved-document corpus (FIXTURES.md).

Generates the ``docs`` / ``media`` / ``golden`` tables from a fixed
seed — no external data, no network, no model weights. The skew profile
mirrors the north rule's heavy-multi-page-PDF-vs-tiny-HTML straggler
concern (FIXTURES.md §1): 90% of docs have 1-4 spans, 9% have 5-16,
1% have 32-128.

The golden table is ground truth *by construction* (the generator knows
the main text it embedded); the sequential oracle
(:mod:`ocr_pipeline_ray.oracle`) must reproduce it, and the Ray
pipeline must reproduce the oracle — the span-sequence-equality
invariant ``(kind, text, media_ref, order)`` from BASELINE.json.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_pipeline_ray.functions.synthetic_media import (
    encode_image_payload,
    encode_pdf_payload,
)
from ocr_pipeline_ray.schema import DOCS_SCHEMA, MEDIA_SCHEMA

# Fixed vocabulary — deterministic, ASCII, no HTML metacharacters.
WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega quantum stream vector "
    "tensor matrix kernel lattice graph node edge cluster shard block batch "
    "actor worker driver object store spill shuffle partition offset span "
    "document corpus token index query plan schema column arrow parquet "
    "pipeline engine extract content main reader order page layout region "
    "crop detect recognize text media image signal window group sort merge "
    "union filter project scan write read commit resume lineage metric"
).split()
_W = np.array(WORDS)

LINK_WORDS = np.array("home about login signup contact terms privacy help next prev".split())


def _words(rng: np.random.Generator, n: int) -> str:
    return " ".join(_W[rng.integers(0, len(_W), n)])


def _link_frag(rng: np.random.Generator) -> str:
    n_links = int(rng.integers(3, 7))
    links = [
        f'<a href="/x{int(rng.integers(0, 99))}">{LINK_WORDS[int(rng.integers(0, len(LINK_WORDS)))]}</a>'
        for _ in range(n_links)
    ]
    return " | ".join(links)


def _make_text_span(rng: np.random.Generator) -> tuple[str, str]:
    """Return (html, expected_main_text)."""
    n_paras = int(rng.integers(1, 4))
    paras = []
    for _ in range(n_paras):
        n = int(rng.integers(20, 61))
        txt = _words(rng, n)
        paras.append(txt)
    expected = " ".join(paras)
    # occasionally wrap one word of a paragraph in inline markup —
    # inline tags must not split blocks or alter the extracted text
    body_paras = []
    for txt in paras:
        if rng.random() < 0.3:
            ws = txt.split(" ")
            k = int(rng.integers(0, len(ws)))
            ws[k] = f"<b>{ws[k]}</b>"
            body_paras.append("<p>" + " ".join(ws) + "</p>")
        else:
            body_paras.append(f"<p>{txt}</p>")
    sidebar = f"<div>{_link_frag(rng)}</div>" if rng.random() < 0.5 else ""
    html = (
        "<html><head><title>t</title><script>var x=1;</script></head><body>"
        f"<nav>{_link_frag(rng)}</nav>"
        f"{sidebar}"
        f'<div class="content">{"".join(body_paras)}</div>'
        "<div>(c) corp 2026</div>"
        f"<footer>{_link_frag(rng)}</footer>"
        "</body></html>"
    )
    return html, expected


def _make_image_span(rng: np.random.Generator, media_ref: str) -> tuple[bytes, str]:
    n = int(rng.integers(3, 11))
    text = _words(rng, n)
    return encode_image_payload(media_ref, text), text


def _make_pdf_span(rng: np.random.Generator) -> tuple[bytes, str, int]:
    """Return (payload, expected_text, n_pages)."""
    n_pages = int(rng.integers(2, 9))
    pages = []
    expected_parts: list[str] = []
    for _ in range(n_pages):
        n_blocks = int(rng.integers(2, 6))
        blocks = []
        for _ in range(n_blocks):
            y = int(rng.integers(0, 1000))
            x = int(rng.integers(0, 1000))
            t = _words(rng, int(rng.integers(2, 8)))
            blocks.append({"y": y, "x": x, "t": t})
        for b in sorted(blocks, key=lambda b: (b["y"], b["x"])):
            expected_parts.append(b["t"])
        order = rng.permutation(len(blocks))
        pages.append([blocks[i] for i in order])
    return encode_pdf_payload(pages), " ".join(expected_parts), n_pages


def generate_corpus(
    n_docs: int, seed: int = 42, edge_fixtures: bool = True
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (docs, media, golden) Arrow tables.

    ``golden`` has the docs schema with ``text`` holding the expected
    extraction for every span; failed spans (edge fixtures) keep their
    slot with ``text=""`` (FIXTURES.md §3-4).
    """
    rng = np.random.default_rng(seed)

    # span-count skew: 90% 1-4, 9% 5-16, 1% 32-128 (FIXTURES.md §1)
    tier = rng.random(n_docs)
    n_spans_arr = np.where(
        tier < 0.90,
        rng.integers(1, 5, n_docs),
        np.where(tier < 0.99, rng.integers(5, 17, n_docs), rng.integers(32, 129, n_docs)),
    )

    doc_ids: list[str] = []
    doc_spans: list[list[dict]] = []
    golden_spans: list[list[dict]] = []
    media_rows: dict[str, tuple[str, bytes, int]] = {}

    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        spans: list[dict] = []
        gspans: list[dict] = []
        for off in range(int(n_spans_arr[i])):
            r = rng.random()
            media_ref = ""
            if r < 0.70:
                kind, (html, expected) = "text", _make_text_span(rng)
                payload_text = html
            elif r < 0.95:
                kind = "image"
                media_ref = f"mem://{doc_id}/{off}"
                payload, expected = _make_image_span(rng, media_ref)
                media_rows[media_ref] = ("image", payload, 1)
                payload_text = ""
            else:
                kind = "pdf"
                media_ref = f"mem://{doc_id}/{off}"
                payload, expected, n_pages = _make_pdf_span(rng)
                media_rows[media_ref] = ("pdf", payload, n_pages)
                payload_text = ""
            spans.append(
                {"kind": kind, "text": payload_text, "media_ref": media_ref, "offset": off}
            )
            gspans.append(
                {"kind": kind, "text": expected, "media_ref": media_ref, "offset": off}
            )
        doc_ids.append(doc_id)
        doc_spans.append(spans)
        golden_spans.append(gspans)

    if edge_fixtures and n_docs >= 3:
        # doc 0: empty text span appended -> extracted ""
        off = len(doc_spans[0])
        doc_spans[0].append({"kind": "text", "text": "", "media_ref": "", "offset": off})
        golden_spans[0].append({"kind": "text", "text": "", "media_ref": "", "offset": off})
        # doc 1: image span whose media_ref is missing from media ->
        # span kept, text "", error recorded (never dropped)
        off = len(doc_spans[1])
        ref = f"mem://{doc_ids[1]}/{off}"
        doc_spans[1].append({"kind": "image", "text": "", "media_ref": ref, "offset": off})
        golden_spans[1].append({"kind": "image", "text": "", "media_ref": ref, "offset": off})

    docs = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": doc_spans}, schema=DOCS_SCHEMA
    )
    golden = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": golden_spans}, schema=DOCS_SCHEMA
    )
    refs = sorted(media_rows)
    media = pa.Table.from_pydict(
        {
            "media_ref": refs,
            "kind": [media_rows[r][0] for r in refs],
            "payload": [media_rows[r][1] for r in refs],
            "n_pages": [media_rows[r][2] for r in refs],
        },
        schema=MEDIA_SCHEMA,
    )
    return docs, media, golden


def write_corpus(
    out_dir: str, n_docs: int, seed: int = 42, edge_fixtures: bool = True, shards: int = 8
) -> dict[str, str]:
    """Write (docs, media, golden) as sharded parquet under ``out_dir``.

    Idempotent cache: if a ``_DONE`` marker exists the corpus is reused
    (the corpus is fully determined by ``(n_docs, seed, edge_fixtures)``
    which are encoded in the caller's path).
    """
    paths = {
        "docs": os.path.join(out_dir, "docs"),
        "media": os.path.join(out_dir, "media"),
        "golden": os.path.join(out_dir, "golden"),
    }
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return paths
    docs, media, golden = generate_corpus(n_docs, seed=seed, edge_fixtures=edge_fixtures)
    for name, table in (("docs", docs), ("media", media), ("golden", golden)):
        d = paths[name]
        os.makedirs(d, exist_ok=True)
        n_shards = max(1, min(shards, table.num_rows))
        edges = np.linspace(0, table.num_rows, n_shards + 1).astype(int)
        for s in range(n_shards):
            lo, hi = int(edges[s]), int(edges[s + 1])
            if hi > lo:
                pq.write_table(table.slice(lo, hi - lo), os.path.join(d, f"part-{s:04d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return paths
