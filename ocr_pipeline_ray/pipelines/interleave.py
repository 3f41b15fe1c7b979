"""Flagship pipeline over driver testdata: wrap ``documents`` rows into
interleaved text+media docs deterministically, run the FULL extraction
engine (explode -> HTML strip -> OCR/PDF actor pools -> ordered
reassembly), and emit per-doc extracted span texts.

Because the wrapping is deterministic and invertible, the expected
output is SQL-expressible over the original ``documents`` view — this
gives the whole extraction engine a DuckDB oracle:

* text span   = HTML page embedding the raw document text as main
  content between link-dense boilerplate -> extraction must equal the
  whitespace-normalized text (or "" when under the 25-char block
  threshold).
* image span  = synthetic OCR payload of the first 5 tokens.
* pdf span    = 2 layout blocks (tokens 6-7 and 8-10) stored in
  REVERSED order with reading-order coordinates -> extraction must
  re-sort them; docs with <10 tokens get an empty payload -> "".
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ocr_pipeline_ray.functions.synthetic_media import (
    encode_image_payload,
    encode_pdf_payload,
)
from ocr_pipeline_ray.functions.textstats import TOKEN_RE, normalize_text
from ocr_pipeline_ray.pipelines.extract import build_extraction_pipeline
from ocr_pipeline_ray.schema import DOCS_SCHEMA, MEDIA_SCHEMA

_NAV = '<a href="/">home</a> | <a href="/a">about</a> | <a href="/c">contact</a>'


def _wrap_row(doc_id_int: int, text: str) -> tuple[str, list[dict], list[tuple]]:
    doc_id = f"doc-{doc_id_int:08d}"
    html = (
        f"<html><body><nav>{_NAV}</nav>"
        f'<div class="content"><p>{text}</p></div>'
        f"<div>(c) corp</div><footer>{_NAV}</footer></body></html>"
    )
    # normalize (not lower): must match trim(regexp_replace(text,'\s+',' ','g'))
    toks = TOKEN_RE.findall(text)
    img_ref = f"mem://{doc_id}/1"
    img_payload = encode_image_payload(img_ref, " ".join(toks[:5]))
    pdf_ref = f"mem://{doc_id}/2"
    if len(toks) >= 10:
        block_a = {"y": 0, "x": 0, "t": " ".join(toks[5:7])}
        block_b = {"y": 1, "x": 0, "t": " ".join(toks[7:10])}
        pdf_payload = encode_pdf_payload([[block_b, block_a]])  # stored reversed
    else:
        pdf_payload = encode_pdf_payload([])
    spans = [
        {"kind": "text", "text": html, "media_ref": "", "offset": 0},
        {"kind": "image", "text": "", "media_ref": img_ref, "offset": 1},
        {"kind": "pdf", "text": "", "media_ref": pdf_ref, "offset": 2},
    ]
    media = [(img_ref, "image", img_payload, 1), (pdf_ref, "pdf", pdf_payload, 1)]
    return doc_id, spans, media


def docs_from_documents(sf_dir: str) -> tuple[pa.Table, pa.Table]:
    """Deterministically interleave the ``documents`` table (driver-side
    prep for the flagship run; pure function of the input)."""
    src = pa.parquet.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids, spans_col, media_rows = [], [], []
    for did, text in zip(src["doc_id"].to_pylist(), src["text"].to_pylist()):
        doc_id, spans, media = _wrap_row(did, text)
        ids.append(doc_id)
        spans_col.append(spans)
        media_rows.extend(media)
    docs = pa.Table.from_pydict({"doc_id": ids, "spans": spans_col}, schema=DOCS_SCHEMA)
    media = pa.Table.from_pydict(
        {
            "media_ref": [m[0] for m in media_rows],
            "kind": [m[1] for m in media_rows],
            "payload": [m[2] for m in media_rows],
            "n_pages": [m[3] for m in media_rows],
        },
        schema=MEDIA_SCHEMA,
    )
    return docs, media


def extract_interleaved(sf_dir: str) -> pd.DataFrame:
    """Run the full extraction engine; return per-doc extracted texts.

    Output columns (all oracle-comparable): doc_id BIGINT,
    text_extracted, image_extracted, pdf_extracted.
    """
    docs, media = docs_from_documents(sf_dir)
    ds = ray.data.from_arrow(docs)
    out = build_extraction_pipeline(ds, media)
    rows = []
    for row in out.iter_rows():
        spans = {s["offset"]: s["text"] for s in row["spans"]}
        rows.append(
            (
                int(row["doc_id"].split("-")[1]),
                spans.get(0, ""),
                spans.get(1, ""),
                spans.get(2, ""),
            )
        )
    df = pd.DataFrame(
        rows, columns=["doc_id", "text_extracted", "image_extracted", "pdf_extracted"]
    )
    return df.sort_values("doc_id").reset_index(drop=True)


def extract_span_stats(sf_dir: str) -> pd.DataFrame:
    """Metric aggregation over the flagship output (the G7 counters
    analog, reference monitoring/monitoring.py:116-130): per span kind,
    span count + total extracted chars — a grouped aggregate computed
    FROM the Ray extraction output, oracle-checked against the
    SQL-derivable expectation."""
    import pyarrow.compute as pc_

    docs, media = docs_from_documents(sf_dir)
    ds = ray.data.from_arrow(docs)
    out = build_extraction_pipeline(ds, media)

    def stats(batch):
        import pyarrow as pa_

        flat = pc_.list_flatten(batch.column("spans").combine_chunks())
        kind = pc_.struct_field(flat, "kind")
        chars = pc_.utf8_length(pc_.struct_field(flat, "text"))
        return pa_.Table.from_arrays([kind, chars], names=["kind", "chars"])

    from ray.data.aggregate import Count, Sum

    df = (
        out.map_batches(stats, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Count(alias_name="n_spans"), Sum("chars", alias_name="total_chars"))
        .to_pandas()
        .sort_values("kind")
        .reset_index(drop=True)
    )
    df["total_chars"] = df["total_chars"].astype("int64")
    return df


EXTRACT_SPAN_STATS_SQL = r"""
WITH base AS (
  SELECT trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm,
         regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
  FROM documents
), per_doc AS (
  SELECT CASE WHEN length(norm) >= 25 THEN length(norm) ELSE 0 END AS text_chars,
         length(array_to_string(toks[1:5], ' ')) AS image_chars,
         CASE WHEN len(toks) >= 10
              THEN length(array_to_string(toks[6:7], ' ') || ' ' || array_to_string(toks[8:10], ' '))
              ELSE 0 END AS pdf_chars
  FROM base
)
SELECT kind, count(*) AS n_spans, CAST(sum(chars) AS BIGINT) AS total_chars
FROM (
  SELECT 'text' AS kind, text_chars AS chars FROM per_doc
  UNION ALL SELECT 'image', image_chars FROM per_doc
  UNION ALL SELECT 'pdf', pdf_chars FROM per_doc
)
GROUP BY kind ORDER BY kind
"""


EXTRACT_INTERLEAVED_SQL = r"""
WITH base AS (
  SELECT doc_id,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm,
         regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
  FROM documents
)
SELECT doc_id,
       CASE WHEN length(norm) >= 25 THEN norm ELSE '' END AS text_extracted,
       array_to_string(toks[1:5], ' ') AS image_extracted,
       CASE WHEN len(toks) >= 10
            THEN array_to_string(toks[6:7], ' ') || ' ' || array_to_string(toks[8:10], ' ')
            ELSE '' END AS pdf_extracted
FROM base ORDER BY doc_id
"""
