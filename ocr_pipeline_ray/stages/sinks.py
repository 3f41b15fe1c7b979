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
