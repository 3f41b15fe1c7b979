"""Explode doc rows into span rows — vectorized, zero-copy Arrow.

One doc row ``(doc_id, spans: list<struct>)`` becomes N span rows
``(doc_id, offset, kind, text, media_ref, error, size_hint)``. This
replaces the reference's per-region fan-out where region identity is
packed into a composite string key (reference std-detection/api.py:108,
parsed back at pipeline/file_utils.py:17-22) with explicit columns.

Exploding *early* is the wide-row defense (SURVEY.md §7 step 9): a
heavy doc with 128 spans becomes 128 independent rows that spread
across blocks instead of one straggler row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_batch(batch: pa.Table) -> pa.Table:
    """docs batch -> span-rows batch (pure Arrow kernels, no Python loop)."""
    spans = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    doc_id = pc.take(batch.column("doc_id"), parents)
    kind = pc.struct_field(flat, "kind")
    text = pc.struct_field(flat, "text")
    media_ref = pc.struct_field(flat, "media_ref")
    offset = pc.struct_field(flat, "offset")
    # size_hint: chars of inline payload (text spans); media size is
    # resolved at the media stage (n_pages drives the heavy route).
    size_hint = pc.cast(pc.utf8_length(pc.fill_null(text, "")), pa.int32())
    error = pa.nulls(len(flat), pa.string()).fill_null("")
    return pa.Table.from_arrays(
        [doc_id, offset, kind, text, media_ref, error, size_hint],
        names=["doc_id", "offset", "kind", "text", "media_ref", "error", "size_hint"],
    )


def filter_kind(kinds: tuple[str, ...]):
    """Vectorized kind-predicate for use inside ``map_batches``."""

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("kind"), value_set=pa.array(kinds)))

    return _f
