"""Reassemble span rows into per-document ordered span sequences.

The engine's one mandatory shuffle (SURVEY.md §2.4 G3): key =
``doc_id``. This fixes-by-construction the reference's batch-path
identity bug, where pooled regions are re-keyed with a fresh uuid and
results race back to whichever request polls first
(reference pipeline/app.py:111-118, message_queue/monitor.py:87-93):
here ``(doc_id, offset)`` travel with every row and ordering is
restored by an explicit within-group sort — never by executor order
(reference str-recognition/processor.py:135-157 relies on list
discipline for the same guarantee).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_pipeline_ray.schema import SPAN_STRUCT


def pack_group(group: pa.Table) -> pa.Table:
    """One doc's span rows -> one doc row with spans sorted by offset."""
    order = pc.sort_indices(group.column("offset"))
    g = group.take(order)
    struct = pa.StructArray.from_arrays(
        [
            g.column("kind").combine_chunks(),
            g.column("text").combine_chunks(),
            g.column("media_ref").combine_chunks(),
            g.column("offset").combine_chunks(),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array([0, len(g)], pa.int32()), struct)
    n_errors = int(pc.sum(pc.not_equal(g.column("error"), "")).as_py() or 0)
    return pa.Table.from_arrays(
        [
            g.column("doc_id").slice(0, 1),
            spans,
            pa.array([len(g)], pa.int32()),
            pa.array([n_errors], pa.int32()),
        ],
        names=["doc_id", "spans", "n_spans", "n_errors"],
    )


def reassemble(span_rows_ds):
    """``groupby(doc_id).map_groups`` — the ordered-reassembly shuffle."""
    return span_rows_ds.groupby("doc_id").map_groups(pack_group, batch_format="pyarrow")
