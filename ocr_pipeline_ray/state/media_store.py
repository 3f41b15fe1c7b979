"""Media payload resolution for media spans.

Two scale regimes:

* **BroadcastMediaStore** — the small-side-lookup pattern: the media
  table is ``ray.put`` ONCE on the driver and each actor ``ray.get``\\ s
  the shared object in ``__init__`` (zero-copy from the local object
  store on each node; never re-shipped per batch). Right when media
  fits in object-store memory (tests, dimension-table-sized media).

* **Bucketed join** — at 100 TB media does NOT fit: span rows and
  media rows are hash-partitioned on ``media_ref`` and joined
  per-bucket (see ``ocr_pipeline_ray.pipelines.relational.hash_join``),
  then extraction runs on the joined rows with the payload inline.
  ``build_extraction_pipeline(media_mode="join")`` wires this.

The reference's analog is each service holding its model/files in
process memory, loaded once at import (reference std-detection/api.py:40-60).
"""

from __future__ import annotations

import pyarrow as pa
import ray


def broadcast_media(media: pa.Table) -> "ray.ObjectRef":
    """Put the media table into the object store once (driver-side)."""
    return ray.put(media)


class BroadcastMediaStore:
    """Actor-side view over a broadcast media table.

    Lookup is binary search over the ref column (the broadcaster sorts
    it once); payload bytes are materialized lazily per hit. Building
    eager dicts here would copy every payload into every actor — an
    O(media x pool_size) anti-scaling init cost and a heap copy of the
    whole media table per worker; the sorted-search view keeps actor
    init ~free and the payload column shared in the object store.
    """

    def __init__(self, media_object_ref: "ray.ObjectRef"):
        table: pa.Table = ray.get(media_object_ref)  # zero-copy, node-local
        import numpy as np

        self._table = table
        self._refs = np.asarray(table["media_ref"].to_pandas(), dtype=object)
        if len(self._refs) > 1 and not bool((self._refs[:-1] <= self._refs[1:]).all()):
            order = np.argsort(self._refs)
            self._table = table.take(order)
            self._refs = self._refs[order]
        self._payload_col = self._table["payload"].combine_chunks()
        self._pages_col = self._table["n_pages"].combine_chunks()
        self._np = np

    def _index(self, media_ref: str) -> int:
        i = int(self._np.searchsorted(self._refs, media_ref))
        if i < len(self._refs) and self._refs[i] == media_ref:
            return i
        return -1

    def get(self, media_ref: str) -> bytes | None:
        i = self._index(media_ref)
        return self._payload_col[i].as_py() if i >= 0 else None

    def n_pages(self, media_ref: str) -> int:
        i = self._index(media_ref)
        return int(self._pages_col[i].as_py()) if i >= 0 else 0
