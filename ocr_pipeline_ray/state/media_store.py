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
    """Actor-side view over a broadcast media table: dict lookup by ref."""

    def __init__(self, media_object_ref: "ray.ObjectRef"):
        table: pa.Table = ray.get(media_object_ref)
        self._payloads: dict[str, bytes] = dict(
            zip(table["media_ref"].to_pylist(), table["payload"].to_pylist())
        )
        self._pages: dict[str, int] = dict(
            zip(table["media_ref"].to_pylist(), table["n_pages"].to_pylist())
        )

    def get(self, media_ref: str) -> bytes | None:
        return self._payloads.get(media_ref)

    def n_pages(self, media_ref: str) -> int:
        return self._pages.get(media_ref, 0)
