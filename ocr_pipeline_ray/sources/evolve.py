"""Schema-evolution-aware parquet reading (UNION BY NAME).

A long-lived corpus accretes columns: yesterday's shards have
(doc_id, text), today's add (lang, source). `ray.data.read_parquet`
over such a directory succeeds but emits blocks with DIVERGENT
schemas (it warns "Operator produced a RefBundle with a different
schema"), which breaks any downstream groupby/sort. This module
resolves the union schema from file FOOTERS on the driver (O(files)
metadata, no data reads) and aligns every block to it in one
zero-copy-where-possible `map_batches` pass — missing columns
materialize as typed nulls, column order is canonical.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def resolve_union_schema(paths: list[str]) -> pa.Schema:
    """Union-by-name over file footers: first-seen type wins per
    column name (mixed-type evolution would need casts — out of
    scope, asserted against)."""
    fields: dict[str, pa.Field] = {}
    for p in paths:
        for f in pq.read_schema(p):
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
            elif prev.type != f.type:
                raise TypeError(
                    f"column {f.name!r} has divergent types across files: "
                    f"{prev.type} vs {f.type}"
                )
    return pa.schema(list(fields.values()))


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
    return [path]


def read_parquet_union_by_name(
    path: str | list[str], **read_kwargs
) -> "ray.data.Dataset":
    """Read parquet files/dirs whose schemas differ by ADDED columns,
    aligning every block to the union schema (missing columns become
    typed nulls, canonical column order)."""
    roots = [path] if isinstance(path, str) else list(path)
    paths = [p for r in roots for p in _expand(r)]
    schema = resolve_union_schema(paths)

    def _align(t: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in t.column_names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=schema)

    return ray.data.read_parquet(paths, **read_kwargs).map_batches(
        _align, batch_format="pyarrow"
    )
