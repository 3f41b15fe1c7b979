"""WebDataset-style tar shard sink + distributed reader.

Large-scale multimodal training corpora ship as numbered tar shards
(the WebDataset convention: one member per sample, members grouped by
key) because sequential tar reads are the fastest object-store access
pattern and shards are the natural resume/parallelism unit. The
container has no `webdataset` package; tar is stdlib, so both sides
are real:

- :func:`write_tar_shards` — documents stream through ONE coarse
  shuffle on ``shard = key % n_shards`` and each shard group writes
  exactly one ``shard-NNNNN.tar`` (deterministic member order and
  zeroed mtimes/uids -> byte-reproducible shards, the resumable-sink
  convention).
- :func:`read_tar_shards` — the driver lists shard paths (O(shards))
  and each shard is read by one task via ``flat_map``; no shard ever
  reaches the driver.

At 100 TB the unit of work is the shard (thousands of ~1 GB tars),
matching Ray Data's block model one-to-one.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np
import pandas as pd
import ray.data


def write_tar_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Write ``(key, text)`` rows as ``n_shards`` tar shards; returns
    the (shard, n_members) manifest (tiny — one row per shard)."""
    os.makedirs(out_dir, exist_ok=True)

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_col, text_col]].copy()
        df["__shard"] = (df[key_col].to_numpy() % n_shards).astype("int64")
        return df

    def _write(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["__shard"].iloc[0])
        g = g.sort_values(key_col)
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        with tarfile.open(path, "w") as tf:
            for k, s in zip(g[key_col].to_numpy(), g[text_col]):
                payload = str(s).encode("utf-8")
                info = tarfile.TarInfo(name=f"{int(k)}.txt")
                info.size = len(payload)
                info.mtime = 0  # deterministic, byte-reproducible shard
                tf.addfile(info, io.BytesIO(payload))
        return pd.DataFrame({"shard": [shard], "n_members": [len(g)]})

    manifest = (
        ds.map_batches(_assign, batch_format="pandas")
        .groupby("__shard")
        .map_groups(lambda g: _write(g), batch_format="pandas")
        .to_pandas()
    )
    return manifest.sort_values("shard").reset_index(drop=True)


def read_tar_shards(out_dir: str) -> "ray.data.Dataset":
    """One read task per shard: ``from_items(paths).flat_map`` — the
    shard list is O(shards) driver metadata, member payloads stay in
    the tasks."""
    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".tar")
    )

    def _read_shard(row: dict) -> list[dict]:
        out = []
        with tarfile.open(row["path"], "r") as tf:
            for m in tf.getmembers():
                data = tf.extractfile(m).read().decode("utf-8")
                out.append({"doc_id": np.int64(m.name[: -len(".txt")]),
                            "text": data})
        return out

    return ray.data.from_items([{"path": p} for p in paths]).flat_map(_read_shard)
