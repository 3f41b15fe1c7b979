"""Config-driven pipeline assembly — the engine's user-extension surface.

The reference exposes a factory registry for queue implementations
(reference message_queue/factory.py:6-31), a strategy ABC
(reference message_process/base.py:4-10) and a declared-but-unused
model registry in configs/config.yml:1-13 (`model: craft # [east,
craft, pan, panpp, fast]`). Here the same idea is a plain dict -> a
``ray.data.Dataset`` plan: each stage is a registered name + params,
so a pipeline is data, reviewable and replayable.

Example::

    cfg = {
        "source": {"path": "/data/docs"},
        "stages": [
            {"stage": "explode"},
            {"stage": "extract", "batch_size": 2048},
            {"stage": "reassemble"},
        ],
        "sink": {"path": "/data/out"},          # optional
    }
    ds = build_from_config(cfg, media=media_table)

Register custom stages with :func:`register_stage` (the analog of the
reference's ``MessageQueueFactory.create`` string dispatch).
"""

from __future__ import annotations

from collections.abc import Callable

import ray
import ray.data

from ocr_pipeline_ray.pipelines.extract import (
    SPAN_COLS,
    _ExtractAll,
    read_docs,
)
from ocr_pipeline_ray.stages.explode import explode_batch, filter_kind
from ocr_pipeline_ray.stages.extract import MediaExtractActor, strip_html_batch
from ocr_pipeline_ray.stages.reassemble import reassemble
from ocr_pipeline_ray.state.media_store import broadcast_media

_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


@register_stage("explode")
def _explode(ds, ctx, **kw):
    return ds.map_batches(explode_batch, batch_format="pyarrow")


@register_stage("strip_html")
def _strip(ds, ctx, batch_size: int = 2048, **kw):
    return ds.map_batches(strip_html_batch, batch_format="pyarrow", batch_size=batch_size)


@register_stage("media_extract")
def _media(ds, ctx, batch_size: int = 1024, concurrency=(1, 8), **kw):
    return ds.map_batches(
        MediaExtractActor,
        fn_constructor_kwargs={"media_object_ref": ctx["media_ref"]},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


@register_stage("extract")
def _extract(ds, ctx, batch_size: int = 2048, concurrency=None, **kw):
    if concurrency is None:
        n = int(ray.cluster_resources().get("CPU", 8))
        concurrency = min(max(2, int(n * 0.75)), max(1, n - 1))
    return ds.map_batches(
        _ExtractAll,
        fn_constructor_kwargs={"media_object_ref": ctx["media_ref"]},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).select_columns(SPAN_COLS)


@register_stage("filter_kind")
def _filter(ds, ctx, kinds=("text",), **kw):
    return ds.map_batches(filter_kind(tuple(kinds)), batch_format="pyarrow")


@register_stage("reassemble")
def _reassemble(ds, ctx, num_buckets=None, **kw):
    return reassemble(ds, num_buckets=num_buckets)


@register_stage("repartition")
def _repartition(ds, ctx, n: int = 32, shuffle: bool = False, **kw):
    return ds.repartition(n, shuffle=shuffle)


def build_from_config(cfg: dict, media=None) -> "ray.data.Dataset":
    """Assemble a lazy Dataset plan from a config dict."""
    src = cfg["source"]
    ds = read_docs(src["path"]) if "path" in src else ray.data.from_arrow(src["table"])
    ctx = {}
    if media is not None:
        ctx["media_ref"] = media if isinstance(media, ray.ObjectRef) else broadcast_media(media)
    for spec in cfg.get("stages", []):
        spec = dict(spec)
        name = spec.pop("stage")
        if name not in _REGISTRY:
            raise KeyError(f"unknown stage '{name}' (registered: {sorted(_REGISTRY)})")
        ds = _REGISTRY[name](ds, ctx, **spec)
    if "sink" in cfg:
        ds.write_parquet(cfg["sink"]["path"])
    return ds
