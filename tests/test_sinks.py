import os

import ray.data

from ocr_pipeline_ray.pipelines.extract import build_extraction_pipeline
from ocr_pipeline_ray.stages.sinks import write_result_txt, write_visual_ppm


def test_result_txt_sink(small_corpus, tmp_path):
    docs, media, golden = small_corpus
    ds = ray.data.from_arrow(docs.slice(0, 30))
    out = build_extraction_pipeline(ds, media)
    n = write_result_txt(out, str(tmp_path / "results"))
    assert n == 30
    gold = {r["doc_id"]: r["spans"] for r in golden.to_pylist()}
    path = tmp_path / "results" / "doc-00000005.txt"
    lines = path.read_text(encoding="utf-8").splitlines()
    spans = gold["doc-00000005"]
    assert len(lines) == len(spans)
    for line, s in zip(lines, spans):  # offset order == golden order
        off, kind, text = line.split("\t", 2)
        assert (int(off), kind, text) == (s["offset"], s["kind"], s["text"])


def test_visual_ppm_sink(small_corpus, tmp_path):
    """S6 image-draw sink: every doc gets a parseable P6 overview with
    one bar row per span."""
    from ocr_pipeline_ray.functions.ppm_ocr import parse_ppm

    docs, media, golden = small_corpus
    ds = ray.data.from_arrow(docs.slice(0, 12))
    out = build_extraction_pipeline(ds, media)
    n = write_visual_ppm(out, str(tmp_path / "viz"))
    assert n == 12
    gold = {r["doc_id"]: r["spans"] for r in golden.to_pylist()}
    for doc_id in list(gold)[:12]:
        p = tmp_path / "viz" / f"{doc_id}.ppm"
        if not p.exists():
            continue  # slice(0,12) covers the first 12 doc_ids only
        img = parse_ppm(p.read_bytes())
        assert img.shape[1] == 256
        assert img.shape[0] == 7 + 2 + 8 * len(gold[doc_id])
    written = sorted(os.listdir(tmp_path / "viz"))
    assert len(written) == 12


def test_tar_shard_roundtrip_bytes(tmp_path):
    """Tar shards are byte-reproducible (zeroed mtimes, sorted member
    order) and the reader inverts the writer exactly."""
    import pandas as pd

    from ocr_pipeline_ray.sources.tarshard import read_tar_shards, write_tar_shards

    df = pd.DataFrame(
        {"doc_id": list(range(20)), "text": [f"doc {i} bodyé" for i in range(20)]}
    )
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_tar_shards(ray.data.from_pandas(df), d1, n_shards=4)
    m2 = write_tar_shards(ray.data.from_pandas(df.sample(frac=1, random_state=0)), d2, n_shards=4)
    assert m1["n_members"].sum() == 20
    for i in range(4):
        b1 = (tmp_path / "a" / f"shard-{i:05d}.tar").read_bytes()
        b2 = (tmp_path / "b" / f"shard-{i:05d}.tar").read_bytes()
        assert b1 == b2  # input order must not leak into shard bytes

    back = read_tar_shards(d1).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(df.astype({"doc_id": "int64"}))
