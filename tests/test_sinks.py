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
