import os

import ray.data

from ocr_pipeline_ray.pipelines.extract import build_extraction_pipeline
from ocr_pipeline_ray.stages.sinks import write_result_txt


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
