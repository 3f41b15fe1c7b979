"""Oracle (sequential reference-semantics extractor) vs generator ground truth."""

from ocr_pipeline_ray.oracle import extract_docs


def test_oracle_matches_golden(small_corpus):
    docs, media, golden = small_corpus
    out = extract_docs(docs, media)
    assert out.to_pylist() == golden.to_pylist()


def test_edge_fixtures_present(small_corpus):
    docs, media, golden = small_corpus
    rows = {r["doc_id"]: r["spans"] for r in docs.to_pylist()}
    # doc 0 ends with an empty text span
    assert rows["doc-00000000"][-1]["kind"] == "text"
    assert rows["doc-00000000"][-1]["text"] == ""
    # doc 1 ends with an image span whose media_ref is missing
    last = rows["doc-00000001"][-1]
    assert last["kind"] == "image"
    refs = set(media["media_ref"].to_pylist())
    assert last["media_ref"] not in refs
    # golden keeps the failed span with text ""
    g = {r["doc_id"]: r["spans"] for r in golden.to_pylist()}
    assert g["doc-00000001"][-1]["text"] == ""


def test_ids_unique(small_corpus):
    docs, _, _ = small_corpus
    ids = docs["doc_id"].to_pylist()
    assert len(ids) == len(set(ids))
    for r in docs.to_pylist():
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))  # strictly increasing, dense
