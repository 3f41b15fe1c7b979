"""Resume-after-kill test (SURVEY.md §5): kill after partition k
commits, rerun, assert committed partitions are not reprocessed and
the final output equals a single-run output."""

import json
import os

import pyarrow.parquet as pq
import pytest

from ocr_pipeline_ray.pipelines.checkpoint import (
    committed_partitions,
    read_output,
    run_partitioned_extraction,
)
from ocr_pipeline_ray.sources.gen import write_corpus


class _Kill(Exception):
    pass


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt_corpus"))
    paths = write_corpus(d, 300, seed=42, shards=8)
    media = pq.read_table(paths["media"])
    return paths, media


def _spans_key(table):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in table.to_pylist()
    }


def test_kill_and_resume(corpus, tmp_path):
    paths, media = corpus
    out_a = str(tmp_path / "single")
    run_partitioned_extraction(paths["docs"], media, out_a, n_parts=4)
    single = read_output(out_a)

    out_b = str(tmp_path / "resumed")

    def killer(part):
        if part == 1:
            raise _Kill()

    with pytest.raises(_Kill):
        run_partitioned_extraction(paths["docs"], media, out_b, n_parts=4, on_part_done=killer)
    assert committed_partitions(out_b) == {0, 1}
    mtimes = {
        i: os.path.getmtime(os.path.join(out_b, "_lineage", f"part-{i}.json")) for i in (0, 1)
    }

    summary = run_partitioned_extraction(paths["docs"], media, out_b, n_parts=4)
    assert sorted(summary["skipped_committed"]) == [0, 1]
    assert sorted(summary["ran"]) == [2, 3]
    for i in (0, 1):  # committed partitions untouched
        assert os.path.getmtime(os.path.join(out_b, "_lineage", f"part-{i}.json")) == mtimes[i]

    resumed = read_output(out_b)
    assert _spans_key(resumed) == _spans_key(single)
    assert summary["n_docs"] == 300


def test_resume_invalidates_stale_layout(corpus, tmp_path):
    """A resume with a different n_parts (shifted striped assignment)
    must NOT trust old lineage records: stale commits re-run and
    read_output never mixes in leftover part dirs from the old layout."""
    paths, media = corpus
    out = str(tmp_path / "relayout")

    def killer(part):
        if part == 2:
            raise _Kill()

    with pytest.raises(_Kill):
        run_partitioned_extraction(paths["docs"], media, out, n_parts=6, on_part_done=killer)
    assert committed_partitions(out) == {0, 1, 2}

    # resume under a DIFFERENT partition layout: every old record's
    # input_files mismatches the new striping -> all 4 partitions run
    summary = run_partitioned_extraction(paths["docs"], media, out, n_parts=4)
    assert summary["skipped_committed"] == []
    assert sorted(summary["ran"]) == [0, 1, 2, 3]
    assert summary["n_docs"] == 300

    resumed = read_output(out)
    ref_out = str(tmp_path / "relayout_ref")
    run_partitioned_extraction(paths["docs"], media, ref_out, n_parts=4)
    assert _spans_key(resumed) == _spans_key(read_output(ref_out))


def test_read_output_ignores_uncommitted_dirs(corpus, tmp_path):
    """A part dir without a lineage record (torn run or stale layout)
    is never read back."""
    paths, media = corpus
    out = str(tmp_path / "torn")
    run_partitioned_extraction(paths["docs"], media, out, n_parts=2)
    base = read_output(out)
    # fake a torn/stale extra partition dir: data present, no record
    import shutil

    shutil.copytree(os.path.join(out, "part-0"), os.path.join(out, "part-7"))
    assert _spans_key(read_output(out)) == _spans_key(base)


def test_no_resume_rerun_with_fewer_parts_never_duplicates(corpus, tmp_path):
    """resume=False with a smaller n_parts must clean up ALL old part
    dirs (including indices beyond the new layout) — otherwise
    read_output concatenates stale parts and duplicates docs."""
    paths, media = corpus
    out = str(tmp_path / "shrink")
    run_partitioned_extraction(paths["docs"], media, out, n_parts=8)
    first = read_output(out)
    summary = run_partitioned_extraction(paths["docs"], media, out, n_parts=3, resume=False)
    assert sorted(summary["ran"]) == [0, 1, 2]
    again = read_output(out)
    assert again.num_rows == first.num_rows == 300
    assert _spans_key(again) == _spans_key(first)


def test_lineage_records(corpus, tmp_path):
    paths, media = corpus
    out = str(tmp_path / "lin")
    summary = run_partitioned_extraction(paths["docs"], media, out, n_parts=3)
    assert summary["n_docs"] == 300
    assert summary["n_errors"] >= 1  # the missing-media edge fixture
    for i in range(3):
        rec = json.load(open(os.path.join(out, "_lineage", f"part-{i}.json")))
        assert rec["n_docs"] > 0 and rec["n_spans"] >= rec["n_docs"]
        assert rec["input_files"] and rec["duration_sec"] > 0
