"""Resumable partitioned extraction runs: checkpoint + lineage + metrics.

Formalizes the reference's artifact-exists-as-done primitive
(reference load_test.py:16-23 counts ``result.txt`` files to detect
completion) and its JSONL monitoring sink
(reference monitoring/monitoring.py:181-194) into an explicit
partition-commit protocol (north rule: "resumable from checkpoint with
per-partition lineage + metrics"):

* The input is split into partitions **by input file** (no read
  amplification — each partition touches only its own parquet
  fragments; at cluster scale a partition is an input shard / key
  range).
* Each partition runs the full streaming pipeline and writes to
  ``out/part-{i}.tmp/``, which is atomically renamed to
  ``out/part-{i}/`` after success; the lineage record
  ``_lineage/part-{i}.json`` (input files, doc/span/error counts,
  duration) is written after the rename — a partition is committed
  iff its lineage record exists.
* ``resume=True`` (default) skips committed partitions — a killed job
  re-runs only uncommitted work. Doc identity is deterministic
  (no uuids/timestamps in rows, SURVEY.md M12), so replays are
  idempotent.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import ray.data

from ocr_pipeline_ray.pipelines.extract import build_extraction_pipeline


def _partitions(files: list[str], n_parts: int) -> list[list[str]]:
    files = sorted(files)
    n_parts = min(n_parts, len(files)) or 1
    return [files[i::n_parts] for i in range(n_parts)]


def list_input_files(docs_path: str) -> list[str]:
    if os.path.isfile(docs_path):
        return [docs_path]
    return sorted(
        os.path.join(docs_path, f)
        for f in os.listdir(docs_path)
        if f.endswith(".parquet")
    )


def committed_partitions(out_dir: str) -> set[int]:
    lineage_dir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(lineage_dir):
        return set()
    parts = set()
    for f in os.listdir(lineage_dir):
        if f.startswith("part-") and f.endswith(".json"):
            parts.add(int(f[len("part-"):-len(".json")]))
    return parts


def _lineage_record(out_dir: str, i: int) -> dict | None:
    lp = os.path.join(out_dir, "_lineage", f"part-{i}.json")
    if not os.path.exists(lp):
        return None
    with open(lp) as f:
        return json.load(f)


def valid_committed_partitions(out_dir: str, parts: list[list[str]]) -> set[int]:
    """Committed partitions whose lineage record matches the CURRENT
    striped file assignment. If the input file set or partition count
    changed between the original run and this resume, membership
    shifts — a record whose ``input_files`` no longer equals the
    current ``parts[i]`` is stale and its partition must re-run
    (otherwise new files would silently never be processed)."""
    valid = set()
    for i in committed_partitions(out_dir):
        if i >= len(parts):
            continue  # partition index no longer exists under the new layout
        rec = _lineage_record(out_dir, i)
        if rec is not None and rec.get("input_files") == parts[i]:
            valid.add(i)
    return valid


def run_partitioned_extraction(
    docs_path: str,
    media: pa.Table,
    out_dir: str,
    n_parts: int = 8,
    resume: bool = True,
    on_part_done=None,
    **pipeline_kwargs,
) -> dict:
    """Run extraction partition-by-partition with commit + resume.

    Returns the run summary (also written to ``_lineage/summary.json``).
    ``on_part_done(part_idx)`` is a test hook (e.g. raise to simulate a
    mid-run kill).
    """
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    files = list_input_files(docs_path)
    parts = _partitions(files, n_parts)
    # resume trusts a lineage record only if its input_files match the
    # current striped assignment — a changed file set or n_parts
    # invalidates stale commits instead of silently skipping new work.
    # Cleanup covers EVERY existing part index (committed or not, in
    # or beyond the current layout): a resume=False re-run with fewer
    # parts must not leave old part-{i} dirs that read_output would
    # then concatenate as duplicates.
    done = valid_committed_partitions(out_dir, parts) if resume else set()
    existing = committed_partitions(out_dir)
    for d in os.listdir(out_dir):
        name = d[:-len(".tmp")] if d.endswith(".tmp") else d
        if name.startswith("part-") and name[len("part-"):].isdigit():
            existing.add(int(name[len("part-"):]))
    stale = existing - done if resume else existing | set(range(len(parts)))
    for i in sorted(stale):
        shutil.rmtree(os.path.join(out_dir, f"part-{i}"), ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, f"part-{i}.tmp"), ignore_errors=True)
        lp = os.path.join(out_dir, "_lineage", f"part-{i}.json")
        if os.path.exists(lp):
            os.remove(lp)

    media_ref = ray.put(media)
    ran, skipped = [], []
    for i, part_files in enumerate(parts):
        if i in done:
            skipped.append(i)
            continue
        t0 = time.time()
        part_dir = os.path.join(out_dir, f"part-{i}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)  # torn previous attempt
        shutil.rmtree(part_dir, ignore_errors=True)

        part_kwargs = dict(pipeline_kwargs)
        if part_kwargs.get("stage_dir"):
            # kind-split staging is per-partition state: isolate it so
            # a partition never reads another partition's staged rows
            part_kwargs["stage_dir"] = os.path.join(part_kwargs["stage_dir"], f"part-{i}")
            shutil.rmtree(part_kwargs["stage_dir"], ignore_errors=True)

        ds = ray.data.read_parquet(part_files)
        out = build_extraction_pipeline(ds, media_ref, **part_kwargs)
        out.write_parquet(tmp_dir)

        # partition metrics from the committed parquet (exact, cheap)
        t = pa.parquet.read_table(tmp_dir, columns=["n_spans", "n_errors"])
        n_docs = t.num_rows
        n_spans = int(pa.compute.sum(t["n_spans"]).as_py() or 0)
        n_errors = int(pa.compute.sum(t["n_errors"]).as_py() or 0)

        os.rename(tmp_dir, part_dir)  # atomic commit of data
        duration = time.time() - t0
        lineage = {
            "part": i,
            "input_files": part_files,
            "n_docs": n_docs,
            "n_spans": n_spans,
            "n_errors": n_errors,
            "duration_sec": round(duration, 3),
            "docs_per_sec": round(n_docs / duration, 3) if duration > 0 else None,
        }
        lp = os.path.join(out_dir, "_lineage", f"part-{i}.json")
        with open(lp + ".tmp", "w") as f:
            json.dump(lineage, f)
        os.rename(lp + ".tmp", lp)  # atomic commit of the lineage record
        ran.append(i)
        if on_part_done is not None:
            on_part_done(i)

    # aggregate metrics across all committed partitions
    totals = {"n_docs": 0, "n_spans": 0, "n_errors": 0, "duration_sec": 0.0}
    for i in range(len(parts)):
        lp = os.path.join(out_dir, "_lineage", f"part-{i}.json")
        if os.path.exists(lp):
            rec = json.load(open(lp))
            for k in ("n_docs", "n_spans", "n_errors"):
                totals[k] += rec[k]
            totals["duration_sec"] += rec["duration_sec"]
    summary = {
        "n_parts": len(parts),
        "ran": ran,
        "skipped_committed": skipped,
        **totals,
    }
    with open(os.path.join(out_dir, "_lineage", "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


def read_output(out_dir: str) -> pa.Table:
    """Read all COMMITTED partitions as one Arrow table.

    A partition counts only if its lineage record exists — a data dir
    without a record (torn run, or leftover from a prior layout with
    more partitions) is never read, so stale ``part-{i}`` dirs can't
    duplicate docs."""
    dirs = [
        os.path.join(out_dir, f"part-{i}")
        for i in sorted(committed_partitions(out_dir))
        if os.path.isdir(os.path.join(out_dir, f"part-{i}"))
    ]
    return pa.concat_tables([pa.parquet.read_table(d) for d in dirs])
