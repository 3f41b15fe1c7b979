"""Cluster job entrypoint for the partitioned, resumable extraction run.

Submit to a Ray cluster exactly as the north rule prescribes::

    ray job submit --working-dir . -- \
        python tools/run_extraction_job.py \
        --docs /data/corpus_docs --media /data/corpus_media.parquet \
        --out /data/extracted --n-parts 256

The job streams each partition through the extraction pipeline
(read -> fused extract actor pool -> write), commits partitions
atomically with per-partition lineage + metrics, and RESUMES from the
last committed partition if resubmitted after a failure (see
pipelines/checkpoint.py). ``--no-resume`` forces a clean re-run.

In this sandbox the same entrypoint runs against the local session
(`RAY_ADDRESS=local`); on a cluster, `ray job submit` routes it to the
head node unchanged — the script owns its Ray session either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# self-locating: `ray job submit --working-dir .` (or a bare python
# invocation from anywhere) must find the package without PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="docs table: parquet file/dir or lance dir")
    ap.add_argument("--media", required=True, help="media side table (parquet)")
    ap.add_argument("--out", required=True, help="output root (part-{i}/ + _lineage/)")
    ap.add_argument("--n-parts", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--split-kinds", action="store_true", help="kind+size-aware routing topology")
    ap.add_argument("--stage-dir", default=None, help="staging dir for --split-kinds")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU override")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        init_kwargs = {"include_dashboard": False}
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    import pyarrow.parquet as pq

    from ocr_pipeline_ray.pipelines.checkpoint import run_partitioned_extraction

    media = pq.read_table(args.media)
    pipeline_kwargs = {}
    if args.split_kinds:
        if not args.stage_dir:
            ap.error("--split-kinds requires --stage-dir")
        pipeline_kwargs = {"split_kinds": True, "stage_dir": args.stage_dir}

    summary = run_partitioned_extraction(
        args.docs,
        media,
        args.out,
        n_parts=args.n_parts,
        resume=not args.no_resume,
        **pipeline_kwargs,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
