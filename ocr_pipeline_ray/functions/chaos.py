"""Chaos-testing engine: hard-kills its worker process once.

Used by tests/test_fault_tolerance.py to prove the extract actor
pool's ``max_restarts``/``max_task_retries`` policy recovers from a
hard crash (OOM-kill / preemption analog) with golden output. Lives in
the package (not the test module) so the RESTARTED actor can
deserialize its constructor args — a worker restart re-imports the
class by module path.
"""

from __future__ import annotations

import os
import tempfile

from ocr_pipeline_ray.stages.extract import SyntheticEngine

KILL_FLAG = os.path.join(tempfile.gettempdir(), "ocr_ray_test_kill_flag")


def arm() -> None:
    with open(KILL_FLAG, "w") as f:
        f.write("1")


def armed() -> bool:
    return os.path.exists(KILL_FLAG)


def disarm() -> None:
    try:
        os.remove(KILL_FLAG)
    except FileNotFoundError:
        pass


class KillOnceEngine(SyntheticEngine):
    """Kills the worker the first time any actor extracts while the
    kill-flag file exists; the flag is consumed atomically, so exactly
    one crash happens per armed run."""

    def extract(self, kind: str, media_ref: str, payload: bytes) -> str:
        try:
            os.remove(KILL_FLAG)
        except FileNotFoundError:
            pass
        else:
            os._exit(1)  # hard process death — no exception, no cleanup
        return super().extract(kind, media_ref, payload)
