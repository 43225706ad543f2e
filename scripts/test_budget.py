# coding: utf-8
"""Wall-time budget gate for the full test suite.

Runs the complete pytest suite (fast + slow) with per-test durations,
aggregates them per module, prints the per-module table sorted by cost,
and fails if total wall time exceeds the budget (default 25 minutes —
VERDICT r4 #8: "Done = full suite <= 25 min, no coverage loss").

Usage:
    python scripts/test_budget.py            # run + report + enforce
    JOEYS2T_TEST_BUDGET_S=1800 python scripts/test_budget.py

The per-module table makes the worst offenders visible so future rounds
trim or merge fixtures instead of letting the slow set grow unbounded.
"""
import os
import re
import subprocess
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# pytest --durations line, e.g.:
#   54.21s call     tests/test_model_forward.py::TestRemat::test_bit_parity
_DUR = re.compile(r"^\s*(\d+\.\d+)s\s+(call|setup|teardown)\s+(tests/[\w/]+\.py)")


def main():
    budget = float(os.environ.get("JOEYS2T_TEST_BUDGET_S", "1500"))
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           "--durations=0", "--durations-min=0.5"]
    # Fresh empty compilation-cache dir: the budget gate measures the
    # cold-cache wall time (in-run HLO dedupe still applies — that is the
    # suite's own efficiency — but nothing is inherited from prior runs).
    import shutil
    import tempfile
    cache_dir = tempfile.mkdtemp(prefix="joeys2t_budget_jaxcache_")
    env = {**os.environ, "JAX_COMPILATION_CACHE_DIR": cache_dir}
    print(f"[test-budget] running: {' '.join(cmd)} (budget {budget:.0f}s, "
          f"cold compile cache)", flush=True)
    t0 = time.monotonic()
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              env=env)
        wall = time.monotonic() - t0
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)

    per_module = defaultdict(float)
    per_test = []
    for line in proc.stdout.splitlines():
        m = _DUR.match(line)
        if m:
            per_module[m.group(3)] += float(m.group(1))
            if m.group(2) == "call":
                per_test.append((float(m.group(1)), line.strip()))

    tail = proc.stdout.strip().splitlines()
    summary = tail[-1] if tail else "(no output)"
    print(f"\n[test-budget] per-module cost (>=1s, test time only):")
    shown = sorted(per_module.items(), key=lambda kv: -kv[1])
    for mod, s in shown:
        if s >= 1.0:
            print(f"  {s:8.1f}s  {mod}")
    print(f"\n[test-budget] top individual tests:")
    for s, line in sorted(per_test, reverse=True)[:20]:
        print(f"  {line}")

    print(f"\n[test-budget] pytest: {summary}")
    print(f"[test-budget] wall: {wall:.1f}s of {budget:.0f}s budget "
          f"({100.0 * wall / budget:.0f}%)")

    if proc.returncode != 0:
        print("[test-budget] FAIL: suite not green", flush=True)
        sys.stdout.write(proc.stdout[-4000:])
        return proc.returncode
    if wall > budget:
        print(f"[test-budget] FAIL: wall {wall:.1f}s > budget {budget:.0f}s",
              flush=True)
        return 3
    print("[test-budget] OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
