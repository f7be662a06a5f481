"""Run the test suite on the real TPU, one pytest process per test file.

Why per-file processes (r5 finding, tools/ / ROADMAP r5): the axon tunnel
is POISONED by the first failed dispatch — after any UNIMPLEMENTED error
(e.g. one stray eager complex64 op) every subsequent execution in the
same process returns UNIMPLEMENTED, including already-compiled pure-f32
jits. In-process, one bad call site fails the rest of the suite
collaterally (this is what made r4's on-TPU run read 56/178 — most of
those failures were poisoning, not real incompatibilities). Per-file
processes contain the blast radius to the file that triggered it.

Usage:  python tools/tpu_suite.py [extra pytest args...]
Writes a per-file table + totals to stdout and TPU_SUITE.json.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_file(path: str, extra):
    env = dict(os.environ, RADIOFRAME_TEST_TPU="1")
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", "-p", "no:cacheprovider",
         *extra],
        capture_output=True, text=True, cwd=REPO, timeout=1800, env=env)
    dt = time.time() - t0
    tail = (p.stdout.strip().splitlines() or [""])[-1]
    counts = dict(passed=0, failed=0, skipped=0, errors=0)
    for n, kind in re.findall(r"(\d+) (passed|failed|skipped|error)", tail):
        counts[kind if kind != "error" else "errors"] = int(n)
    return counts, round(dt, 1), tail


def main():
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    totals = dict(passed=0, failed=0, skipped=0, errors=0)
    per_file = {}
    for f in files:
        name = os.path.basename(f)
        counts, dt, tail = run_file(f, sys.argv[1:])
        retried = False
        if counts["failed"] or counts["errors"]:
            # one retry: tunnel contention / timing-sensitive tests flake
            # under the shared box; a PERSISTENT failure still fails, and
            # the artifact records that a retry happened
            counts2, dt2, tail = run_file(f, sys.argv[1:])
            retried, counts, dt = True, counts2, round(dt + dt2, 1)
        per_file[name] = {**counts, "seconds": dt}
        if retried:
            per_file[name]["retried"] = True
        for k in totals:
            totals[k] += counts[k]
        flag = "" if not (counts["failed"] or counts["errors"]) else "  <-- "
        if retried and not flag:
            flag = "  (passed on retry)"
        print(f"{name:28s} {counts['passed']:4d} passed "
              f"{counts['failed']:3d} failed {counts['skipped']:3d} skipped "
              f"({dt:6.1f}s){flag}", flush=True)
    print(f"\nTOTAL: {totals['passed']} passed, {totals['failed']} failed, "
          f"{totals['skipped']} skipped, {totals['errors']} errors")
    with open(os.path.join(REPO, "TPU_SUITE.json"), "w") as fh:
        json.dump({"totals": totals, "per_file": per_file}, fh, indent=1)


if __name__ == "__main__":
    main()
