"""Round-close gate: the full test suite AND the full-catalog oracle sweep,
exiting non-zero on ANY red — rounds 6, 7, and 8 each closed with a defect
this gate would have caught (a stale pytest assertion twice, a fix shipped
without its sweep artifact once).

Usage: python scripts/round_close.py <round_number>

Runs, in order:
  1. python -m pytest tests/ -q              (must be 0 failed / 0 errors)
  2. python scripts/oracle_check.py --summary SWEEP_r<N>.json
                                             (must end ALL MATCH)

Writes SWEEP_r<N>.json at the repo root so the all-of-them correctness
evidence is committed with the round, then prints a one-line PASS/FAIL.
Exit code 0 only if both gates are green — wire this before the end-of-round
commit, never after.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print("usage: python scripts/round_close.py <round_number>")
        return 2
    rnd = int(sys.argv[1])

    print(f"[round_close] gate 1/2: pytest tests/ (full suite) ...", flush=True)
    p1 = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
        cwd=REPO,
    )
    if p1.returncode != 0:
        print(f"[round_close] FAIL — pytest exit {p1.returncode}")
        return 1

    sweep = os.path.join(REPO, f"SWEEP_r{rnd}.json")
    print(f"[round_close] gate 2/2: full oracle sweep → {sweep} ...", flush=True)
    p2 = subprocess.run(
        [sys.executable, "scripts/oracle_check.py", "--summary", sweep],
        cwd=REPO,
    )
    if p2.returncode != 0:
        print(f"[round_close] FAIL — oracle sweep exit {p2.returncode}")
        return 1

    print(f"[round_close] PASS — suite green, sweep ALL MATCH, {sweep} written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
