"""Round-close gate: the full test suite AND the full-catalog oracle sweep,
exiting non-zero on ANY red — rounds 6, 7, and 8 each closed with a defect
this gate would have caught (a stale pytest assertion twice, a fix shipped
without its sweep artifact once).

Usage: python scripts/round_close.py <round_number>

Runs, in order:
  0. ADVICE.md disposition check            (every advisor item must have a
                                             FIXED/STALE/ACCEPTED entry in
                                             ADVICE_STATUS.md — round-9
                                             verdict #6: both r8 lows were
                                             fixed in-round but ADVICE.md
                                             still listed them as open, so a
                                             cold reader would re-do closed
                                             work)
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
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def advice_dispositions() -> list[str]:
    """Every `- **sev** anchor — ...` bullet in ADVICE.md must have a line
    in ADVICE_STATUS.md containing the same anchor plus a disposition
    keyword (FIXED / STALE / ACCEPTED). Returns the list of problems."""
    advice = os.path.join(REPO, "ADVICE.md")
    status = os.path.join(REPO, "ADVICE_STATUS.md")
    if not os.path.exists(advice):
        return []
    with open(advice, encoding="utf-8") as fh:
        bullets = re.findall(
            r"^- \*\*(?:low|medium|high)\*\* (\S+?) —", fh.read(), re.M
        )
    if not bullets:
        return []
    if not os.path.exists(status):
        return [f"ADVICE_STATUS.md missing but ADVICE.md has {len(bullets)} items"]
    with open(status, encoding="utf-8") as fh:
        stat = fh.read()
    problems = []
    for anchor in bullets:
        # match on the file path — the advisor's line number drifts as the
        # file is edited, so requiring the exact :line would go stale the
        # moment the item is fixed
        path = anchor.split(":")[0]
        line_re = re.compile(
            rf"^.*{re.escape(path)}.*\b(FIXED|STALE|ACCEPTED)\b", re.M
        )
        if not line_re.search(stat):
            problems.append(
                f"ADVICE item {anchor} has no FIXED/STALE/ACCEPTED line in "
                "ADVICE_STATUS.md"
            )
    return problems


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print("usage: python scripts/round_close.py <round_number>")
        return 2
    rnd = int(sys.argv[1])

    print("[round_close] gate 0/2: ADVICE.md dispositions ...", flush=True)
    problems = advice_dispositions()
    if problems:
        for p in problems:
            print(f"[round_close]   {p}")
        print("[round_close] FAIL — advise items lack dispositions")
        return 1

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
