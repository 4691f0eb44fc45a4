"""Round-close gate: the full test suite AND the full-catalog oracle sweep,
exiting non-zero on ANY red — rounds 6, 7, and 8 each closed with a defect
this gate would have caught (a stale pytest assertion twice, a fix shipped
without its sweep artifact once).

Usage: python scripts/round_close.py <round_number> [--no-bench]

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
  3. python bench.py → BENCH_r<N>_local.json (must report contended: false —
                                             round-10 verdict #2: BENCH_r10
                                             shipped load-noisy; bench.py
                                             retries once after a loadavg
                                             settle, then this gate fails
                                             loudly; --no-bench skips it
                                             during iteration)

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
    """Every `- **sev** anchor — ...` bullet in ADVICE.md must have its OWN
    disposition line in ADVICE_STATUS.md (FIXED / STALE / ACCEPTED).

    Matching (round-10 ADVICE #3 — the old path-substring rule let one
    status line satisfy two bullets anchored in the same file): a status
    line is consumed by the bullet whose exact `path:line` anchor it
    contains; bullets left over fall back to path-only matching against the
    UNCONSUMED status lines, each line satisfying at most one bullet. So
    two items in the same file need two status lines, while a line number
    that drifted after the fix still matches by path. Returns problems."""
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
        stat_lines = [
            ln
            for ln in fh.read().splitlines()
            if re.search(r"\b(FIXED|STALE|ACCEPTED)\b", ln)
        ]
    consumed = [False] * len(stat_lines)
    unmatched = []
    # pass 1: exact path:line anchors
    for anchor in bullets:
        hit = next(
            (
                i
                for i, ln in enumerate(stat_lines)
                if not consumed[i] and anchor in ln
            ),
            None,
        )
        if hit is None:
            unmatched.append(anchor)
        else:
            consumed[hit] = True
    # pass 2: path-only (line numbers drift once the item is fixed), each
    # remaining status line satisfying at most ONE bullet
    problems = []
    for anchor in unmatched:
        path = anchor.split(":")[0]
        hit = next(
            (
                i
                for i, ln in enumerate(stat_lines)
                if not consumed[i] and path in ln
            ),
            None,
        )
        if hit is None:
            problems.append(
                f"ADVICE item {anchor} has no FIXED/STALE/ACCEPTED line of "
                "its own in ADVICE_STATUS.md"
            )
        else:
            consumed[hit] = True
    return problems


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print("usage: python scripts/round_close.py <round_number>")
        return 2
    rnd = int(sys.argv[1])

    print("[round_close] gate 0/3: ADVICE.md dispositions ...", flush=True)
    problems = advice_dispositions()
    if problems:
        for p in problems:
            print(f"[round_close]   {p}")
        print("[round_close] FAIL — advise items lack dispositions")
        return 1

    print(f"[round_close] gate 1/3: pytest tests/ (full suite) ...", flush=True)
    p1 = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
        cwd=REPO,
    )
    if p1.returncode != 0:
        print(f"[round_close] FAIL — pytest exit {p1.returncode}")
        return 1

    sweep = os.path.join(REPO, f"SWEEP_r{rnd}.json")
    print(f"[round_close] gate 2/3: full oracle sweep → {sweep} ...", flush=True)
    p2 = subprocess.run(
        [sys.executable, "scripts/oracle_check.py", "--summary", sweep],
        cwd=REPO,
    )
    if p2.returncode != 0:
        print(f"[round_close] FAIL — oracle sweep exit {p2.returncode}")
        return 1

    # Gate 3 (round-10 verdict #2): the round's bench evidence must come
    # from a quiet machine. bench.py itself retries once after a bounded
    # loadavg settle; if the sentinel STILL fires, fail the round loudly
    # instead of committing a load-noise BENCH. Skippable for fast
    # iteration with --no-bench (the final close must run it).
    if "--no-bench" in sys.argv:
        print("[round_close] gate 3/3: SKIPPED (--no-bench)")
        print(f"[round_close] PASS — suite green, sweep ALL MATCH, {sweep} written")
        return 0
    bench_out = os.path.join(REPO, f"BENCH_r{rnd}_local.json")
    print(f"[round_close] gate 3/3: quiet bench → {bench_out} ...", flush=True)
    p3 = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, capture_output=True, text=True
    )
    if p3.returncode != 0:
        print(p3.stdout)
        print(p3.stderr)
        print(f"[round_close] FAIL — bench exit {p3.returncode}")
        return 1
    line = next(
        (
            ln
            for ln in reversed(p3.stdout.splitlines())
            if ln.startswith("{") and '"metric"' in ln
        ),
        None,
    )
    if line is None:
        print(p3.stdout)
        print("[round_close] FAIL — bench emitted no JSON line")
        return 1
    import json

    rec = json.loads(line)
    with open(bench_out, "w", encoding="utf-8") as fh:
        fh.write(line + "\n")
    print(f"[round_close]   bench value {rec['value']} s, "
          f"contended={rec['contended']} attempts={rec.get('attempts')}")
    if rec["contended"]:
        print(
            "[round_close] FAIL — bench still contended after its internal "
            "retry (loadavg_start "
            f"{rec.get('loadavg_start')}); re-run on a quiet machine"
        )
        return 1

    print(
        f"[round_close] PASS — suite green, sweep ALL MATCH, quiet bench "
        f"{rec['value']} s, {sweep} written"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
