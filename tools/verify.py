#!/usr/bin/env python
"""Round-end verification battery (VERDICT r3 #4: non-negotiable gating).

Runs, in order:
  1. the full pytest suite (with OVS_FULL_ORACLE=1 so the beyond-prefix
     oracle gate in tests/test_oracle_surface.py runs too),
  2. the full local oracle gate (tools/oracle_check.py) at sf0.01,
  3. the registry-wide scale-killer plan lint (tools/plan_lint.py) at
     sf0.001 — the executable form of the old hand-adjudicated
     global-window warnings (r9),
  4. a bench.py smoke at the smallest fixture (rc=0 + parseable JSON).

Writes a VERIFY.log summary at the repo root and exits non-zero if any
stage fails. The LAST commit of every round must include a VERIFY.log
showing 0 failures.

Usage: python tools/verify.py [--fast] [--allow-dirty] [--round-close]
  --fast        skip the full-oracle pytest env var (fast suite)
  --allow-dirty iteration runs only — by default a dirty tracked tree
                REFUSES to verify (r10 closed with VERIFY.log
                predating the final commits; the log now records the
                verified HEAD and the round-close flow is: commit all
                code -> python tools/verify.py -> commit VERIFY.log)
  --round-close SELF-ENFORCING round close (VERDICT r14 #1: two
                consecutive rounds shipped a stale VERIFY.log because
                "run battery" and "commit the log" were separate
                manual steps). Requires a clean tree, runs the full
                battery, and on PASS immediately commits VERIFY.log
                itself — so the round's last commit IS the green log
                whose recorded HEAD is its parent. On FAIL nothing is
                committed and the exit code is non-zero.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Per-stage wall-clock ceilings (ADVICE r4: a wedged stage must FAIL
# the gate, not hang it). Generous vs observed times (pytest ~8 min
# idle — but r13 measured the shared host stretching every stage 2-3x
# under neighbor load, and the r13 residue/nightly suites add ~8 min;
# the r13 battery lost a run to the old 2400 s pytest ceiling at 79%
# progress, so ceilings now cover the contended case, not the idle
# one. A wedged stage still dies — just later.)
TIMEOUTS = {
    "pytest": 4200,
    "oracle_check": 3000,
    "plan_lint": 2400,
    "bench_smoke": 1200,
}


def run(name: str, cmd: list[str], env: dict[str, str]) -> dict:
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    try:
        p = subprocess.run(
            cmd, cwd=REPO, env=env, capture_output=True, text=True,
            timeout=TIMEOUTS.get(name, 2400),
        )
        rc, stdout, stderr = p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        rc = 98
        stdout = (e.stdout or b"").decode(errors="replace") if isinstance(
            e.stdout, bytes) else (e.stdout or "")
        stderr = (e.stderr or b"").decode(errors="replace") if isinstance(
            e.stderr, bytes) else (e.stderr or "")
        stderr += f"\n[verify] stage '{name}' TIMED OUT after {e.timeout}s"
    # Full output to a per-stage file for diagnosis; only the tail to
    # the console/summary.
    with open(os.path.join(REPO, f".verify_{name}.out"), "w") as f:
        f.write(stdout + "\n--- stderr ---\n" + stderr)
    tail = "\n".join((stdout + stderr).strip().splitlines()[-15:])
    print(tail, flush=True)
    return {"name": name, "rc": rc, "tail": tail, "stdout": stdout}


def _git(args: list[str]) -> str:
    try:
        return subprocess.run(
            ["git"] + args, cwd=REPO, capture_output=True, text=True,
            timeout=30,
        ).stdout.strip()
    except Exception:
        return ""


def tree_state() -> tuple[str, list[str]]:
    """(HEAD sha, list of dirty/untracked paths that MATTER).

    VERIFY.log itself, the per-stage .verify_* dumps and the local
    bench capture are products of the battery — they are expected to
    be dirty at verify time and are excluded."""
    head = _git(["rev-parse", "--short", "HEAD"])
    # Driver-written per-round artifacts (CORRECTNESS_r*/BENCH_r*) land
    # untracked mid-round; they are not part of the code tree the log
    # vouches for (ADVICE r11). Match on the porcelain PATH field, not
    # a substring of the whole line.
    import fnmatch

    ignore = (
        "VERIFY.log",
        ".verify_*",
        "BENCH_LOCAL.json",
        "CORRECTNESS_r*.json",
        "BENCH_r*.json",
        # driver-owned telemetry, appended continuously mid-round —
        # same class as the per-round CORRECTNESS/BENCH artifacts
        "PROGRESS.jsonl",
    )
    # NOTE: _git() strips the whole output, which eats the leading
    # space of a first-line " M path" entry and shifts the ln[3:]
    # path slice — a worktree-modified file first in the list then
    # fails the ignore match (bit the r15 round-close). Read the
    # porcelain output unstripped.
    try:
        porcelain = subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True, timeout=30,
        ).stdout
    except Exception:
        porcelain = ""
    dirty = []
    for ln in porcelain.splitlines():
        if not ln.strip():
            continue
        path = ln[3:].split(" -> ")[-1].strip().strip('"')
        if any(fnmatch.fnmatch(path, pat) for pat in ignore):
            continue
        dirty.append(ln)
    return head, dirty


def main() -> int:
    fast = "--fast" in sys.argv
    allow_dirty = "--allow-dirty" in sys.argv
    round_close = "--round-close" in sys.argv
    if round_close and (fast or allow_dirty):
        print("VERIFY REFUSED: --round-close is the full battery on a "
              "clean tree; --fast/--allow-dirty contradict it")
        return 2
    env = dict(os.environ)
    stages = []

    # r10 postmortem (VERDICT r10 #2/#8): the round closed with a
    # VERIFY.log that PREDATED the last code commit and a dirty tree.
    # The log now records the exact HEAD it verified, and a dirty
    # tracked tree fails the battery up front — verify what you are
    # about to ship, not what you had an hour ago.
    head, dirty = tree_state()
    if dirty and not allow_dirty:
        print("VERIFY REFUSED: working tree dirty — commit (or stash) "
              "first so VERIFY.log covers the exact tree, or pass "
              "--allow-dirty for an iteration run:")
        for ln in dirty[:20]:
            print("  " + ln)
        return 2

    pytest_env = dict(env)
    if not fast:
        pytest_env["OVS_FULL_ORACLE"] = "1"
    # Execute every bounded_global_order bound claim instead of leaving
    # it prose (VERDICT r11 #3): each call eagerly counts its input and
    # raises if the stated max_rows is exceeded. Cheap at the sf0.001
    # test fixtures.
    pytest_env["OVS_ASSERT_BOUNDS"] = "1"
    stages.append(
        run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"],
            pytest_env)
    )
    stages.append(
        run(
            "oracle_check",
            [sys.executable, "tools/oracle_check.py", "/root/testdata/sf0.01"],
            env,
        )
    )
    stages.append(
        run(
            "plan_lint",
            [sys.executable, "tools/plan_lint.py", "/root/testdata/sf0.001"],
            env,
        )
    )
    bench_env = dict(env)
    bench_env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    bench = run("bench_smoke", [sys.executable, "bench.py"], bench_env)
    if bench["rc"] == 0:
        try:
            last = bench["stdout"].strip().splitlines()[-1]
            json.loads(last)
        except (json.JSONDecodeError, IndexError):
            bench["rc"] = 97
            bench["tail"] += "\n[verify] bench output not parseable JSON"
    stages.append(bench)

    ok = all(s["rc"] == 0 for s in stages)
    lines = [
        f"VERIFY {'PASS' if ok else 'FAIL'} "
        f"{datetime.datetime.now(datetime.timezone.utc).isoformat()} "
        f"HEAD={head}"
        + (f" DIRTY={len(dirty)}" if dirty else " tree=clean")
        + (" flags=OVS_FULL_ORACLE,OVS_ASSERT_BOUNDS" if not fast
           else " flags=fast,OVS_ASSERT_BOUNDS"),
    ]
    for s in stages:
        lines.append(f"--- {s['name']}: rc={s['rc']}")
        lines.append(s["tail"])
    with open(os.path.join(REPO, "VERIFY.log"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:1]))
    if round_close and ok:
        # the gate commits its own evidence: the round's last commit
        # is the green log, recorded HEAD = parent commit, no manual
        # "remember to commit VERIFY.log" step left to forget
        for cmd in (
            ["add", "VERIFY.log"],
            ["commit", "-m",
             f"Round-close verify battery: PASS at {head}"],
        ):
            p = subprocess.run(
                ["git"] + cmd, cwd=REPO, capture_output=True, text=True,
                timeout=60,
            )
            if p.returncode != 0:
                print("VERIFY PASS but log commit FAILED:\n"
                      + p.stdout + p.stderr)
                return 3
        print("VERIFY.log committed:",
              _git(["rev-parse", "--short", "HEAD"]))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
