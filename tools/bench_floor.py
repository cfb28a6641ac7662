#!/usr/bin/env python
"""Composite per-query bench floor across every capture on disk
(VERDICT r13 #4: the floor lived only in PERF.md prose — make it a
mechanical artifact so "did the round get faster" is a file diff).

Scans BENCH_LOCAL*.json (full bench.py output: per-query warm medians,
per-query min-warm, ambient probes) and the driver's BENCH_r*.json
(wrapped: ``parsed`` when the driver could parse bench.py's line, else
a best-effort parse of ``tail`` — the driver truncates long lines, in
which case the capture contributes nothing rather than a guess).

For every query the FLOOR is the minimum over all captures of the best
per-query signal available in that capture, preferring
``queries_min_warm`` (the contention-immune capability floor) over the
warm median ``queries``. Provenance is kept per capture (file, sf,
contended verdict, probe drifts, totals) and per query (which capture
set the floor), so a floor regression points at the exact capture to
re-run.

Usage: python tools/bench_floor.py [--write]   (default prints a diff
summary vs the committed BENCH_FLOOR.json; --write rewrites it)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
def _out_path() -> str:
    # derived at CALL time so a test that repoints REPO also repoints
    # the committed artifact (the min-merge below must not read the
    # real repo's floors inside a tmp-dir test)
    return os.path.join(REPO, "BENCH_FLOOR.json")
# floors are only comparable at the headline scale — the verify
# battery's bench SMOKE runs at sf0.001 and overwrites BENCH_LOCAL.json
# in the working tree, and merging such a capture would "improve" every
# floor by ~100x. Captures at any other sf are listed (provenance) but
# contribute nothing.
HEADLINE_SF = 0.1


def _best_line(text: str) -> dict | None:
    """Best bench.py JSON object among the lines of ``text``: prefer
    the detail line (has ``queries_min_warm``) over the compact one;
    never repair a truncated line."""
    best = None
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            q = json.loads(line)
        except Exception:
            continue
        if "queries" not in q:
            continue
        if "queries_min_warm" in q:
            return q
        best = best or q
    return best


def _payload(path: str) -> dict | None:
    """The bench.py JSON payload inside a capture file, however
    wrapped. Raw bench.py output prints TWO lines (detail + compact
    driver line) — scan line-wise; driver wrappers carry ``parsed``
    or a (possibly truncated) ``tail``."""
    try:
        raw = open(path).read()
    except OSError:
        return None
    try:
        d = json.loads(raw)
    except Exception:
        return _best_line(raw)  # raw multi-line bench.py output
    if "queries" in d and "value" in d:
        return d  # a raw single-line bench.py capture
    p = d.get("parsed")
    if isinstance(p, dict) and "queries" in p:
        return p
    return _best_line(d.get("tail", ""))


def build() -> dict:
    captures = []
    floors: dict[str, dict] = {}
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    paths += sorted(glob.glob(os.path.join(REPO, "BENCH_LOCAL*.json")))
    for path in paths:
        name = os.path.basename(path)
        p = _payload(path)
        if p is None:
            captures.append({"file": name, "usable": False})
            continue
        # fail CLOSED: a capture must self-report the headline sf to
        # contribute — one missing-sf legacy/hand-edited capture must
        # not be able to "improve" every floor (ADVICE r14)
        wrong_sf = p.get("sf") != HEADLINE_SF
        per_query = (
            {}
            if wrong_sf
            else p.get("queries_min_warm") or p.get("queries") or {}
        )
        captures.append(
            {
                "file": name,
                "usable": not wrong_sf,
                "signal": (
                    "min_warm" if p.get("queries_min_warm") else "median"
                ),
                "sf": p.get("sf"),
                "n_queries": len(per_query),
                "total": p.get("value"),
                "min_warm_total": p.get("min_warm_total"),
                "noise_band": p.get("noise_band"),
                "contended": p.get("contended"),
                "cpu_probe_drift": p.get("cpu_probe_drift"),
                "membw_probe_drift": p.get("membw_probe_drift"),
            }
        )
        for q, sec in per_query.items():
            if not isinstance(sec, (int, float)):
                continue
            cur = floors.get(q)
            if cur is None or sec < cur["sec"]:
                floors[q] = {"sec": round(float(sec), 3), "source": name}
    # min-merge with the committed artifact: floors are monotone
    # minima over the round HISTORY, but captures get overwritten
    # (every verify bench smoke clobbers BENCH_LOCAL.json) — without
    # the merge a --write after a smoke would silently RAISE floors
    # whose source capture no longer exists on disk. A query retired
    # from bench.py is pruned manually (its committed entry names the
    # capture to check against).
    if os.path.exists(_out_path()):
        try:
            committed = json.load(open(_out_path())).get("floors", {})
        except Exception:
            committed = {}
        for q, v in committed.items():
            cur = floors.get(q)
            if cur is None or v["sec"] < cur["sec"]:
                floors[q] = v
    return {
        "note": (
            "per-query composite floor = min over all captures of the "
            "best per-query signal (min-warm preferred, warm median "
            "otherwise); compare floors across rounds, not single "
            "captures — ambient contention only ever INFLATES a "
            "capture, so the floor is the capability number"
        ),
        "floor_total_sec": round(sum(v["sec"] for v in floors.values()), 3),
        "n_queries": len(floors),
        "floors": dict(sorted(floors.items())),
        "captures": captures,
    }


def main() -> int:
    new = build()
    out = _out_path()
    if "--write" in sys.argv:
        json.dump(new, open(out, "w"), indent=1)
        open(out, "a").write("\n")
        print(
            f"wrote {out}: {new['n_queries']} queries, "
            f"floor_total={new['floor_total_sec']}s"
        )
        return 0
    if not os.path.exists(out):
        print("no committed BENCH_FLOOR.json — run with --write")
        return 1
    old = json.load(open(out))
    o, n = old.get("floors", {}), new["floors"]
    moved = {
        q: (o[q]["sec"], n[q]["sec"])
        for q in o
        if q in n and abs(o[q]["sec"] - n[q]["sec"]) > 1e-9
    }
    print(
        f"floor_total {old.get('floor_total_sec')} -> "
        f"{new['floor_total_sec']}; {len(n) - len(o)} new queries; "
        f"{len(moved)} moved floors"
    )
    for q, (a, b) in sorted(moved.items()):
        print(f"  {q}: {a} -> {b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
