"""tools/bench_floor.py parsing + merge semantics: the composite floor
must prefer per-query min-warm over warm medians, take the min across
captures, keep provenance, and NEVER repair a truncated driver tail."""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _mod():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_floor.py",
    )
    spec = importlib.util.spec_from_file_location("bench_floor", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_payload_parses_raw_wrapped_and_truncated(tmp_path):
    bf = _mod()
    raw = tmp_path / "BENCH_LOCAL.json"
    raw.write_text(json.dumps({"value": 1.0, "queries": {"q": 1.0}}))
    assert bf._payload(str(raw))["queries"] == {"q": 1.0}

    wrapped = tmp_path / "BENCH_r01.json"
    wrapped.write_text(
        json.dumps({"parsed": {"value": 2.0, "queries": {"q": 2.0}}})
    )
    assert bf._payload(str(wrapped))["queries"] == {"q": 2.0}

    # a truncated tail must yield None, not a guessed/repaired object
    trunc = tmp_path / "BENCH_r02.json"
    trunc.write_text(
        json.dumps({"parsed": None, "tail": '{"value": 3.0, "quer'})
    )
    assert bf._payload(str(trunc)) is None

    # a complete tail line parses
    ok_tail = tmp_path / "BENCH_r03.json"
    ok_tail.write_text(
        json.dumps(
            {"parsed": None, "tail": 'noise\n{"value": 4.0, "queries": {"q": 4.0}}'}
        )
    )
    assert bf._payload(str(ok_tail))["queries"] == {"q": 4.0}

    # bench.py emits TWO lines (detail first, compact driver line
    # second) — the detail line (queries_min_warm) must win
    two_line = tmp_path / "BENCH_LOCAL_x.json"
    two_line.write_text(
        json.dumps(
            {
                "value": 5.0,
                "queries": {"q": 5.0},
                "queries_min_warm": {"q": 4.5},
            }
        )
        + "\n"
        + json.dumps({"value": 5.0, "queries": {"q": 5.0}})
        + "\n"
    )
    assert bf._payload(str(two_line))["queries_min_warm"] == {"q": 4.5}


def test_build_merges_min_and_prefers_min_warm(tmp_path, monkeypatch):
    bf = _mod()
    monkeypatch.setattr(bf, "REPO", str(tmp_path))
    # capture A: only medians; q1 slow, q2 fast
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps(
            {
                "parsed": {
                    "value": 9,
                    "sf": 0.1,
                    "queries": {"q1": 5.0, "q2": 0.4},
                }
            }
        )
    )
    # capture B: min-warm present and better for q1, worse for q2;
    # q3 only exists here
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps(
            {
                "value": 9,
                "sf": 0.1,
                "queries": {"q1": 3.0, "q2": 1.0, "q3": 2.0},
                "queries_min_warm": {"q1": 2.5, "q2": 0.9, "q3": 1.8},
                "contended": True,
                "cpu_probe_drift": 2.0,
            }
        )
    )
    out = bf.build()
    floors = out["floors"]
    assert floors["q1"] == {"sec": 2.5, "source": "BENCH_LOCAL.json"}
    assert floors["q2"] == {"sec": 0.4, "source": "BENCH_r01.json"}
    assert floors["q3"]["sec"] == 1.8
    assert out["n_queries"] == 3
    assert abs(out["floor_total_sec"] - (2.5 + 0.4 + 1.8)) < 1e-9
    # provenance keeps the contention verdict per capture
    caps = {c["file"]: c for c in out["captures"]}
    assert caps["BENCH_LOCAL.json"]["contended"] is True
    assert caps["BENCH_LOCAL.json"]["signal"] == "min_warm"
    assert caps["BENCH_r01.json"]["signal"] == "median"


def test_build_ignores_non_headline_sf_captures(tmp_path, monkeypatch):
    """The verify battery's bench smoke writes an sf0.001
    BENCH_LOCAL.json into the working tree; merging it would 'improve'
    every floor ~100x. Non-headline-sf captures must contribute
    nothing (but stay listed as provenance)."""
    bf = _mod()
    monkeypatch.setattr(bf, "REPO", str(tmp_path))
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps(
            {
                "value": 0.1,
                "sf": 0.001,
                "queries": {"q1": 0.01},
                "queries_min_warm": {"q1": 0.01},
            }
        )
    )
    (tmp_path / "BENCH_LOCAL_r14_start.json").write_text(
        json.dumps(
            {
                "value": 5.0,
                "sf": 0.1,
                "queries": {"q1": 5.0},
                "queries_min_warm": {"q1": 4.0},
            }
        )
    )
    out = bf.build()
    assert out["floors"]["q1"]["sec"] == 4.0
    caps = {c["file"]: c for c in out["captures"]}
    assert caps["BENCH_LOCAL.json"]["usable"] is False
    assert caps["BENCH_LOCAL_r14_start.json"]["usable"] is True


def test_build_fails_closed_on_missing_sf(tmp_path, monkeypatch):
    """A capture that does not self-report its sf must contribute
    nothing (ADVICE r14: fail closed — one legacy or hand-edited
    capture without sf must not be able to 'improve' every floor)."""
    bf = _mod()
    monkeypatch.setattr(bf, "REPO", str(tmp_path))
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"value": 1, "queries": {"q1": 0.01}}})
    )
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"value": 5.0, "sf": 0.1, "queries": {"q1": 5.0}})
    )
    out = bf.build()
    assert out["floors"]["q1"]["sec"] == 5.0
    caps = {c["file"]: c for c in out["captures"]}
    assert caps["BENCH_r01.json"]["usable"] is False


def test_build_min_merges_committed_artifact(tmp_path, monkeypatch):
    """Floors are monotone minima over round HISTORY: a committed
    floor whose source capture was overwritten (the verify bench
    smoke clobbers BENCH_LOCAL.json) must survive a rebuild; a new
    lower capture still wins."""
    bf = _mod()
    monkeypatch.setattr(bf, "REPO", str(tmp_path))
    (tmp_path / "BENCH_FLOOR.json").write_text(
        json.dumps(
            {
                "floors": {
                    "q_gone": {"sec": 1.0, "source": "BENCH_LOCAL.json"},
                    "q_beat": {"sec": 2.0, "source": "BENCH_LOCAL.json"},
                }
            }
        )
    )
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps(
            {
                "value": 5.0,
                "sf": 0.1,
                "queries": {"q_beat": 1.5, "q_new": 0.7},
            }
        )
    )
    out = bf.build()
    assert out["floors"]["q_gone"]["sec"] == 1.0  # survives overwrite
    assert out["floors"]["q_beat"]["sec"] == 1.5  # lower capture wins
    assert out["floors"]["q_new"]["sec"] == 0.7
