"""Unit tests for the bench.py probe machinery.

bench.py is the driver's only perf-record channel and r4 lost its
record to an unwatchdogged stall — the subprocess watchdog, the
shared-deadline retry, the record-emission policy, and the
warmness-check fallback are load-bearing and tested here WITHOUT a
TPU (probes run real subprocesses on the CPU backend; the hooks
``_selftest_probe`` / ``_selftest_sleep_probe`` live in bench.py so
the subprocess can import them by name).
"""

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


def test_run_probe_parses_tag_and_echoes_stderr(capsys):
    v = bench._run_probe("_selftest_probe", "SELFTEST", budget=120)
    assert v == 42.5
    err = capsys.readouterr().err
    assert "selftest stderr line" in err


def test_run_probe_wrong_tag_returns_none():
    assert bench._run_probe("_selftest_probe", "OTHERTAG",
                            budget=120) is None


def test_run_probe_deadline_shared_across_attempts():
    """attempts=2 must NOT double the budget: both attempts share one
    deadline (the r5 review finding — on a dead tunnel the old
    per-attempt budget doubled worst-case time-to-first-record)."""
    t0 = time.time()
    v = bench._run_probe("_selftest_sleep_probe", "SELFTEST_SLEEP",
                         budget=6, attempts=2)
    wall = time.time() - t0
    assert v is None
    # one shared 6 s budget (+ slack for process startup/teardown),
    # NOT 2 x 6 s
    assert wall < 11, f"retries exceeded the shared budget: {wall:.1f}s"


def test_run_probe_unknown_entry_fails_closed():
    assert bench._run_probe("_no_such_probe", "X", budget=60) is None


def test_emit_record_shape(capsys):
    bench._emit_record(123.4)
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec == {"metric": "geomorphons_throughput_lookup50",
                   "value": 123.4, "unit": "Mpix/s",
                   "vs_baseline": round(123.4 / bench.BASELINE_MPIX_S,
                                        1)}


def test_aot_warm_probe_reports_cold_without_cache(monkeypatch):
    """With the AOT cache disabled (CPU test default), the warmness
    subprocess must report 0 — bench then defers the scale probe
    behind the provisional record instead of wasting its budget."""
    monkeypatch.setenv("NEILPY_AOT_CACHE", "0")
    assert bench._aot_scale_warm() is False


def test_carry_best_ever_survives_a_worse_run(tmp_path):
    """A degraded-link bench run must not erase a better historical
    mosaic record: best_ever max-merges across runs while the run's
    own attempts stay verbatim."""
    path = str(tmp_path / "MOSAIC_BENCH.json")
    r1 = {"date": "2026-08-20",
          "headline": {"config": "duo_int16", "mpix_s": 15.0}}
    bench._carry_best_ever(r1, path)
    json.dump(r1, open(path, "w"))
    assert r1["best_ever"]["mpix_s"] == 15.0

    r2 = {"date": "2026-08-21",
          "headline": {"config": "duo_int16", "mpix_s": 7.0}}
    bench._carry_best_ever(r2, path)
    assert r2["headline"]["mpix_s"] == 7.0          # this run, honest
    assert r2["best_ever"]["mpix_s"] == 15.0        # history kept
    assert r2["best_ever"]["date"] == "2026-08-20"

    r3 = {"date": "2026-08-22",
          "headline": {"config": "duo_int16", "mpix_s": 18.0}}
    json.dump(r2, open(path, "w"))
    bench._carry_best_ever(r3, path)
    assert r3["best_ever"]["mpix_s"] == 18.0        # new best wins

    # missing/corrupt history: fail open to the current run
    r4 = {"date": "x", "headline": {"config": "c", "mpix_s": 1.0}}
    bench._carry_best_ever(r4, str(tmp_path / "nope.json"))
    assert r4["best_ever"]["mpix_s"] == 1.0
    bad = str(tmp_path / "bad.json")
    open(bad, "w").write("{not json")
    r5 = {"date": "y", "headline": {"config": "c", "mpix_s": 2.0}}
    bench._carry_best_ever(r5, bad)
    assert r5["best_ever"]["mpix_s"] == 2.0


def test_warmness_key_matches_scale_probe_source():
    """The warmness check's CachedKernel key must be derived from the
    SAME constants the scale probe uses (drift here silently disables
    the warm fast path — r5 review finding)."""
    import inspect
    src = inspect.getsource(bench._pallas_scale_probe)
    assert "SCALE_SHAPE" in src and "SCALE_REPS" in src
    src_warm = inspect.getsource(bench._aot_warm_probe)
    assert "SCALE_SHAPE" in src_warm and "SCALE_REPS" in src_warm
