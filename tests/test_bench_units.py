"""Pure-unit tests of bench.py's cross-round comparison math — no
Spark, no fixtures. Pinned after round 10 shipped an INVERTED host
correction (``scale = prev_calib/cur_calib`` then dividing), which
inflated every published ``vs_prev`` ratio by ``(calib/pc)²`` on a
slower host and reported a phantom 1.2–2.1× across-the-board
regression while the true normalized ratios were median 0.89×."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_identical_work_on_any_host_speed_ratios_to_one():
    """THE law: same normalized work, any calib pair => ratio 1.0.
    This is exactly the case the round-10 inversion broke (prev calib
    0.096, cur calib 0.126 => published 1.72 instead of 1.0)."""
    for prev_calib, cur_calib in [(0.1, 0.2), (0.2, 0.1), (0.096, 0.126),
                                  (1.0, 1.0), (0.05, 0.5)]:
        # identical norm units: cur seconds scale with cur host speed
        norm = 7.5
        prev_s = norm * prev_calib
        cur_s = norm * cur_calib
        r = bench._vs_prev_ratio(cur_s, cur_calib, prev_s, prev_calib)
        assert r == pytest.approx(1.0), (prev_calib, cur_calib, r)


def test_true_slowdown_survives_host_correction():
    # twice the work on a host twice as fast: raw seconds EQUAL, but
    # the corrected ratio must say 2.0
    assert bench._vs_prev_ratio(5.0, 0.05, 5.0, 0.1) == pytest.approx(2.0)
    # half the work on a slower host: raw seconds equal, corrected 0.5
    assert bench._vs_prev_ratio(5.0, 0.1, 5.0, 0.05) == pytest.approx(0.5)


def test_missing_calibration_falls_back_to_raw_ratio():
    assert bench._vs_prev_ratio(6.0, None, 3.0, 0.1) == pytest.approx(2.0)
    assert bench._vs_prev_ratio(6.0, 0.1, 3.0, None) == pytest.approx(2.0)
    assert bench._vs_prev_ratio(6.0, 0.0, 3.0, 0.1) == pytest.approx(2.0)


def test_r10_regression_numbers_reproduce_with_the_fix():
    """The exact figures from the round-10 verdict: driver calib 0.126
    vs r9's 0.096. q48 raw ratio 0.97×(0.126/0.096)=1.27 was PUBLISHED
    as 1.67 by the inverted code; the fixed law yields the norm ratio."""
    pc, cc = 0.096, 0.126
    # construct seconds whose norm ratio is exactly 0.97
    prev_s = 10.0 * pc          # 10.0 norm units last round
    cur_s = 9.7 * cc            # 9.7 norm units this round
    got = bench._vs_prev_ratio(cur_s, cc, prev_s, pc)
    assert got == pytest.approx(0.97)
    # and the OLD inverted formula really did produce the phantom 1.67
    inverted = cur_s / (prev_s * (pc / cc))
    assert inverted == pytest.approx(0.97 * (cc / pc) ** 2, rel=1e-6)
    assert inverted == pytest.approx(1.67, abs=0.01)


def test_wrapper_fallback_skips_other_scale_factors(tmp_path, monkeypatch):
    """ADVICE r10 low: when BENCH_LOCAL.jsonl is absent the wrapper
    fallback must not compare against a run at a different sf."""
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    monkeypatch.setattr(
        bench, "_LOCAL_LOG", str(tmp_path / "BENCH_LOCAL.jsonl")
    )
    with open(tmp_path / "BENCH_r03.json", "w") as f:
        json.dump(
            {"parsed": {"sf": 1.0, "calib_s": 0.1,
                        "queries": {"q1": 9.9}}}, f,
        )
    with open(tmp_path / "BENCH_r02.json", "w") as f:
        json.dump(
            {"parsed": {"sf": 0.1, "calib_s": 0.1,
                        "queries": {"q1": 1.0}}}, f,
        )
    prev, src = bench._load_prev_bench(0.1)
    assert prev["queries"] == {"q1": 1.0}, (prev, src)
    assert "BENCH_r02" in src, src
    # and at sf 1.0 it picks the other wrapper
    prev2, src2 = bench._load_prev_bench(1.0)
    assert prev2["queries"] == {"q1": 9.9}, (prev2, src2)


def test_local_journal_preferred_and_same_round_excluded(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    monkeypatch.setattr(
        bench, "_LOCAL_LOG", str(tmp_path / "BENCH_LOCAL.jsonl")
    )
    # wrapper r5 exists => current round is 6
    with open(tmp_path / "BENCH_r05.json", "w") as f:
        json.dump({"parsed": {"sf": 0.1, "queries": {"q1": 3.0}}}, f)
    recs = [
        {"round": 5, "sf": 0.1, "queries": {"q1": 2.0}, "calib_s": 0.1},
        {"round": 6, "sf": 0.1, "queries": {"q1": 1.0}, "calib_s": 0.1},
    ]
    with open(tmp_path / "BENCH_LOCAL.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    prev, src = bench._load_prev_bench(0.1)
    # round-6 record is the builder's own run this round: excluded;
    # the round-5 journal record wins over the wrapper
    assert prev["queries"] == {"q1": 2.0}, (prev, src)
    assert "BENCH_LOCAL" in src and "round 5" in src
