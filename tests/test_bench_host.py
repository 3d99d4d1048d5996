"""Host-side bench.py logic: per-variant student schedules and the
schedule-tagged cache naming (ADVICE r4 medium #2 — a default-schedule
artifact must never shadow a longer-schedule winner under one filename).

Pure host logic; no device work."""

import importlib

import pytest

import bench


def test_variant_schedules(monkeypatch):
    monkeypatch.delenv("BENCH_DISTILL_STEPS", raising=False)
    monkeypatch.delenv("BENCH_FT_STEPS", raising=False)
    # the full-width student trains at the default schedule
    assert bench._student_schedule(256, 6) == bench.DEFAULT_SCHEDULE
    # the half-FLOPs 192x6 needs the longer encoded schedule
    assert bench._student_schedule(192, 6) == (16000, 8000)
    # env overrides both
    monkeypatch.setenv("BENCH_DISTILL_STEPS", "100")
    monkeypatch.setenv("BENCH_FT_STEPS", "50")
    assert bench._student_schedule(192, 6) == (100, 50)
    assert bench._student_schedule(256, 6) == (100, 50)


def test_frozen_h192_assets_carry_their_schedule():
    """The committed h192 pkls must declare the 16k/8k schedule so
    _get_student validates them on load (and a schedule change in the
    env retrains instead of silently reusing them)."""
    import os
    import pickle
    for name in ("bench_student_h192x6.pkl",
                 "bench_student_gauntlet_h192x6.pkl"):
        path = os.path.join(bench._ASSETS, name)
        if not os.path.exists(path):
            pytest.skip(f"{name} not frozen")
        with open(path, "rb") as f:
            blob = pickle.load(f)
        assert isinstance(blob, dict) and "params" in blob
        assert tuple(blob["schedule"]) == (16000, 8000)
        assert (blob["hidden_dim"], blob["num_layers"]) == (192, 6)
