"""Unit tests for the tracing/profiling hooks (SURVEY.md §5).

The reference's only observability is perf_counter prints around each solve
(/root/reference/sweep_sea_detuning.py:672-690); StageTimer is the
machine-readable equivalent that lands in timings.json, and fetch_sync is
the honest completion sync every published measurement goes through.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumsimulations_tpu.utils.profiling import (
    StageTimer,
    disable_debug_mode,
    enable_debug_mode,
    fetch_sync,
)


def test_stage_timer_accumulates_and_counts():
    t = StageTimer()
    for _ in range(3):
        with t.stage("work"):
            pass
    with t.stage("other"):
        pass
    d = t.as_dict()
    assert d["work"]["calls"] == 3
    assert d["other"]["calls"] == 1
    assert d["work"]["seconds"] >= 0.0
    # report() has one line per stage, stage name first
    lines = t.report().splitlines()
    assert len(lines) == 2 and lines[0].startswith("work")


def test_stage_timer_records_on_exception():
    t = StageTimer()
    with pytest.raises(RuntimeError):
        with t.stage("boom"):
            raise RuntimeError("inside")
    assert t.counts["boom"] == 1
    assert "boom" in t.stages


def test_stage_timer_dump_roundtrip(tmp_path):
    t = StageTimer()
    with t.stage("s"):
        pass
    p = tmp_path / "timings.json"
    t.dump(str(p))
    with open(p, encoding="utf-8") as f:
        loaded = json.load(f)
    assert loaded == t.as_dict()


def test_fetch_sync_forces_value():
    # Must accept any pytree of device arrays and complete without error.
    x = jnp.arange(8.0)
    fetch_sync(x)
    fetch_sync({"a": x * 2, "b": (x, x + 1)})


def test_debug_mode_toggles_nan_check():
    enable_debug_mode()
    try:
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.zeros(2) - 1.0).block_until_ready()
    finally:
        disable_debug_mode()
    # After disabling, the same op silently yields NaN again.
    out = np.asarray(jnp.log(jnp.zeros(2) - 1.0))
    assert np.isnan(out).all()
