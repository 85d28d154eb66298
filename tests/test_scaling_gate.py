"""Capacity-gated scaling pair selection (tools/scaling_bench.py, r5):
the pre-flight must pick the largest pair whose upper level fits today's
effective-core capacity, fall back one rung, or refuse — never record a
number at a parallelism the host cannot supply."""

import importlib.util
import os


def _load_sb():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "scaling_bench.py",
    )
    spec = importlib.util.spec_from_file_location("scaling_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_select_pair_gating(monkeypatch):
    sb = _load_sb()

    def fake(vals):
        monkeypatch.setattr(
            sb, "measure_effective_cores", lambda k, secs=3.0: vals[k]
        )

    # healthy host: 4x pair fits (needs >= 0.85 * 8 = 6.8 at 8 procs)
    fake({8: 7.6, 4: 3.9})
    readings, pair = sb.select_pair()
    assert pair == (1, 4)
    assert readings == {"effective_cores_at_8": 7.6}

    # degraded host (the r4 weather): 4x upper level starves, 2x fits
    fake({8: 5.9, 4: 3.8})
    readings, pair = sb.select_pair()
    assert pair == (1, 2)
    assert set(readings) == {"effective_cores_at_8", "effective_cores_at_4"}

    # collapsed host: refuse rather than record junk
    fake({8: 4.0, 4: 2.1})
    readings, pair = sb.select_pair()
    assert pair is None


def test_measure_effective_cores_sane():
    sb = _load_sb()
    eff = sb.measure_effective_cores(2, secs=0.8)
    assert 0.5 <= eff <= 3.0  # 2 procs deliver ~1-2 cores on any host
