"""Analytic FLOP accounting used by bench.py's MFU reporting.

Pins the analytic counters against the hand-derived numbers in
BENCHMARKS.md ("Utilization": RoboMove ~118 GFLOP/optimizer step) so a
refactor of the model shapes or the counter can't silently skew the
reported MFU.
"""

import bench
from scripts.profile_mfu import SHAPES


def test_robomove_matches_hand_derivation():
    # BENCHMARKS.md hand calc: forward 11 GF + blocked backward 28 GF,
    # x3 for reverse mode ~= 118 GF/step
    got = bench.cbfssm_analytic_gflops(SHAPES["robomove"])
    assert 110.0 < got < 125.0, got


def test_shapes_are_ordered_by_flops():
    small = bench.cbfssm_analytic_gflops(SHAPES["smallscale"])
    sarcos = bench.cbfssm_analytic_gflops(SHAPES["sarcos"])
    robo = bench.cbfssm_analytic_gflops(SHAPES["robomove"])
    assert small < sarcos < robo
    assert small > 0.1  # GFLOP scale, not unit confusion


def test_voliro_is_latency_bound_scale():
    # tiny per-step math: the headline config is ~0.1-0.2 GFLOP/step —
    # the quantitative basis for the "dependency-chain-bound" verdict
    got = bench.voliro_analytic_gflops()
    assert 0.05 < got < 0.5, got


def test_watchdog_fires_on_stalled_backend():
    """bench.py's watchdog must turn a hung TPU tunnel into a prompt,
    diagnosable failure instead of burning the caller's whole timeout."""
    import subprocess
    import sys

    code = (
        "import time, bench\n"
        "bench._start_watchdog({'name': 'backend-init'}, first_timeout=0.5,"
        " total_timeout=60, poll=0.2)\n"
        "time.sleep(30)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=30, cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(__file__))
        ),
    )
    assert proc.returncode == 3
    assert "watchdog" in proc.stderr and "backend" in proc.stderr
