"""utils/: StepTimer window semantics, persistent-XLA-cache latch,
MetricsLogger JSONL output."""

import json
import time

from cbfssm_tpu.utils import xla_cache
from cbfssm_tpu.utils.profiling import MetricsLogger, StepTimer


def test_step_timer_discards_warmup():
    t = StepTimer(warmup=1)
    assert t.steps_per_sec is None
    t.tick()  # warmup (compile) tick starts the clock, isn't timed
    assert t.steps_per_sec is None
    time.sleep(0.02)
    t.tick()
    rate = t.steps_per_sec
    assert rate is not None and 0 < rate <= 50.0  # >= 20 ms per step


def test_step_timer_warmup_zero_times_first_step():
    """warmup=0 starts the window at construction: the first tick is a
    timed step against a real interval, not an epsilon clock (this
    regressed to ~322k steps/sec once)."""
    t = StepTimer(warmup=0)
    time.sleep(0.02)
    t.tick()
    rate = t.steps_per_sec
    assert rate is not None and 0 < rate <= 50.0
    time.sleep(0.02)
    t.tick()
    assert t.steps_per_sec <= 100.0  # 2 steps over >= 40 ms


def test_xla_cache_latch_rejects_different_path(tmp_path):
    """The first successful enable latches; a later call asking for a
    DIFFERENT explicit dir must return False, not pretend it took."""
    assert xla_cache.enable_persistent_cache()  # default (likely latched)
    active = xla_cache._enabled_path
    assert active is not None
    # re-request of the active path (or default) stays True
    assert xla_cache.enable_persistent_cache()
    assert xla_cache.enable_persistent_cache(active)
    assert not xla_cache.enable_persistent_cache(str(tmp_path / "elsewhere"))
    assert xla_cache._enabled_path == active  # unchanged


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(event="epoch", loss=1.5)
    log.log(event="epoch", loss=1.25)
    rows = [json.loads(ln) for ln in open(path)]
    assert [r["loss"] for r in rows] == [1.5, 1.25]
    assert all("time" in r for r in rows)
    MetricsLogger(None).log(event="noop")  # disabled path is a no-op
