"""Measure epochs_per_dispatch on the real Trainer at the Voliro
headline shape.

The headline bench (bench.py) times a bare scanned 30-step program —
one dispatch per "epoch", no eval, no checkpoint logic. The production
Trainer additionally pays a second dispatch per epoch for the test
eval, plus host readbacks and best-checkpoint saves; blocked dispatch
(config `epochs_per_dispatch`) fuses K epochs (train + eval + in-carry
best tracking) into one program. This script times the REAL
`Trainer.train` end-to-end — dataset staging, shuffling, logging,
checkpointing, everything — at K=1 vs K='auto' on the same synthetic
Voliro-shaped dataset (30 optimizer steps/epoch, 1 eval batch), so the
reported ratio is the production-loop win, not a microbenchmark.

Usage: python scripts/bench_blocked_epochs.py [epochs]
(ambient env = real TPU; one JAX process at a time.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARM_EPOCHS = 10  # excluded: compile + one-time program staging
N_TRAIN_WINDOWS = 480  # 30 batches of 16 = the headline's 30 steps/epoch
N_TEST_WINDOWS = 16


def build_ds():
    from bench import BATCH, SEQ_LEN, build_voliro_parts

    model, params, u, y = build_voliro_parts()
    rng = np.random.default_rng(7)

    def windows(n):
        uu = np.concatenate([u] * (-(-n // BATCH)))[:n]
        yy = np.concatenate([y] * (-(-n // BATCH)))[:n]
        # decorrelate repeated copies so shuffling is meaningful
        yy = yy + rng.normal(0, 1e-3, yy.shape).astype(yy.dtype)
        return uu, yy

    class _DS:
        dim_u = 13
        dim_y = 22
        seq_len = SEQ_LEN

        def __init__(self):
            self.train_in_batch, self.train_out_batch = windows(N_TRAIN_WINDOWS)
            self.test_in_batch, self.test_out_batch = windows(N_TEST_WINDOWS)

    return model, _DS()


def run(model, ds, epd, tag, model_dir, epochs):
    from cbfssm_tpu.training.trainer import Trainer

    if epochs <= WARM_EPOCHS:
        # the steady-state window is epochs [WARM_EPOCHS, epochs); fewer
        # would KeyError (or divide a 0-step tail) after the full run
        raise ValueError(
            f"epochs must exceed the {WARM_EPOCHS}-epoch warmup "
            f"(got {epochs})"
        )
    trainer = Trainer(model, model_dir, epochs_per_dispatch=epd, seed=0)
    t_starts = {}
    # time the post-warmup tail by wrapping _log_epoch
    orig = trainer._log_epoch

    def logged(epoch, *a, **k):
        t_starts.setdefault(epoch, time.perf_counter())
        return orig(epoch, *a, **k)

    trainer._log_epoch = logged
    t0 = time.perf_counter()
    trainer.train(ds, epochs)
    total = time.perf_counter() - t0
    # steady-state rate: wall clock from the first post-warmup epoch's
    # log (a host-synchronized point — losses are read back before
    # logging) to the end of training
    tail_epochs = epochs - WARM_EPOCHS
    tail_s = time.perf_counter() - t_starts[WARM_EPOCHS - 1]
    steps = tail_epochs * 30
    print(
        f"{tag}: total {total:.1f}s; steady tail {tail_s:.2f}s for "
        f"{steps} steps -> {steps / tail_s:.1f} steps/sec "
        f"(losses finite: {np.isfinite(trainer.train_all).all()})",
        file=sys.stderr,
    )
    return steps / tail_s, trainer.train_all


def measure_trainer(epd="auto", epochs=40):
    """Production-loop steps/sec (Trainer.train end-to-end at the
    Voliro headline shape) for one epochs_per_dispatch setting.
    Training stdout is routed to stderr so callers printing a JSON
    line (bench.py) stay clean."""
    import contextlib
    import tempfile

    model, ds = build_ds()
    with tempfile.TemporaryDirectory() as d, \
            contextlib.redirect_stdout(sys.stderr):
        rate, _ = run(model, ds, epd, f"trainer (K={epd})", d, epochs)
    return rate


def main():
    import tempfile

    from cbfssm_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    model, ds = build_ds()
    with tempfile.TemporaryDirectory() as d:
        r_seq, l_seq = run(model, ds, 1, "per-epoch (K=1)   ", d + "/seq", epochs)
        r_blk, l_blk = run(model, ds, "auto", "blocked  (K=auto)", d + "/blk", epochs)
    same = np.array_equal(np.asarray(l_seq), np.asarray(l_blk))
    print(f"losses identical: {same}")
    print(f"speedup: {r_blk / r_seq:.2f}x")


if __name__ == "__main__":
    main()
