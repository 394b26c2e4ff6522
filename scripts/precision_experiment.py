"""gp_matmul_precision end-to-end training decision (VERDICT r3 #2).

The r3 floor-corrected measurement: 'high' (3 bf16 MXU passes) is +21%
device-side over 'highest' (6 passes) on the compute-bound RoboMove
shape at rel err ~2e-7 (~f32 arithmetic noise). This script supplies the
missing END-TO-END evidence: does full-budget *training* distinguish the
two?

Method (the BENCHMARKS.md "float32 vs float64" statistical-equivalence
methodology, strengthened — the precision knob consumes no randomness,
so the two arms share seeds, shuffles, and RNG streams and are directly
comparable per seed):

  * RoboMove two-phase entropy curriculum (reference run_robomove.py
    hyperparameters, full budget: 100 epochs per phase) with N seeds
    trained as one vmapped program (MultiSeedTrainer), once per
    precision arm;
  * optionally the Sarcos-shaped config (--sarcos; synthetic stand-in
    recipe from make_sarcos_artifact.py);
  * compares per-seed best train losses, the final-epoch loss envelope,
    and free-run test RMSE (evaluate_rmse — Outputs.test_mse semantics);
  * verdict: the arms are statistically equivalent iff the mean
    per-seed |ΔRMSE| is small against the across-seed RMSE spread and
    the loss envelopes interleave (|Δmean| < the across-seed std).

Run on the real TPU — the knob only changes numerics there (CPU f32
matmuls are exact at every precision setting).

Usage: python scripts/precision_experiment.py [--seeds N] [--epochs E]
       [--sarcos] [--out artifacts/precision_experiment.json]
       [--arms highest,high]

`--arms REF,CANDIDATE` compares any two precision settings with the same
methodology (first arm is the reference); the round-4 follow-up run uses
`--arms high,default` to decide whether the bf16-grade 'default' tier
(~+27% device-side over 'highest' on RoboMove, rel err ~4e-6) is also
end-to-end equivalent.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --smoke: plumbing validation on CPU (tiny shapes; numerics are
# precision-independent on CPU, so only the flow is being tested)
SMOKE = {}
SMOKE_WINDOW = {}


def robomove_config(phase, precision):
    """Reference run_robomove.py hyperparameters (run/run_robomove.py)."""
    from cbfssm_tpu.data import RoboMove

    dim_x = 4
    return {
        "ds": RoboMove,
        "batch_size": 32,
        "shuffle": 10000,
        "dim_x": dim_x,
        "ind_pnt_num": 100,
        "samples": 50,
        "learning_rate": 0.01,
        "loss_factors": np.asarray([20.0, 2.0 * (phase == 1)]),
        "k_factor": 1.0,
        "recog_len": 50,
        "zeta_pos": 2.0,
        "zeta_mean": 0.1**2,
        "zeta_var": 0.01**2,
        "var_x": np.asarray([0.1**2] * dim_x),
        "var_y": np.asarray([1.0**2] * dim_x),
        "gp_var": 0.1**2,
        "gp_len": 1.0,
        "gp_matmul_precision": precision,
        **SMOKE,
    }


def _train_arm(ds, phase_configs, precision, n_seeds, epochs,
               root_prefix):
    """Train one precision arm (one MultiSeedTrainer per phase config,
    later phases retrain from the same directory) and collect the
    per-seed metrics both arms are compared on."""
    import time

    from cbfssm_tpu.models import CBFSSM
    from cbfssm_tpu.training import MultiSeedTrainer

    root = tempfile.mkdtemp(prefix=f"{root_prefix}_{precision}_")
    t0 = time.perf_counter()
    for phase, config in enumerate(phase_configs):
        model = CBFSSM(config)
        trainer = MultiSeedTrainer(model, root, n_seeds=n_seeds)
        trainer.train(ds, epochs, retrain=phase > 0)
    wall = time.perf_counter() - t0
    losses = np.stack(trainer.train_all)  # [epochs, n_seeds] (last phase)
    rmse = trainer.evaluate_rmse(ds)
    return {
        "precision": precision,
        "best_train_loss": np.asarray(trainer.best_loss).tolist(),
        "final_epoch_loss": losses[-1].tolist(),
        "last5_mean_loss": losses[-5:].mean(axis=0).tolist(),
        "free_run_rmse": rmse.tolist(),
        "wall_s": round(wall, 1),
    }


def train_arm_robomove(precision, n_seeds, epochs):
    """Full two-phase curriculum for one precision arm."""
    from cbfssm_tpu.data import RoboMove

    ds = RoboMove(SMOKE_WINDOW.get("seq_len", 300),
                  SMOKE_WINDOW.get("seq_stride", 50))
    return _train_arm(
        ds, [robomove_config(phase, precision) for phase in range(2)],
        precision, n_seeds, epochs, "prec",
    )


def sarcos_parts():
    """Synthetic Sarcos-shaped stand-in (make_sarcos_artifact recipe) +
    the reference run_sarcos.py hyperparameters (Sarcos default epochs
    are 8; --sarcos-epochs extends the budget for the experiment)."""
    from run.run_sarcos import model_config, seq_len, seq_stride

    from cbfssm_tpu.data import Sarcos
    from scripts.make_sarcos_artifact import synth_sarcos

    data_dir = tempfile.mkdtemp() + "/"
    synth_sarcos(data_dir + "sarcos_inv.mat")
    ds = Sarcos(seq_len, seq_stride, data_dir=data_dir)
    return ds, dict(model_config)


def train_arm_sarcos(precision, n_seeds, epochs):
    ds, config = sarcos_parts()
    config = dict(config, gp_matmul_precision=precision, **SMOKE)
    return _train_arm(ds, [config], precision, n_seeds, epochs,
                      "prec_sarcos")


def compare(arms, names=("highest", "high")):
    """Equivalence verdict from the two arms' per-seed metrics.

    ``names[0]`` is the reference arm, ``names[1]`` the candidate; the
    historical JSON keys keep the mean-RMSE fields named by arm."""
    hi, lo = (arms[names[0]], arms[names[1]])
    rmse_hi = np.asarray(hi["free_run_rmse"])
    rmse_lo = np.asarray(lo["free_run_rmse"])
    loss_hi = np.asarray(hi["last5_mean_loss"])
    loss_lo = np.asarray(lo["last5_mean_loss"])
    rmse_spread = float(np.std(np.concatenate([rmse_hi, rmse_lo])))
    out = {
        "rmse_mean_abs_diff": float(np.mean(np.abs(rmse_hi - rmse_lo))),
        "rmse_across_seed_spread": rmse_spread,
        f"rmse_mean_{names[0]}": float(rmse_hi.mean()),
        f"rmse_mean_{names[1]}": float(rmse_lo.mean()),
        "loss_mean_diff": float(loss_hi.mean() - loss_lo.mean()),
        "loss_across_seed_std": float(
            np.std(np.concatenate([loss_hi, loss_lo]))
        ),
    }
    # equivalent iff the per-seed RMSE movement is within the seed noise
    # AND the loss envelopes interleave
    out["equivalent"] = bool(
        out["rmse_mean_abs_diff"] <= max(rmse_spread, 1e-12)
        and abs(out["loss_mean_diff"]) <= out["loss_across_seed_std"]
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--sarcos", action="store_true")
    ap.add_argument("--sarcos-epochs", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument(
        "--arms", default="highest,high",
        help="comma-separated REF,CANDIDATE precision settings",
    )
    args = ap.parse_args()
    arms = tuple(args.arms.split(","))
    if len(arms) != 2 or len(set(arms)) != 2:
        ap.error("--arms wants exactly two distinct settings")
    if args.out:
        # fail on an unwritable artifact path BEFORE the multi-hour
        # experiment, not at the final write
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    if args.smoke:
        SMOKE.update(samples=4, ind_pnt_num=10, batch_size=8, recog_len=4)
        SMOKE_WINDOW.update(seq_len=30, seq_stride=30)
        args.epochs = min(args.epochs, 2)
        args.sarcos_epochs = min(args.sarcos_epochs, 2)

    from cbfssm_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    result = {"seeds": args.seeds, "epochs": args.epochs,
              "arms": list(arms), "robomove": {}}
    for precision in arms:
        print(f"=== robomove arm: {precision} ===", file=sys.stderr)
        result["robomove"][precision] = train_arm_robomove(
            precision, args.seeds, args.epochs
        )
    result["robomove"]["verdict"] = compare(result["robomove"], arms)
    if args.sarcos:
        result["sarcos"] = {}
        for precision in arms:
            print(f"=== sarcos arm: {precision} ===", file=sys.stderr)
            result["sarcos"][precision] = train_arm_sarcos(
                precision, args.seeds, args.sarcos_epochs
            )
        result["sarcos"]["verdict"] = compare(result["sarcos"], arms)
    print(json.dumps(result))
    if args.out:
        out_dir = os.path.dirname(os.path.abspath(args.out))
        os.makedirs(out_dir, exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
        os.replace(tmp, args.out)


if __name__ == "__main__":
    main()
