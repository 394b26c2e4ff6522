"""SpringNonlinear benchmark run.

The reference ships the SpringNonlinear dataset class
(cbfssm/datasets/dsmanager_ds.py:54-63) but no dedicated run script
(BASELINE.md notes the template pattern is used); this driver applies the
small-scale hyperparameter scheme to it. Generate the dataset first:

    python create_datasets/create_spring_nonlinear.py \
        --out cbfssm_tpu/data/data/spring_nonlinear.mat
"""

import math
import sys

import numpy as np

from cbfssm_tpu.data import SpringNonlinear
from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.outputs import Outputs, OutputSummary, vmapped_reproduction
from cbfssm_tpu.training import Trainer

root_dir = "run_output/spring"
iterations = 5  # overridable from the command line (see __main__)
seq_len = 50
seq_stride = 1
dim_x = 4
model_config = {
    "ds": SpringNonlinear,
    "batch_size": 10,
    "shuffle": 10000,
    "dim_x": dim_x,
    "ind_pnt_num": 20,
    "samples": 50,
    "learning_rate": 0.1,
    "loss_factors": np.asarray([0.5, 0.0]),
    "k_factor": 50.0,
    "recog_len": 16,
    "zeta_pos": 2.0,
    "zeta_mean": 0.05**2,
    "zeta_var": 0.01**2,
    "var_x": np.asarray([0.002**2] * dim_x),
    "var_y": np.asarray([1.0**2] * dim_x),
    "gp_var": 0.5**2,
    "gp_len": 2.0,
}
train_iterations = 30000


def main(
    root=root_dir,
    iterations=iterations,
    train_iterations=train_iterations,
    data_dir=None,
    config_overrides=None,
    seq_len=seq_len,
    seq_stride=seq_stride,
    vmap_seeds=False,
):
    """``vmap_seeds=True`` trains all iterations as ONE vmapped device
    program (MultiSeedTrainer, ~8x faster than the serial loop — see
    BENCHMARKS.md); artifacts/summary are identical in layout."""
    config = dict(model_config, **(config_overrides or {}))

    if vmap_seeds:
        ds = SpringNonlinear(seq_len, seq_stride, data_dir=data_dir)
        epochs = math.ceil(train_iterations / ds.train_in_batch.shape[0])
        vmapped_reproduction(
            CBFSSM(config), ds, root, iterations, epochs,
            metrics_path=root + "/metrics.jsonl",
        )
        return

    summary = OutputSummary(root)
    for it in range(iterations):
        if iterations != 1:
            print("\n=== Iteration %d ===\n" % it)
        out_dir = root if iterations == 1 else root + "/run_%d" % it
        outputs = Outputs(out_dir)
        ds = SpringNonlinear(seq_len, seq_stride, data_dir=data_dir)
        outputs.set_ds(ds)
        model = CBFSSM(config)
        outputs.set_model(model, out_dir)
        epochs = math.ceil(train_iterations / ds.train_in_batch.shape[0])
        trainer = Trainer(model, out_dir, seed=it,
                          metrics_path=out_dir + "/metrics.jsonl")
        trainer.train(ds, epochs)
        outputs.set_trainer(trainer)
        outputs.create_all()
        summary.add_outputs(outputs)
    summary.write_summary()


if __name__ == "__main__":
    # argv parsed only when run as a script: importers (bench.py's
    # multiseed stage, pytest) must not inherit the caller's argv
    main(iterations=int(sys.argv[1]) if len(sys.argv) > 1 else iterations)
