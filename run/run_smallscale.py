"""Small-scale system-identification benchmarks (reference
run/run_smallscale.py): 5 datasets x 5 iterations with per-dataset
(lambda_1, k_factor)."""

import math
import sys

import numpy as np

from cbfssm_tpu.data import Actuator, Ballbeam, Drive, Dryer, Furnace
from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.outputs import Outputs, OutputSummary, vmapped_reproduction
from cbfssm_tpu.training import Trainer

# Choose Tasks: (dataset, name, lambda_1, k_factor)
datasets = [
    (Actuator, "actuator", 0.5, 100),
    (Ballbeam, "ballbeam", 0.05, 10),
    (Drive, "drive", 0.5, 50),
    (Dryer, "dryer", 0.15, 100),
    (Furnace, "furnace", 0.15, 100),
]
tasks = range(len(datasets))  # CLI can select one task (see __main__)


def model_config(task_nr: int, dim_x: int = 4) -> dict:
    """The reference's verbatim hyperparameter dict for one task
    (run_smallscale.py:35-59), including its (lambda_1, k_factor)."""
    return {
        "ds": datasets[task_nr][0],
        "batch_size": 10,
        "shuffle": 10000,
        "dim_x": dim_x,
        "ind_pnt_num": 20,
        "samples": 50,
        "learning_rate": 0.1,
        "loss_factors": np.asarray([1.0, 0.0]) * datasets[task_nr][2],
        "k_factor": datasets[task_nr][3],
        "recog_len": 16,
        "zeta_pos": 2.0,
        "zeta_mean": 0.05**2,
        "zeta_var": 0.01**2,
        "var_x": np.asarray([0.002**2] * dim_x),
        "var_y": np.asarray([1.0**2] * dim_x),
        "gp_var": 0.5**2,
        "gp_len": 2.0,
    }


def main(
    task_list=None,
    root="run_output/smallscale",
    iterations=5,
    train_iterations=30000,
    data_dir=None,
    config_overrides=None,
    seq_len=50,
    seq_stride=1,
    vmap_seeds=False,
):
    """Defaults reproduce the reference experiment exactly; the keyword
    overrides exist so CI can execute the full driver flow (config →
    dataset → train → outputs → summary) on fixtures at 1 epoch.
    ``vmap_seeds=True`` trains the ``iterations`` seeds as one vmapped
    device program (MultiSeedTrainer; identical artifact layout)."""
    for task_nr in task_list if task_list is not None else tasks:
        root_dir = root + "/" + datasets[task_nr][1]
        ds_sel = datasets[task_nr][0]
        config = model_config(task_nr)
        config.update(config_overrides or {})

        if vmap_seeds:
            ds = ds_sel(seq_len, seq_stride, data_dir=data_dir)
            epochs = math.ceil(train_iterations / ds.train_in_batch.shape[0])
            vmapped_reproduction(
                CBFSSM(config), ds, root_dir, iterations, epochs
            )
            continue
        summary = OutputSummary(root_dir)
        for it in range(iterations):
            if iterations != 1:
                print("\n=== Iteration %d ===\n" % it)
            out_dir = root_dir if iterations == 1 else root_dir + "/run_%d" % it
            outputs = Outputs(out_dir)
            ds = ds_sel(seq_len, seq_stride, data_dir=data_dir)
            outputs.set_ds(ds)
            model = CBFSSM(config)
            outputs.set_model(model, out_dir)
            epochs = math.ceil(train_iterations / ds.train_in_batch.shape[0])
            trainer = Trainer(model, out_dir, seed=it)
            trainer.train(ds, epochs)
            outputs.set_trainer(trainer)
            outputs.create_all()
            summary.add_outputs(outputs)

        summary.write_summary()


if __name__ == "__main__":
    # argv parsed only when run as a script: importers must not
    # inherit the caller's argv
    main(task_list=[int(sys.argv[1])] if len(sys.argv) > 1 else None)
