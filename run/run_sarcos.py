"""Sarcos 7-DoF arm forward dynamics (reference run/run_sarcos.py):
5 iterations, dim_x=14, 100 inducing points."""

import numpy as np

from cbfssm_tpu.data import Sarcos
from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.outputs import Outputs, OutputSummary, vmapped_reproduction
from cbfssm_tpu.training import Trainer

root_dir = "run_output/sarcos"
iterations = 5
seq_len = 250
seq_stride = 10
dim_x = 14
model_config = {
    "ds": Sarcos,
    "batch_size": 5,
    "shuffle": 10000,
    "dim_x": dim_x,
    "ind_pnt_num": 100,
    "samples": 20,
    "learning_rate": 0.05,
    "loss_factors": np.asarray([6.0, 0.0]),
    "k_factor": 50.0,
    "recog_len": 16,
    "zeta_pos": 2.0,
    "zeta_mean": 0.05**2,
    "zeta_var": 0.01**2,
    "var_x": np.asarray([0.002**2] * dim_x),
    "var_y": np.asarray([0.05**2] * dim_x),
    "gp_var": 0.5**2,
    "gp_len": 1.0,
}
epochs = 8


def main(
    root=root_dir,
    iterations=iterations,
    epochs=epochs,
    data_dir=None,
    config_overrides=None,
    seq_len=seq_len,
    seq_stride=seq_stride,
    vmap_seeds=False,
):
    """Defaults reproduce the reference experiment exactly; the keyword
    overrides let CI execute the full driver flow on fixtures.
    ``vmap_seeds=True`` trains the ``iterations`` seeds as one vmapped
    device program (MultiSeedTrainer; identical artifact layout)."""
    config = dict(model_config, **(config_overrides or {}))
    if vmap_seeds:
        ds = Sarcos(seq_len, seq_stride, data_dir=data_dir)
        return vmapped_reproduction(CBFSSM(config), ds, root, iterations, epochs)
    summary = OutputSummary(root)
    for it in range(iterations):
        if iterations != 1:
            print("\n=== Iteration %d ===\n" % it)
        out_dir = root if iterations == 1 else root + "/run_%d" % it
        outputs = Outputs(out_dir)
        ds = Sarcos(seq_len, seq_stride, data_dir=data_dir)
        outputs.set_ds(ds)
        model = CBFSSM(config)
        outputs.set_model(model, out_dir)
        trainer = Trainer(model, out_dir, seed=it)
        trainer.train(ds, epochs)
        outputs.set_trainer(trainer)
        outputs.create_all()
        summary.add_outputs(outputs)
    summary.write_summary()
    return summary


if __name__ == "__main__":
    main()
