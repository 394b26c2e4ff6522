"""RoboMove with the two-phase entropy curriculum (reference
run/run_robomove.py): phase 0 trains without the entropy term, phase 1
retrains from the phase-0 checkpoint with entropy weight 2."""

import numpy as np

from cbfssm_tpu.data import RoboMove
from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.outputs import OutputsRoboMove
from cbfssm_tpu.training import Trainer


def main(
    root="run_output/robomove",
    epochs=100,
    data_dir=None,
    config_overrides=None,
    seq_len=300,
    seq_stride=50,
):
    """Defaults reproduce the reference two-phase curriculum exactly;
    the keyword overrides let CI execute the full flow on fixtures."""
    for phase in range(2):
        root_dir = root
        dim_x = 4
        model_config = {
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
        }
        model_config.update(config_overrides or {})
        retrain = phase == 1

        outputs = OutputsRoboMove(root_dir)
        ds = RoboMove(seq_len, seq_stride, data_dir=data_dir)
        outputs.set_ds(ds)
        model = CBFSSM(model_config)
        outputs.set_model(model, root_dir)
        trainer = Trainer(model, root_dir)
        trainer.train(ds, epochs, retrain=retrain)
        outputs.set_trainer(trainer)
        outputs.create_all()


if __name__ == "__main__":
    main()
