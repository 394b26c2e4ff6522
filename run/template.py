"""Template run script (capability parity with reference run/template.py).

Config keys match the reference's documented dict exactly; the model
constructors accept the same plain dict.
"""

import numpy as np

from cbfssm_tpu.data import RoboMove
from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.outputs import Outputs
from cbfssm_tpu.training import Trainer

#
# Config
#
root_dir = "run_output/my_own_experiment"
# dataset
ds_sel = RoboMove  # set to your new dataset class
seq_len = 100  # length of sub-trajectories for training
seq_stride = 50  # distance between two sub-trajectories
# model
model_sel = CBFSSM  # use CBFSSMHALF if no unstable hidden dimension
dim_x = 4  # dimensionality of latent state
model_config = {
    # dataset
    "ds": ds_sel,
    "batch_size": 32,
    "shuffle": 10000,  # shuffle buffer size
    # method
    "dim_x": dim_x,
    "ind_pnt_num": 100,  # number of inducing points
    "samples": 50,  # number of particles
    "learning_rate": 0.01,
    "loss_factors": np.asarray([10.0, 0.0]),  # lambdas; start with no entropy
    "k_factor": 1.0,  # k-factor; e.g. 50 for stable datasets
    "recog_len": 50,  # 2*t' in the paper
    # variables init state (can leave as-is in most cases)
    "zeta_pos": 2.0,
    "zeta_mean": 0.1**2,
    "zeta_var": 0.01**2,
    "var_x": np.asarray([0.1**2] * dim_x),
    "var_y": np.asarray([1.0**2] * dim_x),  # use ds_sel.dim_y entries for CBFSSMHALF
    "gp_var": 0.1**2,
    "gp_len": 1.0,
}
# training
train = True
epochs = 100
# evaluation
output_sel = Outputs


#
# Run
#
def main():
    outputs = output_sel(root_dir)
    ds = ds_sel(seq_len, seq_stride)
    outputs.set_ds(ds)
    model = model_sel(model_config)
    outputs.set_model(model, root_dir)
    trainer = Trainer(model, root_dir)
    if train:
        trainer.train(ds, epochs)
    outputs.set_trainer(trainer)
    outputs.create_all()


if __name__ == "__main__":
    main()
