from cbfssm_tpu.training.trainer import Trainer  # noqa: F401
from cbfssm_tpu.training.multiseed import MultiSeedTrainer  # noqa: F401
from cbfssm_tpu.training.sweep import SweepTrainer, SweptModel  # noqa: F401
from cbfssm_tpu.training import checkpoint  # noqa: F401
