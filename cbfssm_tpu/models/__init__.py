"""SSM model families: CBFSSM (flagship), CBFSSMHALF, PRSSM, Voliro.

Each model is a functional JAX program: ``init(key) -> params``,
``loss(params, u, y, key, condition, weights) -> (loss, aux)``,
``predict(params, u, y, key, condition) -> PredictOutput``. Time
recursions are ``lax.scan``; per-step GP predictions are solve-free MXU
matmuls against per-step-invariant cached operators (see
cbfssm_tpu.ops.gp)."""

from cbfssm_tpu.models.cbfssm import CBFSSM  # noqa: F401
from cbfssm_tpu.models.cbfssmhalf import CBFSSMHALF  # noqa: F401
from cbfssm_tpu.models.prssm import PRSSM  # noqa: F401
from cbfssm_tpu.models.voliro import Voliro  # noqa: F401
