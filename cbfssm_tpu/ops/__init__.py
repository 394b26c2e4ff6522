"""Math core: positivity transforms, RBF kernel, Cholesky, sparse GP,
closed-form Gaussian quantities, quaternion algebra."""

from cbfssm_tpu.ops import transforms  # noqa: F401
from cbfssm_tpu.ops import kernels  # noqa: F401
from cbfssm_tpu.ops import linalg  # noqa: F401
from cbfssm_tpu.ops import gp  # noqa: F401
from cbfssm_tpu.ops import distributions  # noqa: F401
from cbfssm_tpu.ops import quaternion  # noqa: F401
