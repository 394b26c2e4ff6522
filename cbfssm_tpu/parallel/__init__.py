from cbfssm_tpu.parallel import distributed  # noqa: F401
from cbfssm_tpu.parallel.particle import ParticleParallel  # noqa: F401
from cbfssm_tpu.parallel.sharding import (  # noqa: F401
    DataParallel,
    make_mesh,
    pad_batch,
)
