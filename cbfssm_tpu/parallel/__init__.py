from cbfssm_tpu.parallel.sharding import (  # noqa: F401
    DataParallel,
    make_mesh,
    pad_batch,
)
