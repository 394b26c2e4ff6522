from cbfssm_tpu.utils import rotations  # noqa: F401
