from cbfssm_tpu.ops.pallas.gp_predict import fused_predict  # noqa: F401
