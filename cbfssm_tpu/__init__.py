"""cbfssm_tpu — TPU-native CBF-SSM framework.

A from-scratch JAX/XLA/Pallas re-design of the CBF-SSM reference
(silvanmelchior/CBF-SSM; "Structured Variational Inference in Unstable
Gaussian Process State Space Models", arXiv:1907.07035).

Layers (mirroring the reference's capability surface, reference
cbfssm/__init__ layout):

- :mod:`cbfssm_tpu.ops`       — math core: kernels, sparse GP, Cholesky,
  distributions, quaternions (pure JAX + Pallas TPU kernels).
- :mod:`cbfssm_tpu.models`    — CBFSSM / CBFSSMHALF / PRSSM / Voliro ELBOs
  as jit-compiled ``lax.scan`` programs.
- :mod:`cbfssm_tpu.data`      — dataset loaders, windowing, generators
  (numpy host pipeline feeding fixed shapes).
- :mod:`cbfssm_tpu.training`  — jitted Adam training loop + checkpoints.
- :mod:`cbfssm_tpu.parallel`  — device-mesh sharding (pjit data parallel).
- :mod:`cbfssm_tpu.outputs`   — evaluation artifacts (plots, RMSE files).
"""

__version__ = "0.1.0"

from cbfssm_tpu import ops  # noqa: F401
