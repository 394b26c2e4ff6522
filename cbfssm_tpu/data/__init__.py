"""Dataset layer: numpy host pipeline producing fixed-shape
[experiments, time, dim] arrays and windowed sequence batches.

Capability parity with reference cbfssm/datasets/ (11 dataset classes over
9 distinct datasets + .mat manager + offline generators)."""

from cbfssm_tpu.data.base import BaseDS  # noqa: F401
from cbfssm_tpu.data.ds_manager import DSManager  # noqa: F401
from cbfssm_tpu.data.datasets import (  # noqa: F401
    Actuator,
    Ballbeam,
    Drive,
    Dryer,
    Furnace,
    RoboMove,
    RoboMoveSimple,
    Sarcos,
    SpringNonlinear,
    VoliroFlipDS,
    VoliroTiltDS,
)
