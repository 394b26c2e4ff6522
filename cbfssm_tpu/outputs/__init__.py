from cbfssm_tpu.outputs.outputs import Outputs  # noqa: F401
from cbfssm_tpu.outputs.outputs_robomove import OutputsRoboMove  # noqa: F401
from cbfssm_tpu.outputs.outputs_voliro import OutputsVoliro  # noqa: F401
from cbfssm_tpu.outputs.summary import OutputSummary, vmapped_reproduction  # noqa: F401
