from evo_tpu.models.base import (  # noqa: F401
    Data, StepStats, make_data, blockify, unblockify, em_steps)
from evo_tpu.models.bsc import BSC, BSCParams  # noqa: F401
from evo_tpu.models.sssc import SSSC, SSSCParams  # noqa: F401
