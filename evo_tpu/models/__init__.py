from evo_tpu.models.base import Data, StepStats, make_data, blockify, unblockify  # noqa: F401
from evo_tpu.models.bsc import BSC, BSCParams  # noqa: F401

try:  # SSSC lands after BSC in the build order
    from evo_tpu.models.sssc import SSSC, SSSCParams  # noqa: F401
except ImportError:  # pragma: no cover
    SSSC = None
    SSSCParams = None
