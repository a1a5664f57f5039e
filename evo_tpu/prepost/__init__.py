from evo_tpu.prepost.patches import (  # noqa: F401
    OverlappingPatches,
    MultiDimOverlappingPatches,
    mean_merger,
    median_merger,
    extract_random_patches,
)
from evo_tpu.prepost.metrics import psnr  # noqa: F401
from evo_tpu.prepost.viz import make_grid, save_grid, scale  # noqa: F401
