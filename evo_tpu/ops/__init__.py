from evo_tpu.ops.bitpack import pack_states, eq_matrix, dup_within, dup_against  # noqa: F401
from evo_tpu.ops.numerics import (  # noqa: F401
    B_MAX,
    eps_lpj,
    reset_lpj,
    shifted_logsumexp,
    free_energy_from_lpj,
    posterior_weights,
)
