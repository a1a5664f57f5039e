from evo_tpu.variational.config import EAConfig  # noqa: F401
from evo_tpu.variational.mutation import (  # noqa: F401
    randflip,
    sparseflip,
    cross,
    cross_randflip,
    cross_sparseflip,
)
from evo_tpu.variational.selection import fitparents, randparents  # noqa: F401
from evo_tpu.variational.evolve import evolve_states  # noqa: F401
from evo_tpu.variational.varykn import vary_Kn, vary_Kn_whole_set  # noqa: F401
from evo_tpu.variational.state_init import init_states, full_state_matrix, EState  # noqa: F401
