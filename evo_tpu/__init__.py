"""evo_tpu — TPU-native evolutionary variational EM for sparse-coding generative models.

A ground-up JAX/XLA/Pallas re-design of the capabilities of tvlearn/evo
(reference: /root/reference): truncated variational EM where the per-datapoint
posterior is approximated over a small set K^(n) of S binary latent states,
improved every epoch by an evolutionary algorithm (parent selection -> mutation
-> dedup -> fitness-based replacement).

Models:
  - BSC  (Binary Sparse Coding, trained with evolutionary E-steps -> "EBSC")
  - SSSC (Spike-and-Slab Sparse Coding with closed-form slab marginalization
          -> "ES3C")

Design (TPU-first, not a port):
  - all hot paths are fixed-shape, jittable, batched over [N, S, H]
  - MPI collectives of the reference are replaced by a `jax.sharding.Mesh`
    with a 'data' axis; reductions become in-graph psums inserted by GSPMD
  - the per-datapoint Python loops of the reference become vmap/scan
  - duplicate-state handling uses bit-packed keys + masking (dup -> -inf lpj)
    instead of dynamic-shape np.unique
"""

from evo_tpu.models import BSC, SSSC  # noqa: F401
from evo_tpu.variational import init_states, EAConfig  # noqa: F401

__version__ = "0.1.0"
