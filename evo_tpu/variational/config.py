"""Static (trace-time) configuration of the evolutionary E-step.

The reference keeps these as entries of the mutable ``my_suff_stat`` dict
(reference: evo/variational/utils.py:209-226).  Here they are a frozen
dataclass so they can be closed over by jitted functions; everything that
varies per epoch (states, lpj, RNG keys) lives in the EState pytree instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

SELECTIONS = ("fit", "rand")
MUTATIONS = ("randflip", "sparseflip", "cross", "cross_randflip", "cross_sparseflip")


@dataclasses.dataclass(frozen=True)
class EAConfig:
    S: int
    H: int
    n_parents: int
    n_children: int
    n_generations: int
    parent_selection: str = "fit"
    mutation_algorithm: str = "randflip"
    bitflip_prob: Optional[float] = None
    Mprime: Optional[int] = None  # max substitutions per datapoint; defaults to S
    # permanent states (reference: evo/variational/utils.py:39-54)
    allzero: bool = False
    background: bool = False
    # exact E-step mode: K^(n) = full 2^H_ enumeration, EA disabled
    # (reference: evo/variational/utils.py:71-86)
    exact: bool = False
    # number of scan blocks the batch is split into inside em_step
    n_blocks: int = 1
    # store the K^(n) state sets bit-packed (uint8, 8x less HBM/checkpoint/
    # transfer); em_step unpacks per block
    packed_states: bool = False
    # K^(n) merge mode (reference vary_Kn params, utils.py:242-243): the
    # default unification mode swaps best-new for worst-old; with
    # unification=False the WHOLE set is replaced by the children — either
    # unconditionally (reject_worse=False) or only when the summed lpj
    # improves (reject_worse=True, utils.py:325-335)
    unification: bool = True
    reject_worse: bool = True
    # position-preserving unification merge (vary_Kn_swap): same K^(n) SET
    # per epoch, but surviving rows keep their storage slot, so the state
    # stack is only written where a child actually won — avoids rewriting
    # all S rows through an f32 one-hot gather.  Trajectories differ from
    # the lpj-sorted merge only through the position-indexed Gumbel noise
    # in parent selection (statistically identical).
    swap_merge: bool = False

    def __post_init__(self):
        assert self.parent_selection in SELECTIONS, self.parent_selection
        assert self.mutation_algorithm in MUTATIONS, self.mutation_algorithm
        if not self.exact:
            assert self.n_parents <= self.S, "n_parents must be <= S (ref utils.py:209)"
        if "sparseflip" in self.mutation_algorithm:
            assert self.bitflip_prob is not None, "sparseflip needs bitflip_prob"
        if "cross" in self.mutation_algorithm:
            # crossover children come from parent PAIRS (reference
            # eas.py:118-125); with < 2 parents the pair list is empty and
            # the mutation would fail deep inside the jitted step
            assert self.n_parents >= 2, (
                f"mutation '{self.mutation_algorithm}' needs n_parents >= 2 "
                f"(got {self.n_parents})"
            )
        if self.Mprime is not None:
            assert self.Mprime <= self.S
        assert not (self.allzero and self.background)
        if not self.unification and not self.exact:
            # whole-set replacement needs exactly S children (the reference's
            # `states[:, :] = states_new` requires matching shapes)
            assert self.children_per_gen * self.n_generations == self.S, (
                "non-unification mode needs n_new == S "
                f"(got {self.children_per_gen * self.n_generations} != {self.S})"
            )

    @property
    def S_perm(self) -> int:
        # allzero => one permanent state (reference utils.py:47-53);
        # background forces the last unit on instead and has S_perm = 0.
        return 1 if self.allzero else 0

    @property
    def H_mut(self) -> int:
        """Number of latent units the EA mutates (background unit excluded,
        reference eas.py:215-219)."""
        return self.H - 1 if self.background else self.H

    @property
    def mprime(self) -> int:
        return self.S if self.Mprime is None else self.Mprime

    @property
    def children_per_gen(self) -> int:
        """Fixed number of children per generation.

        Crossover yields n_parents*(n_parents-1) children (reference
        eas.py:118 and the no_children override at utils.py:202-207);
        flip-based mutations yield n_parents*n_children.
        """
        if "cross" in self.mutation_algorithm:
            return self.n_parents * (self.n_parents - 1)
        return self.n_parents * self.n_children

    @property
    def n_new(self) -> int:
        """Total new candidate states per datapoint per E-step."""
        return 0 if self.exact else self.children_per_gen * self.n_generations
