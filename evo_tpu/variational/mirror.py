"""Trajectory-exact NumPy mirror of the reference's evolutionary E-step.

The XLA E-step (evolve.py / varykn.py) is *statistically* equivalent to the
reference but consumes a different RNG (counter-based threefry vs numpy's
global MT19937), so trajectories cannot be compared bit-for-bit.  This
module provides a host-side oracle that reproduces the reference's numpy RNG
consumption order EXACTLY: seeded identically, `evolve_states_mirror` +
`vary_Kn_mirror` return bit-identical states/lpjs to the reference's
evo/variational/eas.py:153-313 and evo/variational/utils.py:231-337.

Purpose (debug/regression only — never on the device path):
  * pins down the reference's exact RNG call order and index arithmetic as
    executable documentation, verified against the real reference by
    tests/test_ea_mirror.py;
  * future EA refactors can be regression-tested against a deterministic
    full-epoch trajectory without needing /root/reference installed.

RNG consumption order per generation (eas.py:221-311):
  1. parent selection: one np.random.choice (fit: with p=, rand: without)
  2. mutation: randflip -> one np.random.rand(n_parents', H');
     sparseflip -> one np.random.random((n_parents'*n_children, H'));
     cross -> one np.random.randint(1, H') per parent pair (in
     itertools.combinations order); cross_* chains cross then the flip.
Deduplication and vary_Kn consume no randomness.

Note the faithfully-mirrored quirks: duplicate-of-seen children are re-added
to the next generation's selection pool at one copy per distinct state with
the lpj looked up at an index that assumes exactly one permanent state
(eas.py:292-293 pairs s_unique[i+1] with lpj_unique[i]), and the last row of
the reversed-unique scan is excluded (the "-1 to neglect all-zero state",
eas.py:281-284).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
from scipy.special import logsumexp


# --------------------------------------------------------------------------
# mutation operators (reference eas.py:10-135) — same np.random call order
# --------------------------------------------------------------------------


def randflip_mirror(parents, n_children, sparseness=None, p_bf=None):
    """One distinct uniform bitflip per child (eas.py:10-43)."""
    P, H = parents.shape
    out = np.repeat(parents, n_children, axis=0)
    # argpartition of one uniform draw per (parent, unit): the n_children
    # smallest ranks are the flip positions — distinct within a parent
    flip = np.argpartition(np.random.rand(P, H), n_children - 1, axis=1)
    flip = flip[:, :n_children].flatten()
    rows = np.arange(P * n_children)
    out[rows, flip] = ~out[rows, flip]
    return out


def sparseflip_mirror(parents, n_children, sparseness, p_bf):
    """Sparseness-targeting bitflips (eas.py:46-100): the 1->0 and 0->1 flip
    probabilities are set so E[|child|] tracks `sparseness` at overall flip
    rate p_bf; float arithmetic matches the reference operation-for-
    operation so the comparison against np.random.random is bit-exact."""
    assert p_bf is not None
    P, H = parents.shape
    s_abs = parents.sum(axis=1)
    out = np.repeat(parents, n_children, axis=0)
    eps = 1e-100
    alpha = (
        (H - s_abs)
        * ((H * p_bf) - (sparseness - s_abs))
        / ((sparseness - s_abs + H * p_bf) * s_abs + eps)
    )
    p_0 = (H * p_bf) / (H + (alpha - 1.0) * s_abs + eps)
    p_1 = alpha * p_0
    p_0 = np.repeat(np.repeat(p_0[:, None], H, axis=1), n_children, axis=0)
    p_1 = np.repeat(np.repeat(p_1[:, None], H, axis=1), n_children, axis=0)
    p = np.where(out, p_1, p_0)
    flips = np.random.random((P * n_children, H)) < p
    out[flips] = ~out[flips]
    return out


def cross_mirror(parents):
    """One-point crossover of every parent pair -> P*(P-1) children
    (eas.py:103-125); one np.random.randint(1, H) per combination."""
    P, H = parents.shape
    out = np.empty((P * (P - 1), H), dtype=bool)
    k = 0
    for a, b in combinations(range(P), 2):
        cp = np.random.randint(low=1, high=H)
        out[k], out[k + 1] = parents[a].copy(), parents[b].copy()
        out[k, cp:], out[k + 1, cp:] = parents[b, cp:], parents[a, cp:]
        k += 2
    return out


def cross_randflip_mirror(parents, n_children, sparseness, p_bf):
    return randflip_mirror(cross_mirror(parents), 1, sparseness, p_bf)


def cross_sparseflip_mirror(parents, n_children, sparseness, p_bf):
    return sparseflip_mirror(cross_mirror(parents), 1, sparseness, p_bf)


MIRROR_MUTATION = {
    "randflip": randflip_mirror,
    "sparseflip": sparseflip_mirror,
    "cross": lambda par, nc, sp, bf: cross_mirror(par),
    "cross_randflip": cross_randflip_mirror,
    "cross_sparseflip": cross_sparseflip_mirror,
}


# --------------------------------------------------------------------------
# parent selection (reference eas.py:138-150)
# --------------------------------------------------------------------------


def fitparents_mirror(candidates, n_parents, lpj):
    """Fitness-proportional sampling without replacement: fitness is lpj
    shifted positive by -2*min(min lpj, 0) (eas.py:138-146)."""
    fit = lpj - 2 * np.min([np.min(lpj), 0.0])
    fit = fit / fit.sum()
    idx = np.random.choice(candidates.shape[0], size=n_parents,
                           replace=False, p=fit)
    return candidates[idx]


def randparents_mirror(candidates, n_parents, lpj=None):
    idx = np.random.choice(candidates.shape[0], size=n_parents, replace=False)
    return candidates[idx]


MIRROR_SELECTION = {"fit": fitparents_mirror, "rand": randparents_mirror}


# --------------------------------------------------------------------------
# evolve_states (reference eas.py:153-313)
# --------------------------------------------------------------------------


def evolve_states_mirror(
    s,  # [S, H] bool — current K^(n)
    lpj,  # [S] — its log-pseudo-joints
    eval_lpj,  # callable [K, H] bool -> [K] float
    *,
    n_parents,
    n_children,
    n_generations,
    parent_selection="fit",
    mutation_algorithm="randflip",
    bitflip_prob=None,
    sparseness,
    incl=None,  # [S_perm, H] permanent states
    background=False,
):
    """Bit-exact mirror of reference evolve_states (eas.py:153-313): returns
    (new_unique_states, their lpjs) with identical values AND order.  Reads
    the global np.random stream exactly as the reference does."""
    select = MIRROR_SELECTION[parent_selection]
    mutate = MIRROR_MUTATION[mutation_algorithm]
    S, H = s.shape
    if incl is None:
        incl = np.zeros((0, H), dtype=bool)
    seen = np.concatenate([incl.astype(bool), s.astype(bool)], axis=0)
    seen_lpj = np.asarray(lpj, dtype=float)
    H_mut = H - 1 if background else H

    pool_s, pool_l = s, lpj
    new_states = new_lpj = new_uniq = None
    fill = 0
    for g in range(n_generations):
        parents = select(pool_s, min(len(pool_s), n_parents), pool_l)
        children = mutate(parents[:, :H_mut], n_children, sparseness,
                          bitflip_prob)
        if background:
            children = np.concatenate(
                [children, np.ones((len(children), 1), dtype=bool)], axis=1)

        if g == 0:
            C = len(children)
            new_states = np.zeros((C * n_generations, H), dtype=bool)
            new_lpj = np.zeros(C * n_generations)
            new_uniq = np.zeros(C * n_generations, dtype=bool)

        # -- new-and-unique children, in the reference's np.unique order
        # (lexicographic over rows: the void-view byte sort and the row
        # sort coincide for 0/1 integer data, eas.py:252-257)
        n_seen = len(seen)
        cat = np.concatenate([seen, children], axis=0).astype(int)
        # np.unique(axis=0) sorts rows lexicographically — identical order
        # to the reference's void-view byte sort for 0/1 integer rows —
        # and return_index keeps first occurrences in that KEY order (the
        # reference stores new uniques in this order, not index order)
        _, first = np.unique(cat, axis=0, return_index=True)
        idx_new = first[first >= n_seen]
        n_new = len(idx_new)
        if n_new > 0:
            sl = slice(fill, fill + n_new)
            new_states[sl] = cat[idx_new].astype(bool)
            new_lpj[sl] = eval_lpj(new_states[sl])
            new_uniq[sl] = True

        # -- one copy of every *previously seen* state regenerated this
        # generation, paired with its stored lpj (eas.py:271-293; see the
        # module docstring for the off-by-one index pairing quirk)
        rev = cat[::-1]
        _, first_rev = np.unique(rev, axis=0, return_index=True)
        C_g = len(children)
        hit = first_rev[(first_rev >= C_g) & (first_rev < C_g + n_seen - 1)]
        hit = hit - C_g
        end = fill + n_new
        if hit.size > 0:
            fwd = np.arange(n_seen - 1)
            not_regen = fwd[::-1][hit]
            regen = np.setdiff1d(fwd, not_regen)
            sl = slice(fill + n_new, fill + n_new + regen.size)
            new_states[sl] = seen[regen + 1]
            new_lpj[sl] = seen_lpj[regen]
            end = sl.stop

        if n_new > 0:
            seen = np.append(seen, new_states[fill:fill + n_new], axis=0)
            seen_lpj = np.append(seen_lpj, new_lpj[fill:fill + n_new])

        if fill == end:  # no new states at all: the reference breaks out
            break
        pool_s = new_states[fill:end]
        pool_l = new_lpj[fill:end]
        fill = end

    return new_states[new_uniq], new_lpj[new_uniq]


# --------------------------------------------------------------------------
# vary_Kn (reference utils.py:231-337) — functional form
# --------------------------------------------------------------------------


def vary_Kn_mirror(
    states,  # [S, H] bool — K^(n), NOT modified
    lpj_old,  # [S]
    states_new,  # [T, H] bool — evolved (already new-unique) states
    lpj_new,  # [T]
    *,
    incl=None,
    Mprime=None,
    unification=True,
    reject_worse=True,
):
    """Mirror of the reference's in-place vary_Kn, returned functionally:
    (states_out [S,H], lpj_out [S], n_unique_add, n_sub_add).  Bit-exact
    including the argpartition pairing order of best-new vs worst-old
    (utils.py:294-319)."""
    states = np.array(states, dtype=bool)
    lpj_old = np.array(lpj_old, dtype=float)
    S, H = states.shape
    if incl is None:
        incl = np.zeros((0, H), dtype=bool)
    S_perm = len(incl)
    if Mprime is None:
        Mprime = S

    # re-deduplicate against permanents + current K^(n) (utils.py:279-285)
    cat = np.concatenate([incl.astype(bool), states, states_new],
                         axis=0).astype(int)
    _, first = np.unique(cat, axis=0, return_index=True)
    keep = first[first >= S_perm + S]
    n_uni = keep.size

    if not unification:
        if reject_worse and (lpj_new.sum() < lpj_old.sum()):
            return states, lpj_old, 0, 0
        return states_new.astype(bool), np.asarray(lpj_new, float), n_uni, n_uni

    sn = cat[keep].astype(bool)
    ln = np.asarray(lpj_new)[keep - (S_perm + S)]

    # pair the Mprime best new with the Mprime worst old by one global
    # argsort over the stacked pair (utils.py:294-313)
    M = min(ln.size, Mprime)
    hi = np.argpartition(ln, -M)[-M:]
    lo = np.argpartition(lpj_old, M - 1)[:M]
    stacked = np.stack([ln[hi], lpj_old[lo]]) if lo.size > 0 else ln[hi]
    order = np.argsort(stacked, axis=None)[::-1]
    rows, cols = np.unravel_index(order, (2, hi.size))
    best = cols[:M][rows[:M] == 0]
    worst_r, worst_c = rows[-1:-1 - M:-1], cols[-1:-1 - M:-1]
    bad = lo[worst_c[worst_r == 1]]
    good = hi[best]
    for j in range(good.size):
        states[bad[j]] = sn[good[j]]
        lpj_old[bad[j]] = ln[good[j]]
    return states, lpj_old, n_uni, good.size


# --------------------------------------------------------------------------
# the COMPLETE E-step loop (reference _models.py:454-565) — functional form
# --------------------------------------------------------------------------


def E_step_mirror(
    ss,  # [N, S, H] bool — K^(n) sets, updated IN PLACE
    lpj,  # [N, S_perm + S] float — stored lpjs, updated IN PLACE
    eval_lpj,  # callable (n, states [K, H] bool) -> [K] float
    *,
    eval_lpj_perm=None,  # callable (n) -> [S_perm] float (permanent rows)
    incl=None,  # [S_perm, H] bool — permanent states
    n_parents,
    n_children,
    n_generations,
    parent_selection="fit",
    mutation_algorithm="randflip",
    bitflip_prob=None,
    sparseness,
    Mprime=None,
    unification=True,
    reject_worse=True,
    background=False,
    B_max=0.0,  # reference _models.py:55-56 defaults
    B_max_shft=np.inf,
    ljc=0.0,  # log-joint constant, model_params["ljc"]
):
    """Bit-exact mirror of the reference's complete per-epoch E-step loop
    (_models.py:454-565): per datapoint IN ORDER, refresh the permanent-state
    lpj rows (skipped under `background`, _models.py:508-512), evaluate the
    current K^(n), evolve new states (consuming the global np.random stream
    exactly as the reference does), and merge via vary_Kn — then the
    B-shifted free energy over the FULL lpj array including permanent rows
    (_models.py:543-547).

    `ss` and `lpj` are updated in place like the reference's my_suff_stat
    arrays.  Returns (F, S_nunique, S_sub) with the reference's per-N
    averaging (single-process framing: comm.allreduce == identity).
    """
    N, S, H = ss.shape
    if incl is None:
        incl = np.zeros((0, H), dtype=bool)
    S_perm = len(incl)
    assert lpj.shape == (N, S_perm + S)
    if Mprime is None:
        Mprime = S

    S_nunique = 0.0
    S_sub = 0.0
    for n in range(N):
        if not background and S_perm > 0:
            lpj[n, :S_perm] = eval_lpj_perm(n)
        this_lpj = np.asarray(eval_lpj(n, ss[n]), dtype=float)
        new_s, new_l = evolve_states_mirror(
            ss[n], this_lpj, lambda st: eval_lpj(n, st),
            n_parents=n_parents, n_children=n_children,
            n_generations=n_generations, parent_selection=parent_selection,
            mutation_algorithm=mutation_algorithm,
            bitflip_prob=bitflip_prob, sparseness=sparseness,
            incl=incl, background=background,
        )
        ss_n, lpj_n, n_uni, n_sub = vary_Kn_mirror(
            ss[n], this_lpj, new_s, new_l, incl=incl, Mprime=Mprime,
            unification=unification, reject_worse=reject_worse,
        )
        ss[n] = ss_n
        lpj[n, S_perm:] = lpj_n
        S_nunique += n_uni
        S_sub += n_sub

    B = np.minimum(B_max - lpj.max(axis=1), B_max_shft)  # [N]
    F = ljc + float((logsumexp(lpj + B[:, None], axis=1) - B).sum()) / N
    return F, S_nunique / N, S_sub / N
