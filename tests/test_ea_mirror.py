"""Trajectory-exact EA mirror vs the actual reference (VERDICT r2 item 8).

evo_tpu.variational.mirror re-implements the reference's evolutionary E-step
host-side with IDENTICAL np.random consumption, so a seeded run must match
the reference bit-for-bit — states, lpjs, ordering, and counters.  These
tests drive the real reference code (evo/variational/eas.py, utils.py)
against the mirror; they are the regression oracle that makes future EA
refactors provable without statistical arguments.

Skipped when /root/reference is absent (the mirror itself still works as a
deterministic oracle on its own then).
"""

import os
import sys

import numpy as np
import pytest

from evo_tpu.variational.mirror import (
    MIRROR_MUTATION,
    MIRROR_SELECTION,
    E_step_mirror,
    evolve_states_mirror,
    vary_Kn_mirror,
)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "evo")), reason="reference not available"
)


@pytest.fixture(scope="module")
def ref_ea():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from measure_reference_baseline import install_mpi_stub

    install_mpi_stub()
    sys.path.insert(0, REF)
    import evo.variational.eas as ref_eas
    import evo.variational.utils as ref_vutils

    return ref_eas, ref_vutils


def _states(rng, K, H, p=0.3):
    """Unique random binary states — the reference's evolve_states assumes a
    duplicate-free K^(n) (its init_states enforces it, utils.py:104-137)."""
    while True:
        s = rng.random((K, H)) < p
        if len(np.unique(s.astype(int), axis=0)) == K:
            return s


def _toy_lpj(states):
    """Deterministic float64 scorer shared by both sides."""
    H = states.shape[-1]
    w = np.cos(np.arange(H) * 0.7) * 2.0
    sf = states.astype(np.float64)
    return sf @ w - 0.35 * sf.sum(-1) ** 2


@pytest.mark.parametrize("op", ["randflip", "sparseflip", "cross",
                                "cross_randflip", "cross_sparseflip"])
def test_mutation_bit_exact(ref_ea, rng, op):
    ref_eas, _ = ref_ea
    ref_fn = getattr(ref_eas, op)
    parents = _states(rng, 6, 17)
    for seed in range(5):
        np.random.seed(seed)
        if op == "cross":
            want = ref_fn(parents.copy())
        else:
            want = ref_fn(parents.copy(), 3, 4.0, 0.1)
        np.random.seed(seed)
        got = MIRROR_MUTATION[op](parents.copy(), 3, 4.0, 0.1)
        assert np.array_equal(want, got), op


@pytest.mark.parametrize("sel", ["fit", "rand"])
def test_selection_bit_exact(ref_ea, rng, sel):
    ref_eas, _ = ref_ea
    ref_fn = {"fit": ref_eas.fitparents, "rand": ref_eas.randparents}[sel]
    cand = _states(rng, 12, 9)
    lpj = rng.normal(size=12) * 3.0
    for seed in range(5):
        np.random.seed(seed)
        want = ref_fn(cand, 5, lpj)
        np.random.seed(seed)
        got = MIRROR_SELECTION[sel](cand, 5, lpj)
        assert np.array_equal(want, got)


@pytest.mark.parametrize(
    "mutation,selection,gens,allzero,background",
    [
        ("randflip", "fit", 1, False, False),
        ("randflip", "fit", 3, True, False),
        ("sparseflip", "rand", 2, False, False),
        ("cross_randflip", "fit", 2, False, False),
        ("randflip", "fit", 2, False, True),
    ],
)
def test_evolve_states_bit_exact(ref_ea, rng, mutation, selection, gens,
                                 allzero, background):
    """Full reference evolve_states (eas.py:153-313) vs the mirror: same
    seed -> identical returned states AND lpjs, across operators,
    generations, and permanent-state configurations."""
    ref_eas, _ = ref_ea
    S, H = 10, 11
    n_par, n_chl = 4, 2
    ss = _states(rng, S, H)
    if background:
        ss[:, -1] = True
    lpj = _toy_lpj(ss)
    S_perm = 1 if allzero else 0
    incl = np.zeros((S_perm, H), dtype=bool)
    suff = {
        "this_lpj": lpj.copy(),
        "this_states": ss.copy(),
        "incl": incl,
        "permanent": {"allzero": allzero, "background": background,
                      "singletons": False},
        "n_parents": n_par,
        "n_children": n_chl,
        "n_generations": gens,
        "parent_selection": {"fit": ref_eas.fitparents,
                             "rand": ref_eas.randparents}[selection],
        "mutation_algorithm": getattr(ref_eas, mutation),
        "bitflip_prob": 0.12,
    }
    params = {"piH": 2.5}
    for seed in range(4):
        np.random.seed(seed)
        want_s, want_l = ref_eas.evolve_states(suff, params, _toy_lpj)
        np.random.seed(seed)
        got_s, got_l = evolve_states_mirror(
            ss.copy(), lpj.copy(), _toy_lpj,
            n_parents=n_par, n_children=n_chl, n_generations=gens,
            parent_selection=selection, mutation_algorithm=mutation,
            bitflip_prob=0.12, sparseness=2.5, incl=incl,
            background=background,
        )
        assert np.array_equal(want_s, got_s)
        assert np.array_equal(want_l, got_l)


def test_vary_kn_bit_exact(ref_ea, rng):
    """Reference vary_Kn (utils.py:231-337) vs the functional mirror,
    including the argpartition/unravel pairing order and both merge modes."""
    _, ref_vutils = ref_ea
    S, H, T = 8, 9, 6
    for trial in range(10):
        ss = _states(rng, S, H)
        new = _states(rng, T, H)
        lpj = _toy_lpj(ss)
        lpj_new = _toy_lpj(new)
        mprime = [S, 3, T][trial % 3]
        uni = trial % 2 == 0
        rej = trial % 3 == 0
        if not uni:  # whole-set mode needs exactly S replacement states
            new = _states(rng, S, H)
            lpj_new = _toy_lpj(new)
        states_ref = ss.copy()
        lpj_store = np.zeros(S)
        nu_r, ns_r = ref_vutils.vary_Kn(
            lpj.copy(), lpj_new.copy(), lpj_store, states_ref, new.copy(),
            H, S, 0, np.zeros((0, H), dtype=bool), mprime,
            unification=uni, reject_worse=rej,
        )
        got_s, got_l, nu_g, ns_g = vary_Kn_mirror(
            ss, lpj, new, lpj_new, Mprime=mprime,
            unification=uni, reject_worse=rej,
        )
        assert np.array_equal(states_ref, got_s)
        assert np.array_equal(lpj_store, got_l)
        assert (nu_r, ns_r) == (nu_g, ns_g)


def test_full_ea_epoch_trajectory_bit_exact(ref_ea, rng):
    """Three consecutive E-step epochs over a batch of datapoints — the
    reference's per-datapoint evolve+vary_Kn loop (_models.py:497-535) vs
    the mirror, sharing one np.random stream: final K^(n) state sets and
    lpj arrays match bit-for-bit."""
    ref_eas, ref_vutils = ref_ea
    N, S, H, T_par, T_chl = 7, 8, 10, 3, 2
    ss0 = np.stack([_states(rng, S, H) for _ in range(N)])
    suff_proto = {
        "incl": np.zeros((0, H), dtype=bool),
        "permanent": {"allzero": False, "background": False,
                      "singletons": False},
        "n_parents": T_par,
        "n_children": T_chl,
        "n_generations": 2,
        "parent_selection": ref_eas.fitparents,
        "mutation_algorithm": ref_eas.randflip,
        "bitflip_prob": None,
    }
    params = {"piH": 2.0}

    def run_reference(seed):
        np.random.seed(seed)
        ss = ss0.copy()
        lpj = np.stack([_toy_lpj(ss[n]) for n in range(N)])
        for _epoch in range(3):
            for n in range(N):
                suff = dict(suff_proto, this_states=ss[n],
                            this_lpj=_toy_lpj(ss[n]))
                new_s, new_l = ref_eas.evolve_states(suff, params, _toy_lpj)
                ref_vutils.vary_Kn(
                    _toy_lpj(ss[n]), new_l, lpj[n], ss[n], new_s,
                    H, S, 0, suff_proto["incl"], S,
                )
        return ss, lpj

    def run_mirror(seed):
        np.random.seed(seed)
        ss = ss0.copy()
        lpj = np.stack([_toy_lpj(ss[n]) for n in range(N)])
        for _epoch in range(3):
            for n in range(N):
                new_s, new_l = evolve_states_mirror(
                    ss[n], _toy_lpj(ss[n]), _toy_lpj,
                    n_parents=T_par, n_children=T_chl, n_generations=2,
                    parent_selection="fit", mutation_algorithm="randflip",
                    sparseness=2.0,
                )
                ss[n], lpj[n], _, _ = vary_Kn_mirror(
                    ss[n], _toy_lpj(ss[n]), new_s, new_l, Mprime=S,
                )
        return ss, lpj

    want_ss, want_lpj = run_reference(123)
    got_ss, got_lpj = run_mirror(123)
    assert np.array_equal(want_ss, got_ss)
    assert np.array_equal(want_lpj, got_lpj)


@pytest.mark.parametrize("mutation,selection,bf", [
    ("randflip", "fit", None),
    ("cross_sparseflip", "rand", 0.12),
])
def test_complete_E_step_bit_exact_vs_reference_model(ref_ea, rng, mutation,
                                                      selection, bf):
    """NEXT r3 #5 (mirror-mode breadth): E_step_mirror reproduces the
    reference's COMPLETE E_step method (_models.py:454-565) bit-for-bit on a
    real BSC model — permanent-state (allzero) lpj rows, per-datapoint
    evolve + vary_Kn with the shared np.random stream, lpj-reset counters,
    and the B-shifted free energy — over two consecutive epochs.

    Both sides call the reference model's own log_pseudo_joint functions, so
    any mismatch isolates the LOOP (RNG order, dedup order, merge pairing,
    permanent-row handling), which is exactly what the mirror documents."""
    import evo.models as ref_models

    _, ref_vutils = ref_ea
    D, H, N, S = 7, 9, 6, 8
    n_par, n_chl, n_gen = 4, 2, 2
    pi, sigma = 0.22, 1.15
    W = rng.standard_normal((D, H))
    Y = rng.standard_normal((N, D)) * 2.0
    x_infr = np.ones((N, D), bool)

    np.random.seed(31)  # init_states draws the initial K^(n)
    suff_r = ref_vutils.init_states(
        N, S, H, selection, mutation, n_par, n_chl, n_gen, bitflip_prob=bf,
        permanent={"allzero": True, "background": False, "singletons": False})
    S_perm = suff_r["S_perm"]
    assert S_perm == 1
    ss0, lpj0 = suff_r["ss"].copy(), suff_r["lpj"].copy()
    incl = suff_r["incl"].copy()
    # crossover overrides n_children to n_parents-1 (utils.py:202-207)
    n_chl_eff = suff_r["n_children"]

    # ---- reference: two full E_step epochs
    model_r = ref_models.BSC(D, H, S)
    theta_r = {"W": W.copy(), "pi": pi, "sigma": sigma}
    data_r = {"y": Y.copy(), "x_infr": x_infr.copy()}
    np.random.seed(77)
    for _ in range(2):
        F_r, S_nuni_r, S_sub_r = model_r.E_step(theta_r, suff_r, data_r)

    # ---- mirror: same lpj callables, same seed, the mirror's loop
    model_m = ref_models.BSC(D, H, S)
    theta_m = {"W": W.copy(), "pi": pi, "sigma": sigma}
    aux = {"permanent": {"allzero": True, "background": False,
                         "singletons": False}, "S_perm": S_perm}
    data_m = {"y": Y.copy(), "x_infr": x_infr.copy()}

    def eval_lpj(n, states):
        data_m["this_y"], data_m["this_x_infr"] = Y[n], x_infr[n]
        aux["this_states"] = np.asarray(states, bool)
        return model_m.log_pseudo_joint(theta_m, aux, data_m)

    def eval_perm(n):
        data_m["this_y"], data_m["this_x_infr"] = Y[n], x_infr[n]
        return model_m.log_pseudo_joint_permanent_states(theta_m, aux, data_m)

    ss_m, lpj_m = ss0.copy(), lpj0.copy()
    np.random.seed(77)
    for _ in range(2):
        # E_step calls E_step_precompute each epoch (_models.py:490) — it
        # sets ljc/pre1/pil_bar and ZEROES the reset counters
        model_m.E_step_precompute(theta_m, aux, data_m)
        F_m, S_nuni_m, S_sub_m = E_step_mirror(
            ss_m, lpj_m, eval_lpj, eval_lpj_perm=eval_perm, incl=incl,
            n_parents=n_par, n_children=n_chl_eff, n_generations=n_gen,
            parent_selection=selection, mutation_algorithm=mutation,
            bitflip_prob=bf, sparseness=theta_m["piH"],
            Mprime=suff_r["Mprime"], ljc=theta_m["ljc"],
            B_max=model_m.B_max, B_max_shft=model_m.B_max_shft)

    assert F_m == F_r, (F_m, F_r)
    assert S_nuni_m == S_nuni_r and S_sub_m == S_sub_r
    np.testing.assert_array_equal(ss_m, suff_r["ss"])
    np.testing.assert_array_equal(lpj_m, suff_r["lpj"])
    for c in ("reset_lpj_isnan", "reset_lpj_smaller_eps_lpj",
              "reset_lpj_isinf"):
        assert aux[c] == suff_r[c]
