import numpy as np
import pytest
import jax
import jax.numpy as jnp

from evo_tpu.variational.config import EAConfig
from evo_tpu.variational.evolve import evolve_states
from evo_tpu.variational.varykn import vary_Kn


def make_unique_states(rng, S, H):
    seen = set()
    out = []
    while len(out) < S:
        s = tuple((rng.random(H) < 0.4).tolist())
        if s not in seen:
            seen.add(s)
            out.append(s)
    return np.array(out, dtype=bool)


def toy_lpj_fn(states):
    """Deterministic scoring: prefer states with more ON bits, tie-break by
    binary value — hand-checkable."""
    sf = states.astype(jnp.float32)
    val = sf @ (2.0 ** jnp.arange(states.shape[-1], dtype=jnp.float32))
    return sf.sum(-1) * 100.0 + val * 1e-3


def test_evolve_shapes_and_uniqueness(rng):
    S, H = 8, 12
    cfg = EAConfig(S=S, H=H, n_parents=4, n_children=2, n_generations=3)
    ss = jnp.asarray(make_unique_states(rng, S, H))
    lpj = toy_lpj_fn(ss)
    children, child_lpj, new_unique, _raw = evolve_states(
        jax.random.key(0), ss, lpj, toy_lpj_fn, cfg, 2.0
    )
    T = cfg.n_new
    assert children.shape == (T, H)
    assert child_lpj.shape == (T,)
    cnp, lnp, unp = map(np.asarray, (children, child_lpj, new_unique))
    ssnp = np.asarray(ss)
    seen = {tuple(r.tolist()) for r in ssnp}
    for i in range(T):
        key = tuple(cnp[i].tolist())
        if unp[i]:
            # genuinely new and unique at its position
            assert key not in seen, "marked unique but already seen"
            seen.add(key)
            expected = float(np.asarray(toy_lpj_fn(jnp.asarray(cnp[i][None])))[0])
            assert np.isclose(lnp[i], expected, rtol=1e-5)
        else:
            assert lnp[i] == -np.inf


def test_evolve_marks_duplicates_of_K(rng):
    # with n_children == H every child of a parent is 1 bitflip away;
    # flipping a bit of an all-zero parent can regenerate singleton members
    S, H = 4, 6
    cfg = EAConfig(S=S, H=H, n_parents=2, n_children=3, n_generations=2)
    ss = jnp.asarray(make_unique_states(rng, S, H))
    lpj = toy_lpj_fn(ss)
    children, child_lpj, new_unique, _raw = evolve_states(
        jax.random.key(1), ss, lpj, toy_lpj_fn, cfg, 2.0
    )
    cnp, unp = np.asarray(children), np.asarray(new_unique)
    kset = {tuple(r.tolist()) for r in np.asarray(ss)}
    for i in range(len(cnp)):
        if tuple(cnp[i].tolist()) in kset:
            assert not unp[i]


def test_vary_kn_swaps_improving_only(rng):
    S, H, T = 5, 8, 6
    ss = jnp.asarray(make_unique_states(rng, S, H))
    lpj = jnp.asarray(np.array([10.0, 2.0, 30.0, 4.0, 5.0], np.float32))
    children = jnp.asarray(make_unique_states(rng, T, H))
    child_lpj = jnp.asarray(np.array([3.0, 50.0, -np.inf, 1.0, 40.0, 4.5], np.float32))
    ss2, lpj2, nsub, _ = vary_Kn(ss, lpj, children, child_lpj, Mprime=S)
    # union top-5 of {10,2,30,4,5} and {3,50,1,40,4.5} = {50,40,30,10,5}? ->
    # sorted union desc: 50,40,30,10,5,4.5,4,3,2,1 -> top5 = 50,40,30,10,5
    out = sorted(np.asarray(lpj2).tolist(), reverse=True)
    assert out == [50.0, 40.0, 30.0, 10.0, 5.0]
    assert int(nsub) == 2
    # monotone improvement invariant (reference utils.py:318)
    assert np.asarray(lpj2).sum() >= np.asarray(lpj).sum()


def test_vary_kn_respects_mprime(rng):
    S, H = 4, 8
    ss = jnp.asarray(make_unique_states(rng, S, H))
    lpj = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    children = jnp.asarray(make_unique_states(rng, 4, H))
    child_lpj = jnp.asarray(np.array([10.0, 11.0, 12.0, 13.0], np.float32))
    ss2, lpj2, nsub, _ = vary_Kn(ss, lpj, children, child_lpj, Mprime=2)
    assert int(nsub) == 2
    out = sorted(np.asarray(lpj2).tolist(), reverse=True)
    # only 2 best new states enter, replacing the 2 worst old
    assert out == [13.0, 12.0, 4.0, 3.0]


def test_mprime_pruning_keeps_best_child_behind_duplicates(rng):
    """Regression: with most children masked to -inf (duplicates), the
    Mprime eligibility pruning must still keep a strictly better child that
    appears AFTER the leading duplicates — the top-Mprime is by VALUE
    (reference utils.py:294 argpartition), with index order only breaking
    ties at the Mprime-th value.  A by-index tiebreak applied to the whole
    `>= kth` mask silently discarded the winning child whenever the
    Mprime-th value was -inf (typical late-epoch merges)."""
    from evo_tpu.variational.varykn import vary_Kn_swap

    S, H, T = 4, 8, 6
    ss = make_unique_states(rng, S + T, H)
    old, new = jnp.asarray(ss[:S], jnp.int8), jnp.asarray(ss[S:], jnp.int8)
    lpj_old = jnp.asarray(np.array([0.0, 1.0, 2.0, 3.0], np.float32))
    child_lpj = jnp.asarray(
        np.array([-np.inf] * (T - 1) + [10.0], np.float32))
    for fn in (vary_Kn, vary_Kn_swap):
        ss2, lpj2, nsub, idx = fn(old, lpj_old, new, child_lpj, 2)
        out = sorted(np.asarray(lpj2).tolist(), reverse=True)
        assert out == [10.0, 3.0, 2.0, 1.0], (fn.__name__, out)
        assert int(nsub) == 1
        # the stored state for lpj=10 is the last child
        pos = int(np.argmax(np.asarray(lpj2)))
        assert np.array_equal(np.asarray(ss2)[pos], ss[S + T - 1])
    # mixed case: ties at the kth value break by index, strict winners
    # always survive regardless of position
    child_lpj2 = jnp.asarray(np.array(
        [5.0, 5.0, 5.0, 7.0, -np.inf, 6.0], np.float32))
    ss2, lpj2, nsub, _ = vary_Kn(old, lpj_old, new, child_lpj2, 3)
    out = sorted(np.asarray(lpj2).tolist(), reverse=True)
    # eligible children = {7, 6} + first tie at 5 -> top-4 of union
    assert out == [7.0, 6.0, 5.0, 3.0], out


def test_vary_kn_keeps_states_consistent_with_lpj(rng):
    S, H, T = 6, 10, 8
    ss = make_unique_states(rng, S + T, H)
    old, new = jnp.asarray(ss[:S]), jnp.asarray(ss[S:])
    lpj_old = toy_lpj_fn(old)
    lpj_new = toy_lpj_fn(new)
    ss2, lpj2, _, _ = vary_Kn(old, lpj_old, new, lpj_new, Mprime=S)
    # stored lpj must equal the score of the stored state
    recomputed = np.asarray(toy_lpj_fn(ss2))
    assert np.allclose(recomputed, np.asarray(lpj2), rtol=1e-5)


def test_vary_kn_swap_matches_topk_as_set(rng):
    """vary_Kn_swap produces exactly vary_Kn's K^(n) SET (states + lpj),
    only slot-stable instead of lpj-sorted; surviving old rows keep their
    positions; idx obeys the same concat(old, children) contract."""
    from evo_tpu.variational.varykn import vary_Kn_swap

    S, H, T = 8, 12, 5
    for trial in range(20):
        ss = make_unique_states(rng, S + T, H)
        old, new = jnp.asarray(ss[:S], jnp.int8), jnp.asarray(ss[S:], jnp.int8)
        lpj_old = jnp.asarray(rng.normal(size=S).astype(np.float32))
        lpj_new = np.asarray(rng.normal(size=T), np.float32)
        if trial % 3 == 0:
            lpj_new[rng.integers(T)] = -np.inf  # masked duplicate child
        lpj_new = jnp.asarray(lpj_new)
        mprime = [S, 2, T][trial % 3]
        a_ss, a_lpj, a_sub, a_idx = vary_Kn(old, lpj_old, new, lpj_new, mprime)
        b_ss, b_lpj, b_sub, b_idx = vary_Kn_swap(old, lpj_old, new, lpj_new,
                                                 mprime)
        set_a = sorted((tuple(s.tolist()), float(l))
                       for s, l in zip(np.asarray(a_ss), np.asarray(a_lpj)))
        set_b = sorted((tuple(s.tolist()), float(l))
                       for s, l in zip(np.asarray(b_ss), np.asarray(b_lpj)))
        assert set_a == set_b
        assert int(a_sub) == int(b_sub)
        # slot stability: rows not swapped are bit-identical in place
        kept = np.asarray(b_idx) < S
        assert np.all(np.asarray(b_idx)[kept] == np.arange(S)[kept])
        assert np.array_equal(np.asarray(b_ss)[kept], np.asarray(old)[kept])
        # idx contract: stored row == concat(old, children)[idx]
        cat = np.concatenate([np.asarray(old), np.asarray(new)], 0)
        assert np.array_equal(np.asarray(b_ss), cat[np.asarray(b_idx)])


@pytest.mark.slow
def test_swap_merge_epoch_equivalence_bsc_and_sssc(rng):
    """EAConfig.swap_merge only changes the ROW ORDER of the merged K^(n);
    one em_step's F and M-step parameters are order-invariant reductions, so
    both merge routes must agree to fp tolerance — for BSC and for SSSC
    (whose XLA path additionally exercises the idx-based stash gather)."""
    from evo_tpu.models.base import make_data
    from evo_tpu.models.bsc import BSC
    from evo_tpu.models.sssc import SSSC
    from evo_tpu.variational.state_init import init_states
    import dataclasses

    N, D, H, S = 64, 9, 6, 8
    Y = rng.normal(size=(N, D)).astype(np.float32) * 2.0

    for model in (BSC(D=D, H=H), SSSC(D=D, H=H)):
        data = make_data(Y, n_blocks=2)
        cfg, estate = init_states(N=N, S=S, H=H, no_parents=4, no_children=2,
                                  no_generations=2, n_blocks=2, seed=1)
        params = model.standard_init(data, seed=0)
        key = jax.random.key(5)
        p_a, e_a, st_a, _ = model.em_step(params, estate, data, key, cfg)
        cfg_sw = dataclasses.replace(cfg, swap_merge=True)
        p_b, e_b, st_b, _ = model.em_step(params, estate, data, key, cfg_sw)
        np.testing.assert_allclose(float(st_a.F), float(st_b.F), rtol=1e-5)
        assert int(jnp.sum(st_a.S_sub)) == int(jnp.sum(st_b.S_sub))
        for name in ("W",):
            np.testing.assert_allclose(
                np.asarray(getattr(p_a, name)), np.asarray(getattr(p_b, name)),
                rtol=2e-4, atol=2e-5, err_msg=f"{type(model).__name__}.{name}")
        # the merged sets are equal per datapoint (order aside)
        sa = np.asarray(e_a.ss).reshape(N, S, H)
        sb = np.asarray(e_b.ss).reshape(N, S, H)
        for n in range(0, N, 7):
            set_a = {tuple(r.tolist()) for r in sa[n]}
            set_b = {tuple(r.tolist()) for r in sb[n]}
            assert set_a == set_b, n


def test_vary_kn_whole_set_reject_worse(rng):
    """Reference non-unification semantics (utils.py:325-335): whole-set
    replacement iff the summed lpj does not decrease; both counters zero on
    rejection."""
    from evo_tpu.variational.varykn import vary_Kn_whole_set

    S, H = 5, 8
    old = jnp.asarray(make_unique_states(rng, S, H))
    lpj_old = jnp.asarray(np.array([10.0, 2.0, 30.0, 4.0, 5.0], np.float32))
    children = jnp.asarray(make_unique_states(rng, S, H))

    # better set -> accepted wholesale
    lpj_new = jnp.asarray(np.array([20.0, 3.0, 31.0, 5.0, 6.0], np.float32))
    uniq = jnp.asarray(np.array([True, True, False, True, True]))
    ss2, lpj2, nu, ns, idx = vary_Kn_whole_set(old, lpj_old, children,
                                               lpj_new, uniq, True)
    np.testing.assert_array_equal(np.asarray(ss2), np.asarray(children))
    np.testing.assert_array_equal(np.asarray(lpj2), np.asarray(lpj_new))
    assert int(nu) == 4 and int(ns) == 4
    np.testing.assert_array_equal(np.asarray(idx), S + np.arange(S))

    # worse set -> rejected, counters zero
    lpj_worse = jnp.asarray(np.array([1.0, 1.0, 1.0, 1.0, 1.0], np.float32))
    ss3, lpj3, nu3, ns3, idx3 = vary_Kn_whole_set(old, lpj_old, children,
                                                  lpj_worse, uniq, True)
    np.testing.assert_array_equal(np.asarray(ss3), np.asarray(old))
    np.testing.assert_array_equal(np.asarray(lpj3), np.asarray(lpj_old))
    assert int(nu3) == 0 and int(ns3) == 0
    np.testing.assert_array_equal(np.asarray(idx3), np.arange(S))

    # reject_worse=False -> worse set still replaces
    ss4, lpj4, nu4, _, _ = vary_Kn_whole_set(old, lpj_old, children,
                                             lpj_worse, uniq, False)
    np.testing.assert_array_equal(np.asarray(ss4), np.asarray(children))
    assert int(nu4) == 4


def test_vary_kn_whole_set_matches_reference():
    """Drive the actual reference vary_Kn in non-unification mode on random
    cases and compare decisions + counters (reference utils.py:231-337)."""
    import os
    import sys

    import pytest

    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "evo")):
        pytest.skip("reference not available")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from measure_reference_baseline import install_mpi_stub

    install_mpi_stub()
    sys.path.insert(0, REF)
    import evo.variational.utils as ref_vutils

    from evo_tpu.variational.varykn import vary_Kn_whole_set

    rng = np.random.default_rng(7)
    S, H = 6, 9
    for trial in range(20):
        old = make_unique_states(rng, S, H)
        children = make_unique_states(rng, S, H)
        lpj_old = rng.normal(size=S)
        lpj_new = rng.normal(size=S) + rng.normal() * 2.0
        for reject_worse in (True, False):
            # ---- reference (mutates in place)
            states_r = old.copy()
            lpj_buf = np.zeros(S)
            lo = lpj_old.copy()
            nu_r, ns_r = ref_vutils.vary_Kn(
                lpj_old=lo, lpj_new=lpj_new.copy(), lpj=lpj_buf,
                states=states_r, states_new=children.copy(), H=H, S=S,
                S_perm=0, incl=np.zeros((0, H), bool), Mprime=S,
                unification=False, reject_worse=reject_worse,
            )
            # ---- ours (new_unique = dedup vs old set, like evolve_states)
            oldset = {tuple(r.tolist()) for r in old}
            seen = set(oldset)
            uniq = []
            for r in children:
                k = tuple(r.tolist())
                uniq.append(k not in seen)
                seen.add(k)
            ss2, lpj2, nu, ns, _ = vary_Kn_whole_set(
                jnp.asarray(old), jnp.asarray(lpj_old),
                jnp.asarray(children), jnp.asarray(lpj_new),
                jnp.asarray(uniq), reject_worse,
            )
            np.testing.assert_array_equal(np.asarray(ss2), states_r)
            np.testing.assert_allclose(np.asarray(lpj2), lpj_buf, rtol=1e-6)
            assert int(nu) == nu_r and int(ns) == ns_r


def test_whole_set_em_step_runs_and_counts(rng):
    """End-to-end: a BSC em_step in non-unification mode trains and the
    free energy stays finite; reject_worse guarantees F-monotone merges."""
    from evo_tpu.models import make_data
    from evo_tpu.models.bsc import BSC
    from evo_tpu.variational.state_init import init_states

    N, H, D, S = 64, 8, 16, 10
    model = BSC(D=D, H=H)
    Y = rng.normal(size=(N, D)).astype(np.float32)
    data = make_data(Y, n_blocks=2)
    # n_new must equal S: 10 parents x 1 child x 1 generation = 10 = S
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=10, no_children=1,
                              no_generations=1, n_blocks=2, seed=0,
                              unification=False, reject_worse=True)
    assert not cfg.unification
    params = model.standard_init(data, seed=0)
    F_prev = -np.inf
    for e in range(5):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(3), e), cfg)
        assert np.isfinite(float(stats.F))
    # sanity on counters: S_sub == S_nunique in whole-set mode
    assert float(stats.S_sub) == float(stats.S_nunique)


@pytest.mark.slow
def test_evolve_states_block_equals_vmapped_per_datapoint(rng):
    """evolve_states_block must be numerically identical to
    vmap(evolve_states) — same per-datapoint RNG stream, same dedup
    bookkeeping — across operators and multiple generations."""
    import jax

    from evo_tpu.variational.config import EAConfig
    from evo_tpu.variational.evolve import evolve_states, evolve_states_block

    B, S, H = 16, 6, 12
    for op, n_gen in (("randflip", 1), ("sparseflip", 2),
                      ("cross_randflip", 3)):
        cfg = EAConfig(S=S, H=H, n_parents=4, n_children=2,
                       n_generations=n_gen, parent_selection="fit",
                       mutation_algorithm=op, bitflip_prob=2.0 / H)
        ss_b = jnp.asarray(np.random.default_rng(0).random((B, S, H)) < 0.3,
                           jnp.int8)
        lpj_b = jnp.asarray(
            np.random.default_rng(1).standard_normal((B, S)), jnp.float32)
        keys_b = jax.random.split(jax.random.key(5), B)
        sparseness = jnp.float32(2.0)

        def lpj_fn(states):  # deterministic toy fitness
            return -jnp.sum(states.astype(jnp.float32), axis=-1) * 0.7

        ch_v, lpj_v, uni_v, raw_v = jax.vmap(
            lambda k, s, l: evolve_states(k, s, l, lpj_fn, cfg, sparseness)
        )(keys_b, ss_b, lpj_b)

        ch_b, lpj_bk, uni_b, raw_b, _aux = evolve_states_block(
            keys_b, ss_b, lpj_b,
            lambda states_b: (jax.vmap(lpj_fn)(states_b), None, ()),
            cfg, sparseness)

        np.testing.assert_array_equal(np.asarray(ch_v), np.asarray(ch_b))
        np.testing.assert_array_equal(np.asarray(lpj_v), np.asarray(lpj_bk))
        np.testing.assert_array_equal(np.asarray(uni_v), np.asarray(uni_b))
        np.testing.assert_array_equal(np.asarray(raw_v), np.asarray(raw_b))
