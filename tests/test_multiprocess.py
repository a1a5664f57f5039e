"""2-process multi-controller integration test — the multi-process code
paths EXECUTED, not just unit-tested.

The parent computes the single-process expectations on its in-process CPU
mesh, then spawns two real OS processes that form a jax.distributed cluster
(localhost coordinator, gloo CPU collectives, 2 virtual devices each).  The
workers run the full pipeline — make_global_data from per-process local
rows, global-statistics standard_init, sharded em_step with cross-process
psums, reconstruction gather + deinterleave, checkpoint save/load — and the
parent asserts their results equal the single-process run.

This is the analog of the reference's `mpirun -n K` world-size-invariance
guarantee (reference evo/utils/parallel.py Scatterv/Allreduce/Gatherv;
_models.py:242-276 rank-0 bcast init).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from evo_tpu import BSC, init_states
from evo_tpu.models import make_data
from evo_tpu.apps.training import gather_reconstruction

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")

# identical constants in mp_worker.py
N, D, H, S, nb, P = 64, 9, 6, 8, 2, 2
B = N // nb
B_loc = B // P


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_expected(outdir: str):
    """The single-process run the workers must reproduce."""
    rng = np.random.default_rng(1)
    Y = rng.normal(size=(N, D)).astype(np.float32)
    data = make_data(Y, n_blocks=nb)
    model = BSC(D=D, H=H)
    params = model.standard_init(data, seed=0)

    # incomplete-data variant (NaNs only in the rows that land on worker
    # process 0 — the same mask construction as mp_worker.py)
    Y2 = Y.copy()
    miss = np.random.default_rng(5).random(Y.shape) < 0.1
    rows_p0 = np.zeros(N, dtype=bool)
    for b in range(nb):
        rows_p0[b * B : b * B + B_loc] = True
    miss &= rows_p0[:, None]
    Y2[miss] = np.nan
    data2 = make_data(Y2, n_blocks=nb)
    assert data2.incomplete
    params_i = model.standard_init(data2, seed=0, y_host=Y2)

    np.savez(
        os.path.join(outdir, "expected.npz"),
        W_init=np.asarray(params.W),
        sigma_init=np.asarray(params.sigma),
        pi_init=np.asarray(params.pi),
        pies_init=np.asarray(params.pies),
        W_init_inc=np.asarray(params_i.W),
        sigma_init_inc=np.asarray(params_i.sigma),
        pi_init_inc=np.asarray(params_i.pi),
        pies_init_inc=np.asarray(params_i.pies),
    )
    cfg, estate = init_states(
        N=N, S=S, H=H, no_parents=4, no_children=1, no_generations=2,
        n_blocks=nb, seed=2,
    )
    Fs = []
    for e in range(3):
        key = jax.random.fold_in(jax.random.key(7), e)
        params, estate, stats, _ = model.em_step(params, estate, data, key, cfg)
        Fs.append(float(stats.F))
    key = jax.random.fold_in(jax.random.key(7), 3)
    params, estate, stats, y_rec = model.em_step(
        params, estate, data, key, cfg, do_reconstruction=True
    )
    Fs.append(float(stats.F))
    rec = gather_reconstruction(y_rec, N)
    key = jax.random.fold_in(jax.random.key(7), 4)
    params, estate, stats, _ = model.em_step(params, estate, data, key, cfg)
    Fs.append(float(stats.F))

    # incomplete-data phase expectation
    cfg2, estate2 = init_states(
        N=N, S=S, H=H, no_parents=4, no_children=1, no_generations=2,
        n_blocks=nb, seed=3,
    )
    params_i, estate2, stats_i, y_rec_i = model.em_step(
        params_i, estate2, data2, jax.random.key(11), cfg2,
        do_reconstruction=True,
    )
    rec_i = gather_reconstruction(y_rec_i, N)
    return np.asarray(Fs), params, rec, float(stats_i.F), rec_i


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    outdir = str(tmp_path)
    Fs_exp, params_exp, rec_exp, F_inc_exp, rec_inc_exp = (
        _single_process_expected(outdir))

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, outdir, str(port), str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(P)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    results = [
        np.load(os.path.join(outdir, f"results_{pid}.npz"))
        for pid in range(P)
    ]

    # every process computed the identical results (SPMD symmetry)
    for k in ("F", "W", "sigma", "pi", "rec", "F_inc", "rec_inc"):
        np.testing.assert_array_equal(results[0][k], results[1][k])

    # the 5-epoch F trajectory (incl. the post-checkpoint-resume epoch)
    # matches the single-process run
    np.testing.assert_allclose(results[0]["F"], Fs_exp, rtol=2e-4)
    np.testing.assert_allclose(
        results[0]["W"], np.asarray(params_exp.W), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(results[0]["sigma"]), float(params_exp.sigma), rtol=1e-3
    )

    # reconstruction rows: the workers' gather is ordered [p0 rows | p1
    # rows] (each block-major); re-slice the single-process block-major
    # reconstruction the same way
    rec_mp_order = np.concatenate(
        [
            np.concatenate(
                [
                    rec_exp[b * B + pid * B_loc : b * B + (pid + 1) * B_loc]
                    for b in range(nb)
                ]
            )
            for pid in range(P)
        ]
    )
    np.testing.assert_allclose(
        results[0]["rec"], rec_mp_order, rtol=1e-3, atol=1e-4
    )

    # incomplete-data phase: OR-reduced flag + masked init + masked em_step
    # reproduce the single-process run
    np.testing.assert_allclose(
        float(results[0]["F_inc"]), F_inc_exp, rtol=2e-4)
    rec_inc_mp_order = np.concatenate(
        [
            np.concatenate(
                [
                    rec_inc_exp[b * B + pid * B_loc : b * B + (pid + 1) * B_loc]
                    for b in range(nb)
                ]
            )
            for pid in range(P)
        ]
    )
    np.testing.assert_allclose(
        results[0]["rec_inc"], rec_inc_mp_order, rtol=1e-3, atol=1e-4
    )
