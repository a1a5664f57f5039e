"""Worker for the 2-process CPU integration test (test_multiprocess.py).

Run as:  python tests/mp_worker.py <outdir> <port> <process_id>

Each worker is one JAX process with 2 virtual CPU devices (4 global).  It
exercises the REAL multi-process code paths — jax.distributed.initialize via
init_distributed, make_global_data assembly from process-local rows,
process_allgather, the global-statistics standard_init, sharded em_step
(GSPMD cross-process psums over gloo), gather_reconstruction's
deinterleave, and checkpoint save/load — and writes its results to
<outdir>/results_<pid>.npz for the parent to compare against the
single-process run.

This is the TPU-native analog of the reference's `mpirun -n 2 python
main.py` deployment test (reference examples/bars-test/README.md:76-80).
"""

import os
import sys

outdir, port, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from evo_tpu import BSC, init_states
from evo_tpu.parallel import (
    distribute_estate,
    init_distributed,
    make_global_data,
    make_mesh,
)
from evo_tpu.apps.training import gather_reconstruction
from evo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

idx, cnt = init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert (idx, cnt) == (pid, 2), (idx, cnt)
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

# ---- shared experiment definition (identical constants in the parent) ----
N, D, H, S, nb, P = 64, 9, 6, 8, 2, 2
B = N // nb
B_loc = B // P

rng = np.random.default_rng(1)
Y = rng.normal(size=(N, D)).astype(np.float32)

# this process's local rows: per block b, the [pid*B_loc, (pid+1)*B_loc)
# segment — the layout make_global_data assembles into the same global
# blocked array as single-process make_data(Y)
y_local = np.concatenate(
    [Y[b * B + pid * B_loc : b * B + (pid + 1) * B_loc] for b in range(nb)]
)

mesh = make_mesh()
data = make_global_data(y_local, n_blocks=nb, mesh=mesh)
assert not data.incomplete

model = BSC(D=D, H=H)

# global-statistics init: both the y_host path and the addressable-shards
# path must give the identical Theta^0 on every process, matching the
# parent's single-process standard_init (f32-vs-f64 accumulation tolerance)
exp = np.load(os.path.join(outdir, "expected.npz"))
params_gs = model.standard_init(data, seed=0, y_host=y_local)
params_shards = model.standard_init(data, seed=0)
np.testing.assert_allclose(
    np.asarray(params_gs.W), np.asarray(params_shards.W), rtol=1e-6
)
np.testing.assert_allclose(
    float(params_gs.sigma), float(params_shards.sigma), rtol=1e-6
)
np.testing.assert_allclose(
    np.asarray(params_gs.W), exp["W_init"], rtol=1e-4, atol=1e-5
)
np.testing.assert_allclose(
    float(params_gs.sigma), float(exp["sigma_init"]), rtol=1e-4
)

# the EM-trajectory comparison starts from the parent's EXACT init so the
# only cross-layout difference is GSPMD reduction order
from evo_tpu.models.bsc import BSCParams
import jax.numpy as jnp

params = BSCParams(
    W=jnp.asarray(exp["W_init"]),
    pi=jnp.asarray(np.float32(exp["pi_init"])),
    sigma=jnp.asarray(np.float32(exp["sigma_init"])),
    pies=jnp.asarray(exp["pies_init"]),
)

# estate: full init (same seed as single-process), local columns distributed
cfg, estate_full = init_states(
    N=N, S=S, H=H, no_parents=4, no_children=1, no_generations=2,
    n_blocks=nb, seed=2,
)
estate_local = jax.tree.map(
    lambda a: np.asarray(a)[:, pid * B_loc : (pid + 1) * B_loc], estate_full
)
estate = distribute_estate(estate_local, mesh)

Fs = []
for e in range(3):
    key = jax.random.fold_in(jax.random.key(7), e)
    params, estate, stats, _ = model.em_step(params, estate, data, key, cfg)
    Fs.append(float(stats.F))

# reconstruction epoch: exercises gather_global/process_allgather + the
# deinterleave path
key = jax.random.fold_in(jax.random.key(7), 3)
params, estate, stats, y_rec = model.em_step(
    params, estate, data, key, cfg, do_reconstruction=True
)
Fs.append(float(stats.F))
rec = gather_reconstruction(y_rec, N)

# checkpoint roundtrip through the multi-process paths (gather on save,
# make_array_from_callback sharded layout on load), then one more epoch
ckpt = os.path.join(outdir, "ckpt.npz")
save_checkpoint(ckpt, params, estate, 4, jax.random.key(9))
params2, estate2, epoch2, key2 = load_checkpoint(ckpt, params, mesh=mesh)
assert epoch2 == 4
np.testing.assert_array_equal(np.asarray(params.W), np.asarray(params2.W))

key = jax.random.fold_in(jax.random.key(7), 4)
params3, estate3, stats, _ = model.em_step(params2, estate2, data, key, cfg)
Fs.append(float(stats.F))

# ---- incomplete-data phase: NaNs ONLY in process 0's rows, so the
# per-process incomplete_local flags DISAGREE — executes the
# process_allgather OR-reduce (distributed.py make_global_data) and the
# masked global_init_stats path under a real 2-process cluster
Y2 = Y.copy()
miss = np.random.default_rng(5).random(Y.shape) < 0.1
rows_p0 = np.zeros(N, dtype=bool)
for b in range(nb):
    rows_p0[b * B : b * B + B_loc] = True
miss &= rows_p0[:, None]
assert miss.any()
Y2[miss] = np.nan
y2_local = np.concatenate(
    [Y2[b * B + pid * B_loc : b * B + (pid + 1) * B_loc] for b in range(nb)]
)
assert np.isnan(y2_local).any() == (pid == 0)  # the flags really disagree
data2 = make_global_data(y2_local, n_blocks=nb, mesh=mesh)
assert data2.incomplete  # OR-reduced: True on BOTH processes

params_i0 = model.standard_init(data2, seed=0, y_host=y2_local)
np.testing.assert_allclose(
    np.asarray(params_i0.W), exp["W_init_inc"], rtol=1e-4, atol=1e-5
)
np.testing.assert_allclose(
    float(params_i0.sigma), float(exp["sigma_init_inc"]), rtol=1e-4
)

cfg2, estate2_full = init_states(
    N=N, S=S, H=H, no_parents=4, no_children=1, no_generations=2,
    n_blocks=nb, seed=3,
)
estate2_loc = jax.tree.map(
    lambda a: np.asarray(a)[:, pid * B_loc : (pid + 1) * B_loc], estate2_full
)
estate_i = distribute_estate(estate2_loc, mesh)
params_i = BSCParams(
    W=jnp.asarray(exp["W_init_inc"]),
    pi=jnp.asarray(np.float32(exp["pi_init_inc"])),
    sigma=jnp.asarray(np.float32(exp["sigma_init_inc"])),
    pies=jnp.asarray(exp["pies_init_inc"]),
)
params_i, estate_i, stats_i, y_rec_i = model.em_step(
    params_i, estate_i, data2, jax.random.key(11), cfg2,
    do_reconstruction=True,
)
rec_i = gather_reconstruction(y_rec_i, N)

np.savez(
    os.path.join(outdir, f"results_{pid}.npz"),
    F=np.asarray(Fs),
    W=np.asarray(params3.W),
    sigma=np.asarray(params3.sigma),
    pi=np.asarray(params3.pi),
    rec=rec,
    F_inc=np.float64(float(stats_i.F)),
    rec_inc=rec_i,
)
print(f"[worker {pid}] OK", flush=True)
