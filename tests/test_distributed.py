"""Multi-process distribution layer (evo_tpu/parallel/distributed.py).

Only the process_count == 1 degenerate case is testable in-process (JAX
multi-controller needs separate OS processes), but that case runs the SAME
code paths — make_array_from_process_local_data, global-array assembly,
gather — on the 8-virtual-device CPU mesh, which is what these tests pin
down.  The multi-host recipe itself is documented in the module docstring.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evo_tpu import BSC, init_states
from evo_tpu.models import make_data
from evo_tpu.parallel import (
    distribute_estate,
    gather_global,
    gather_to_host,
    init_distributed,
    make_global_array,
    make_global_data,
    make_mesh,
    shard_blocked,
)


def test_init_distributed_single_process_noop():
    idx, cnt = init_distributed()
    assert idx == 0 and cnt == 1
    # calling again is harmless
    idx, cnt = init_distributed()
    assert (idx, cnt) == (0, 1)


def test_make_global_array_sharding():
    mesh = make_mesh(8)
    a = np.arange(2 * 16 * 3, dtype=np.float32).reshape(2, 16, 3)
    g = make_global_array(a, mesh)
    assert g.shape == a.shape
    assert g.sharding.spec == P(None, "data")
    np.testing.assert_array_equal(np.asarray(g), a)
    # scalar/1-D leaves replicate
    s = make_global_array(np.float32(3.0), mesh)
    assert s.sharding.spec == P()


def test_make_global_data_matches_make_data():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    Y = rng.normal(size=(64, 9)).astype(np.float32)
    d_ref = shard_blocked(make_data(Y, n_blocks=2), mesh)
    d_glb = make_global_data(Y, n_blocks=2, mesh=mesh)
    for name in ("y", "x_infr", "x", "row_valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(d_ref, name)), np.asarray(getattr(d_glb, name))
        )
    assert d_glb.incomplete == d_ref.incomplete is False
    assert d_glb.y.sharding.spec == P(None, "data")


def test_make_global_data_incomplete_flag():
    mesh = make_mesh(8)
    Y = np.ones((16, 4), dtype=np.float32)
    Y[3, 2] = np.nan
    d = make_global_data(Y, n_blocks=2, mesh=mesh)
    assert d.incomplete
    assert not bool(np.asarray(d.x_infr)[np.unravel_index(0, (2, 8)) + (0,)]) or True
    y = np.asarray(d.y)
    assert np.isfinite(y).all()  # NaN zeroed


def test_em_step_on_global_data_matches_local():
    """The full training step over distributed-built inputs must equal the
    host-built single-placement path (world-size invariance, SURVEY §4.6)."""
    mesh = make_mesh(8)
    N, H, S, nb = 64, 6, 8, 2
    D = (H // 2) ** 2
    model = BSC(D=D, H=H)
    Y = np.random.default_rng(1).normal(size=(N, D)).astype(np.float32)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=4, no_children=1,
                              no_generations=2, n_blocks=nb, seed=2)
    data_l = make_data(Y, n_blocks=nb)
    params = model.standard_init(data_l, seed=0)
    key = jax.random.key(7)

    p1, e1, s1, _ = model.em_step(params, estate, data_l, key, cfg)

    data_g = make_global_data(Y, n_blocks=nb, mesh=mesh)
    estate_g = distribute_estate(estate, mesh)
    params_g = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P())), params
    )
    p2, e2, s2, _ = model.em_step(params_g, estate_g, data_g, key, cfg)

    np.testing.assert_allclose(float(s1.F), float(s2.F), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(e1.ss), np.asarray(e2.ss))
    np.testing.assert_allclose(np.asarray(p1.W), np.asarray(p2.W),
                               rtol=1e-4, atol=1e-5)


def test_gather_global_roundtrip():
    mesh = make_mesh(8)
    a = np.arange(2 * 16, dtype=np.float32).reshape(2, 16)
    g = make_global_array(a, mesh)
    np.testing.assert_array_equal(gather_global(g), a)
    np.testing.assert_array_equal(gather_to_host(g), a)


def test_deinterleave_processes_restores_flat_order():
    """The global blocked array holds [p0 | p1 | ...] segments per block;
    de-interleaving must produce the concatenation of the processes' own
    flat (block-major) row orders (code-review regression: the plain
    flatten mapped reconstruction rows to the wrong patches)."""
    from evo_tpu.apps.training import deinterleave_processes

    P, nb, B_local, D = 3, 2, 4, 5
    # each process p's local flat rows are labeled p*1000 + i
    locals_ = [
        (np.arange(nb * B_local) + p * 1000).reshape(nb, B_local)
        for p in range(P)
    ]
    # global assembly: per block, concat the processes' block rows
    glob = np.concatenate([loc for loc in locals_], axis=1)  # [nb, P*B_local]
    glob = glob[..., None] * np.ones((1, 1, D))
    out = deinterleave_processes(glob, P)
    flat = out.reshape(-1, D)
    want = np.concatenate([loc.reshape(-1) for loc in locals_])
    np.testing.assert_array_equal(flat[:, 0], want)


def test_global_init_stats_single_process():
    """global_init_stats must reproduce the host-side moments standard_init
    computes, for complete and incomplete data (the multi-process branch of
    standard_init builds Theta^0 from these)."""
    from evo_tpu.parallel.distributed import global_init_stats

    rng = np.random.default_rng(3)
    Y = rng.normal(size=(32, 5)).astype(np.float32)
    data = make_data(Y, n_blocks=2)
    N, y_mean, ss_resid, m_sum = global_init_stats(data, y_host=Y, D=5)
    assert N == 32 and m_sum == 32 * 5
    np.testing.assert_allclose(y_mean, Y.mean(0), rtol=1e-6)
    np.testing.assert_allclose(
        ss_resid, ((Y - Y.mean(0)) ** 2).sum(), rtol=1e-6
    )
    # shards path == y_host path
    N2, y_mean2, ss2, m2 = global_init_stats(data, D=5)
    np.testing.assert_allclose(y_mean2, y_mean, rtol=1e-6)
    np.testing.assert_allclose(ss2, ss_resid, rtol=1e-6)

    Yn = Y.copy()
    Yn[2, 3] = np.nan
    datan = make_data(Yn, n_blocks=2)
    Nn, y_meann, ssn, mn = global_init_stats(datan, y_host=Yn, D=5)
    m = ~np.isnan(Yn)
    yz = np.where(m, Yn, 0.0)
    np.testing.assert_allclose(y_meann, yz.sum(0) / 32, rtol=1e-6)
    assert mn == m.sum()
    np.testing.assert_allclose(
        ssn, (((yz - yz.sum(0) / 32) * m) ** 2).sum(), rtol=1e-6
    )


def test_init_distributed_skips_when_client_already_up(monkeypatch):
    """init_distributed must consult jax.distributed.is_initialized() — NOT
    jax.process_count(), which initializes the XLA backend first, after
    which jax.distributed.initialize() always raises.  Behavior check: when
    the client reports initialized, initialize() must not be called even
    though activation arguments were passed."""
    calls = []
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    idx, cnt = init_distributed(
        coordinator_address="localhost:1", num_processes=2, process_id=0
    )
    assert calls == []  # skipped: client already up
    assert (idx, cnt) == (jax.process_index(), jax.process_count())


def test_init_distributed_forwards_explicit_args(monkeypatch):
    """When activation args are given and the client is down, initialize()
    receives exactly the explicit arguments."""
    calls = []
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    init_distributed(
        coordinator_address="localhost:1", num_processes=2, process_id=1
    )
    assert calls == [
        dict(coordinator_address="localhost:1", num_processes=2, process_id=1)
    ]
