"""Multi-device data parallelism tests on the 8-virtual-CPU mesh.

World-size invariance is the reference's guarantee too (rank-0 bcasts make
results world-size-invariant by construction; SURVEY §4.6): the same em_step
on sharded vs unsharded inputs must produce identical results.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evo_tpu import BSC, init_states
from evo_tpu.models import make_data
from evo_tpu.parallel import make_mesh, replicate, shard_blocked


def _setup(N=64, H=6, S=8, n_blocks=2):
    D = (H // 2) ** 2
    model = BSC(D=D, H=H)
    Y = np.random.default_rng(0).normal(size=(N, D))
    data = make_data(Y, n_blocks=n_blocks)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=4, no_children=1,
                              no_generations=2, n_blocks=n_blocks)
    params = model.standard_init(data, seed=0)
    return model, cfg, params, estate, data


def test_sharded_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    model, cfg, params, estate, data = _setup()
    key = jax.random.key(5)

    p1, e1, s1, _ = model.em_step(params, estate, data, key, cfg)

    mesh = make_mesh(8)
    data_s = shard_blocked(data, mesh)
    estate_s = shard_blocked(estate, mesh)
    params_s = replicate(params, mesh)
    p2, e2, s2, _ = model.em_step(params_s, estate_s, data_s, key, cfg)

    np.testing.assert_allclose(float(s1.F), float(s2.F), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.W), np.asarray(p2.W), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(e1.ss), np.asarray(e2.ss))


def test_partitioning_divides_per_device_flops():
    """Compiler-level weak-scaling evidence: under GSPMD the compiled
    em_step's PER-DEVICE flop count must drop ~1/n_devices on an n-device
    data mesh (each device computes only its batch shard; small replicated
    work — the W solve, parameter updates — keeps the ratio below n), and
    the partitioned module must contain the cross-device reduction
    collectives that replace the reference's Allreduce (SURVEY §2.3).
    Complements the value-equality tests above: those prove the sharded
    step is CORRECT, this proves the compiler actually PARTITIONED the
    work instead of replicating it."""
    model, cfg, params, estate, data = _setup(N=128, n_blocks=2)
    key = jax.random.key(5)

    def step(params, estate, data, key):
        return model.em_step(params, estate, data, key, cfg)

    flops1 = jax.jit(step).lower(
        params, estate, data, key).compile().cost_analysis()["flops"]

    mesh = make_mesh(8)
    data_s = shard_blocked(data, mesh)
    estate_s = shard_blocked(estate, mesh)
    params_s = replicate(params, mesh)
    compiled8 = jax.jit(step).lower(params_s, estate_s, data_s, key).compile()
    flops8 = compiled8.cost_analysis()["flops"]

    assert flops8 < flops1 / 5.5, (
        f"per-device flops barely dropped under an 8-device mesh: "
        f"{flops1:.0f} -> {flops8:.0f} (ratio {flops1 / flops8:.2f}); "
        "the batch dim is not being partitioned"
    )
    hlo = compiled8.as_text()
    assert "all-reduce" in hlo, "no cross-device reduction in the module"


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[2]))


@pytest.mark.slow
def test_packed_states_equivalence():
    """EAConfig.packed_states must not change any result (8x memory mode)."""
    import dataclasses

    from evo_tpu.variational.state_init import init_states
    from evo_tpu.models import make_data
    from evo_tpu.models.bsc import BSC

    N, H, D, S = 64, 10, 9, 12
    model = BSC(D=D, H=H)
    Y = np.random.default_rng(3).normal(size=(N, D))
    data = make_data(Y, n_blocks=2)
    cfg1, est1 = init_states(N=N, S=S, H=H, no_parents=5, no_generations=2,
                             n_blocks=2, seed=1, packed_states=False)
    cfg2, est2 = init_states(N=N, S=S, H=H, no_parents=5, no_generations=2,
                             n_blocks=2, seed=1, packed_states=True)
    assert est2.ss.dtype == jnp.uint8
    assert est2.ss.shape[-1] == -(-H // 8)
    params = model.standard_init(data, seed=0)
    key = jax.random.key(9)
    p1, e1, s1, _ = model.em_step(params, est1, data, key, cfg1)
    p2, e2, s2, _ = model.em_step(params, est2, data, key, cfg2)
    np.testing.assert_allclose(float(s1.F), float(s2.F), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(e1.lpj), np.asarray(e2.lpj))
    from evo_tpu.ops.bitpack import unpack_bits_lane

    np.testing.assert_array_equal(np.asarray(e1.ss).astype(bool),
                                  np.asarray(unpack_bits_lane(e2.ss, H)))
    np.testing.assert_allclose(np.asarray(p1.W), np.asarray(p2.W), rtol=1e-6)


def test_packed_states_checkpoint_roundtrip(tmp_path):
    from evo_tpu.variational.state_init import init_states
    from evo_tpu.models import make_data
    from evo_tpu.models.bsc import BSC
    from evo_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

    N, H, D, S = 32, 9, 9, 8
    model = BSC(D=D, H=H)
    Y = np.random.default_rng(0).normal(size=(N, D))
    data = make_data(Y)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=4, packed_states=True)
    params = model.standard_init(data, seed=0)
    params, estate, _, _ = model.em_step(params, estate, data, jax.random.key(0), cfg)
    path = str(tmp_path / "c.npz")
    save_checkpoint(path, params, estate, 3, jax.random.key(1))
    p2, e2, epoch, k2 = load_checkpoint(path, params_like=params)
    assert e2.ss.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(estate.ss), np.asarray(e2.ss))


def _shard_all(mesh, *trees):
    out = []
    for t in trees:
        out.append(shard_blocked(t, mesh))
    return out


@pytest.mark.slow
def test_sssc_sharded_matches_unsharded():
    """SSSC full fused EM step under the 8-device mesh (VERDICT r1 weak #5)."""
    from evo_tpu.models.sssc import SSSC

    N, H, D, S, nb = 64, 6, 5, 8, 2
    model = SSSC(D=D, H=H)
    rng = np.random.default_rng(2)
    Y = ((rng.random((N, H)) < 0.3).astype(np.float32)
         @ rng.normal(size=(D, H)).astype(np.float32).T
         + rng.normal(size=(N, D)).astype(np.float32))
    data = make_data(Y, n_blocks=nb)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=4, no_children=1,
                              no_generations=1, n_blocks=nb, seed=3)
    params = model.standard_init(data, seed=0)
    key = jax.random.key(11)

    p1, e1, s1, _ = model.em_step(params, estate, data, key, cfg)

    mesh = make_mesh(8)
    data_s, estate_s = _shard_all(mesh, data, estate)
    params_s = replicate(params, mesh)
    p2, e2, s2, _ = model.em_step(params_s, estate_s, data_s, key, cfg)

    np.testing.assert_allclose(float(s1.F), float(s2.F), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(e1.ss), np.asarray(e2.ss))
    np.testing.assert_allclose(np.asarray(p1.W), np.asarray(p2.W),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.Psi), np.asarray(p2.Psi),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_incomplete_reconstruction_sharded_matches_unsharded():
    """Incomplete data (per-datapoint Gram [B,H,H] under P(None,'data')) with
    do_reconstruction=True — the y_rec scan-output path — must be
    world-size-invariant for both models (VERDICT r1 weak #5)."""
    from evo_tpu.models.sssc import SSSC

    N, H, D, S, nb = 64, 6, 9, 8, 2
    rng = np.random.default_rng(4)
    Y = rng.normal(size=(N, D)).astype(np.float32)
    Y[rng.random(Y.shape) < 0.15] = np.nan  # MCAR missing (inpainting setup)
    data = make_data(Y, n_blocks=nb)
    assert data.incomplete
    mesh = make_mesh(8)

    for model in (BSC(D=D, H=H), SSSC(D=D, H=H)):
        cfg, estate = init_states(N=N, S=S, H=H, no_parents=4, no_children=1,
                                  no_generations=1, n_blocks=nb, seed=5)
        params = model.standard_init(data, seed=0)
        key = jax.random.key(13)
        p1, e1, s1, yrec1 = model.em_step(params, estate, data, key, cfg,
                                          do_reconstruction=True)
        data_s, estate_s = _shard_all(mesh, data, estate)
        params_s = replicate(params, mesh)
        p2, e2, s2, yrec2 = model.em_step(params_s, estate_s, data_s, key, cfg,
                                          do_reconstruction=True)
        np.testing.assert_allclose(float(s1.F), float(s2.F), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(e1.ss), np.asarray(e2.ss))
        np.testing.assert_allclose(np.asarray(yrec1), np.asarray(yrec2),
                                   rtol=1e-4, atol=1e-5)


def test_multi_epoch_sharded_training():
    """A short multi-epoch sharded training run stays equal to the unsharded
    trajectory end-to-end (not just one step)."""
    model, cfg, params, estate, data = _setup(N=64, H=6, S=8, n_blocks=2)
    mesh = make_mesh(8)
    data_s, estate_s = _shard_all(mesh, data, estate)
    params_s = replicate(params, mesh)
    for e in range(4):
        key = jax.random.fold_in(jax.random.key(17), e)
        params, estate, s1, _ = model.em_step(params, estate, data, key, cfg)
        params_s, estate_s, s2, _ = model.em_step(
            params_s, estate_s, data_s, key, cfg
        )
        np.testing.assert_allclose(float(s1.F), float(s2.F), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params.W), np.asarray(params_s.W),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(estate.ss), np.asarray(estate_s.ss))


def test_checkpoint_converts_byte_major_packed(tmp_path):
    """Packed checkpoints written before the lane-major format switch are
    byte-major (np.packbits); loading must convert, not bit-scramble
    (code-review regression)."""
    import numpy as np

    from evo_tpu.utils.checkpoint import load_checkpoint
    from evo_tpu.models.bsc import BSCParams
    from evo_tpu.ops.bitpack import unpack_bits_lane

    H, S, N = 9, 4, 8
    rng = np.random.default_rng(0)
    ss_bool = rng.random((1, N, S, H)) < 0.4
    packed_byte = np.packbits(ss_bool, axis=-1, bitorder="little")
    params = BSCParams(W=jnp.zeros((3, H)), pi=jnp.asarray(0.1),
                       sigma=jnp.asarray(1.0), pies=jnp.full((H,), 0.1))
    blobs = {
        "params" + "/" + k: np.asarray(v)
        for k, v in [("W", params.W), ("pi", params.pi),
                     ("sigma", params.sigma), ("pies", params.pies)]
    }
    blobs["estate_ss_packed"] = packed_byte
    blobs["estate_ss_H"] = np.asarray(-1)  # old sentinel, NO packed_format
    blobs["estate_lpj"] = np.zeros((1, N, S), np.float32)
    blobs["epoch"] = np.asarray(2)
    blobs["rng_key"] = np.asarray(jax.random.key_data(jax.random.key(0)))
    path = str(tmp_path / "old.npz")
    np.savez_compressed(path, **blobs)

    _, estate, epoch, _ = load_checkpoint(path, params_like=params)
    assert estate.ss.dtype == jnp.uint8
    got = np.asarray(unpack_bits_lane(estate.ss, H))
    np.testing.assert_array_equal(got, ss_bool)


@pytest.mark.slow
def test_em_steps_sharded_matches_unsharded():
    """The multi-epoch scan driver (models.base.em_steps) composes with
    GSPMD exactly like em_step: the same window on sharded vs unsharded
    inputs must produce identical trajectories and final state."""
    from evo_tpu.models.base import em_steps

    model, cfg, params, estate, data = _setup()
    key = jax.random.key(13)

    p1, e1, st1 = em_steps(model, params, estate, data, key, cfg, 4)

    mesh = make_mesh(8)
    data_s = shard_blocked(data, mesh)
    estate_s = shard_blocked(estate, mesh)
    params_s = replicate(params, mesh)
    p2, e2, st2 = em_steps(model, params_s, estate_s, data_s, key, cfg, 4)

    np.testing.assert_allclose(np.asarray(st1.F), np.asarray(st2.F),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.W), np.asarray(p2.W),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(e1.ss), np.asarray(e2.ss))
    # the carried estate stays sharded over the data axis across epochs
    spec = e2.lpj.sharding.spec
    assert "data" in tuple(spec), spec
