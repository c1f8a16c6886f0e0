"""Multi-device tests on the virtual 8-CPU mesh: DP and spatial sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import voxelmorph_tpu as vxm
from voxelmorph_tpu.models import VxmDense
from voxelmorph_tpu.parallel import mesh as mesh_lib
from voxelmorph_tpu.training import LossTerm, Trainer


RNG = np.random.default_rng(8)
SHAPE = (8, 8, 8)


def _loss_terms():
    return [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=1.0, target_index=0),
        LossTerm("reg", vxm.losses.Grad("l2").loss, weight=0.01,
                 target_index=1, name="grad"),
    ]


def _batch(n):
    src = RNG.normal(size=(n, *SHAPE, 1)).astype(np.float32)
    trg = RNG.normal(size=(n, *SHAPE, 1)).astype(np.float32)
    zeros = np.zeros((n, *SHAPE, 3), np.float32)
    return (src, trg), (trg, zeros)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_for_batch_shapes():
    m = mesh_lib.make_mesh_for_batch(8)
    assert m.shape["data"] == 8 and m.shape["space"] == 1
    m = mesh_lib.make_mesh_for_batch(1)
    assert m.shape["data"] == 1
    m = mesh_lib.make_mesh_for_batch(2, spatial_size=8)
    assert m.shape["data"] == 2 and m.shape["space"] == 4
    m = mesh_lib.make_mesh_for_batch(2, spatial_size=7)
    assert m.shape["data"] == 2 and m.shape["space"] == 1


def test_dp_train_step_8way():
    model = VxmDense(inshape=SHAPE, int_steps=1, nb_unet_features=[[4], [4, 4]])
    trainer = Trainer(model, _loss_terms(), lr=1e-3)
    inputs, targets = _batch(8)
    trainer.init(inputs)
    assert trainer.mesh.shape["data"] == 8
    m1 = trainer.train_step(inputs, targets)
    m2 = trainer.train_step(inputs, targets)
    assert np.isfinite(float(m2["loss"]))
    # params remain fully replicated after the update
    leaf = jax.tree_util.tree_leaves(trainer.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device():
    """8-way DP must produce the same update as single-device on same data."""
    model = VxmDense(inshape=SHAPE, int_steps=0, int_resolution=1,
                     nb_unet_features=[[4], [4, 4]])
    inputs, targets = _batch(8)

    t1 = Trainer(model, _loss_terms(), lr=1e-3,
                 mesh=mesh_lib.make_mesh_for_batch(8))
    t1.init(inputs)
    t2 = Trainer(model, _loss_terms(), lr=1e-3,
                 mesh=mesh_lib.make_mesh(shape=(1, 1), devices=[jax.devices()[0]]))
    t2.init(inputs)

    # same initial params
    p1 = jax.device_get(t1.params)
    p2 = jax.device_get(t2.params)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, atol=0)

    m1 = t1.train_step(inputs, targets)
    m2 = t2.train_step(inputs, targets)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(t1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(t2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_spatial_sharding_compiles_and_runs():
    model = VxmDense(inshape=SHAPE, int_steps=1, nb_unet_features=[[4], [4, 4]])
    trainer = Trainer(model, _loss_terms(), lr=1e-3, spatial_shard=True)
    inputs, targets = _batch(2)
    trainer.init(inputs)
    assert trainer.mesh.shape["space"] == 4
    metrics = trainer.train_step(inputs, targets)
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_for_batch_warns_when_devices_idle():
    import warnings
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        m = mesh_lib.make_mesh_for_batch(3)  # gcd(3, 8) = 1 -> 7 chips idle
    assert m.shape["data"] == 1
    assert any("using 1 of 8 devices" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mesh_lib.make_mesh_for_batch(8)  # perfect fit -> silent
    assert not caught


@pytest.mark.slow
def test_spatial_sharding_matches_single_device_64():
    """Spatial sharding at a realistic-ish 64-cube: the sharded forward pass
    (space=4 over the first spatial axis, GSPMD halo exchange inside convs
    and warp gathers) must match the single-device result."""
    shape = (64, 64, 64)
    model = VxmDense(inshape=shape, int_steps=2, nb_unet_features=[[4, 4], [4, 4]])
    src = jnp.asarray(RNG.normal(size=(2, *shape, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(2, *shape, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), src, trg)["params"]

    def fwd(p, a, b):
        out = model.apply({"params": p}, a, b, train=False)
        return out["y_source"], out["pos_flow"]

    single = jax.jit(fwd)(params, src, trg)

    mesh = mesh_lib.make_mesh(shape=(2, 4))
    src_s = mesh_lib.shard_batch(mesh, src, spatial=True)
    trg_s = mesh_lib.shard_batch(mesh, trg, spatial=True)
    params_r = mesh_lib.replicate(mesh, params)
    sharded = jax.jit(fwd)(params_r, src_s, trg_s)

    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(sharded[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(single[1]), np.asarray(sharded[1]),
                               rtol=1e-4, atol=1e-4)


def test_bfloat16_model_trains():
    """bf16 compute path: train steps run and losses stay finite/decreasing."""
    model = VxmDense(inshape=SHAPE, int_steps=1, nb_unet_features=[[4], [4, 4]],
                     dtype=jnp.bfloat16)
    trainer = Trainer(model, _loss_terms(), lr=1e-2)
    inputs, targets = _batch(1)
    trainer.init(inputs)
    first = float(trainer.train_step(inputs, targets)["loss"])
    for _ in range(4):
        last = float(trainer.train_step(inputs, targets)["loss"])
    assert np.isfinite(last) and last < first
    # params stay float32 (mixed-precision convention: bf16 compute only)
    leaf = jax.tree_util.tree_leaves(trainer.params)[0]
    assert leaf.dtype == jnp.float32


def test_inference_sharded_batch():
    """Batched inference with inputs sharded across all devices."""
    from voxelmorph_tpu.registration import build_register_fn

    model = VxmDense(inshape=SHAPE, int_steps=1, nb_unet_features=[[4], [4, 4]])
    src = jnp.zeros((8, *SHAPE, 1))
    trg = jnp.zeros((8, *SHAPE, 1))
    params = model.init(jax.random.PRNGKey(0), src, trg)["params"]

    mesh = mesh_lib.make_mesh_for_batch(8)
    src_s = mesh_lib.shard_batch(mesh, src)
    trg_s = mesh_lib.shard_batch(mesh, trg)
    params_r = mesh_lib.replicate(mesh, params)

    fn = build_register_fn(model)
    moved, warp = fn(params_r, src_s, trg_s)
    assert moved.shape == (8, *SHAPE, 1)
    assert warp.shape == (8, *SHAPE, 3)


def test_pallas_dispatch_guard(monkeypatch):
    """A 'space'-sharded Trainer must force bounded warps onto the XLA
    shifted-slice path: pallas_call has no GSPMD partitioning rule."""
    from voxelmorph_tpu.ops import warp as warp_ops
    from voxelmorph_tpu.ops import pallas_interp

    # make the pallas path 'available' but explosive if actually taken
    monkeypatch.setattr(pallas_interp, "pallas_available", lambda: True)
    monkeypatch.setattr(pallas_interp, "kernel_vmem_fits",
                        lambda *a, **k: True)

    def boom(*a, **k):
        raise AssertionError("pallas kernel dispatched under space sharding")
    monkeypatch.setattr(pallas_interp, "warp_bounded", boom)

    vol = jnp.asarray(RNG.normal(size=(8, 8, 8, 1)).astype(np.float32))
    shift = jnp.asarray(0.4 * RNG.normal(size=(8, 8, 8, 3)).astype(np.float32))

    try:
        # a trainer on a space>1 mesh flips the guard at mesh-resolution time
        model = VxmDense(inshape=(8, 8, 8), int_steps=1,
                         nb_unet_features=[[2], [2, 2]])
        trainer = Trainer(model, _loss_terms(), lr=1e-3,
                          mesh=mesh_lib.make_mesh(shape=(2, 4)))
        trainer.init((np.zeros((2, 8, 8, 8, 1), np.float32),
                      np.zeros((2, 8, 8, 8, 1), np.float32)))
        assert not warp_ops._PALLAS_DISPATCH_OK

        # the dispatch now takes the XLA route and matches the reference path
        out = warp_ops._windowed_impl(vol, shift, halo=1)
        ref = warp_ops.windowed_transform(vol, shift, halo=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

        # with the guard lifted, the same call would hit the kernel
        warp_ops.set_pallas_dispatch(True)
        with pytest.raises(AssertionError, match="pallas kernel dispatched"):
            warp_ops._windowed_impl(vol, shift, halo=1)
    finally:
        warp_ops.set_pallas_dispatch(True)


@pytest.mark.slow
def test_spatial_sharding_windowed_halo_realistic(monkeypatch):
    """space=4 sharding at 80x96x112 with the windowed/bounded-warp dispatch
    FORCED (VXM_WINDOW_HALO=1 -> lax.cond + shifted slices): loss and grads
    of a full fwd+bwd must match the unsharded run. This is the exact
    interaction (space-sharded field x windowed dispatch) a real multi-chip
    mesh exercises."""
    from voxelmorph_tpu.ops import warp as warp_ops
    monkeypatch.setattr(warp_ops, "_env_halo", "1")

    shape = (80, 96, 112)
    model = VxmDense(inshape=shape, int_steps=2, int_resolution=2,
                     nb_unet_features=[[2, 2], [2, 2]])
    src = jnp.asarray(RNG.normal(size=(2, *shape, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(2, *shape, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), src, trg)["params"]

    def loss_fn(p, a, b):
        out = model.apply({"params": p}, a, b, train=False)
        return jnp.mean((out["y_source"] - b) ** 2) + jnp.mean(
            out["pos_flow"] ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    loss1, grads1 = step(params, src, trg)

    mesh = mesh_lib.make_mesh(shape=(2, 4))
    loss2, grads2 = step(
        mesh_lib.replicate(mesh, params),
        mesh_lib.shard_batch(mesh, src, spatial=True),
        mesh_lib.shard_batch(mesh, trg, spatial=True))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    flat1 = jax.tree_util.tree_leaves(grads1)
    flat2 = jax.tree_util.tree_leaves(grads2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
