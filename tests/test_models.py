import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelmorph_tpu.models import VxmDense, InstanceDense, Transform, Unet
from voxelmorph_tpu.models import save_model, load_model


RNG = np.random.default_rng(5)
SHAPE2D = (16, 16)
SHAPE3D = (16, 16, 16)


def make_vxm(**kw):
    defaults = dict(inshape=SHAPE2D, int_steps=3, int_resolution=2)
    defaults.update(kw)
    return VxmDense(**defaults)


def init_and_apply(model, *inputs, rngs=None, **kw):
    rngs = rngs or {}
    params = model.init({"params": jax.random.PRNGKey(0), **rngs}, *inputs, **kw)["params"]
    out = model.apply({"params": params}, *inputs, rngs=rngs, **kw)
    return params, out


def test_unet_default_output_channels():
    model = Unet(ndims=2)
    x = jnp.zeros((1, 16, 16, 2))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 16)  # final decoder feature = 16


@pytest.mark.parametrize("shape,window", [((2, 8, 8, 8, 3), 2),
                                          ((1, 7, 6, 5, 2), 2),
                                          ((2, 9, 9, 4), 3)])
def test_max_pool_custom_vjp_matches_autodiff(shape, window):
    """The mask-backward max pool (no select-and-scatter lowering) must match
    nn.max_pool and its autodiff gradient on tie-free inputs, including
    non-divisible (VALID-truncated) spatial dims."""
    import flax.linen as nn
    from voxelmorph_tpu.models.unet import _max_pool

    nd = len(shape) - 2
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape).astype(np.float32))
    w = (window,) * nd
    f_ref = lambda x: jnp.sum(jnp.sin(nn.max_pool(x, window_shape=w, strides=w)) * 1.7)
    f_new = lambda x: jnp.sum(jnp.sin(_max_pool(x, window, nd)) * 1.7)
    np.testing.assert_allclose(f_ref(x), f_new(x), rtol=1e-6)
    np.testing.assert_allclose(jax.grad(f_ref)(x), jax.grad(f_new)(x),
                               rtol=1e-5, atol=1e-6)


def test_max_pool_vjp_splits_gradient_across_ties():
    """Tied maxima (constant windows — uniform image backgrounds, frequent
    under bfloat16) must SPLIT the window's gradient 1/count each, not
    duplicate it: sum of routed gradient per window == incoming gradient
    (the conservation property select-and-scatter also satisfies)."""
    from voxelmorph_tpu.models.unet import _max_pool

    # fully constant input: every element of every 2x2x2 window ties
    x = jnp.ones((1, 4, 4, 4, 2), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(_max_pool(x, 2, 3)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0 / 8.0, rtol=1e-6)
    # mixed case: one window with a strict max, one fully tied; per-window
    # gradient mass must be exactly 1 in both
    x2 = np.zeros((1, 4, 2), np.float32)
    x2[0, 1, 0] = 5.0  # strict max in first window of channel 0
    g2 = np.asarray(jax.grad(lambda x: jnp.sum(_max_pool(x, 2, 1)))(
        jnp.asarray(x2)))
    np.testing.assert_allclose(g2[0, :2, 0], [0.0, 1.0])
    np.testing.assert_allclose(g2[0, 2:, 0], [0.5, 0.5])


def test_unet_upsample_skips_halves_resolution():
    model = Unet(ndims=2, nb_upsample_skips=1)
    x = jnp.zeros((1, 16, 16, 2))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape[1:3] == (8, 8)


def test_vxm_dense_forward_shapes():
    model = make_vxm()
    src = jnp.asarray(RNG.normal(size=(2, *SHAPE2D, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(2, *SHAPE2D, 1)).astype(np.float32))
    params, out = init_and_apply(model, src, trg)
    assert out["y_source"].shape == (2, *SHAPE2D, 1)
    assert out["pos_flow"].shape == (2, *SHAPE2D, 2)
    assert out["preint_flow"].shape == (2, 8, 8, 2)
    assert out["reg"].shape == (2, 8, 8, 2)  # preintegrated default


def test_vxm_dense_initial_flow_is_tiny():
    model = make_vxm()
    src = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    _, out = init_and_apply(model, src, trg)
    # flow conv init N(0, 1e-5): warp ~ 0 and y_source ~ source
    assert float(jnp.abs(out["pos_flow"]).max()) < 1e-2
    np.testing.assert_allclose(np.asarray(out["y_source"]), np.asarray(src), atol=1e-2)


def test_vxm_dense_bf16_inference_matches_f32_warp():
    """Inference warps the image in the model dtype (bf16 corner table on
    TPU); the result must stay f32-typed and numerically close to the f32
    path — the seg transport that drives Dice is a separate nearest gather."""
    src = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    m32 = make_vxm(dtype=jnp.float32)
    params = m32.init(jax.random.PRNGKey(0), src, trg)["params"]
    out32 = m32.apply({"params": params}, src, trg, train=False)
    m16 = make_vxm(dtype=jnp.bfloat16)
    out16 = m16.apply({"params": params}, src, trg, train=False)
    assert out16["y_source"].dtype == jnp.float32
    # bf16 has ~3 decimal digits; the unet itself also runs bf16 here
    np.testing.assert_allclose(np.asarray(out16["y_source"]),
                               np.asarray(out32["y_source"]), atol=3e-2)


def test_vxm_dense_bidir():
    model = make_vxm(bidir=True)
    src = jnp.zeros((1, *SHAPE2D, 1))
    trg = jnp.zeros((1, *SHAPE2D, 1))
    _, out = init_and_apply(model, src, trg)
    assert "y_target" in out and "neg_flow" in out


def test_vxm_dense_probabilistic():
    model = make_vxm(use_probs=True)
    src = jnp.zeros((1, *SHAPE2D, 1))
    trg = jnp.zeros((1, *SHAPE2D, 1))
    rngs = {"sample": jax.random.PRNGKey(1)}
    params, out = init_and_apply(model, src, trg, rngs=rngs)
    # flow_params live at the svf (unet output) resolution — full res here
    assert out["flow_params"].shape == (1, *SHAPE2D, 4)
    assert out["reg"].shape == (1, *SHAPE2D, 4)
    # logsigma bias init -10: sampled flow noise std ~ exp(-5) — tiny
    assert float(jnp.abs(out["pos_flow"]).max()) < 1e-1


def test_vxm_dense_cvpr_mode_int_steps_0():
    model = make_vxm(int_steps=0, int_resolution=1)
    src = jnp.zeros((1, *SHAPE2D, 1))
    trg = jnp.zeros((1, *SHAPE2D, 1))
    _, out = init_and_apply(model, src, trg)
    assert out["preint_flow"].shape == (1, *SHAPE2D, 2)
    assert out["pos_flow"].shape == (1, *SHAPE2D, 2)


def test_vxm_dense_svf_resolution():
    model = make_vxm(svf_resolution=2, int_steps=3, int_resolution=2)
    src = jnp.zeros((1, *SHAPE2D, 1))
    trg = jnp.zeros((1, *SHAPE2D, 1))
    _, out = init_and_apply(model, src, trg)
    assert out["svf"].shape == (1, 8, 8, 2)
    assert out["pos_flow"].shape == (1, *SHAPE2D, 2)


def test_vxm_dense_reg_field_options():
    for reg_field, shape in [("svf", SHAPE2D), ("preintegrated", (8, 8)),
                             ("postintegrated", (8, 8)), ("warp", SHAPE2D)]:
        model = make_vxm(reg_field=reg_field, svf_resolution=1)
        src = jnp.zeros((1, *SHAPE2D, 1))
        trg = jnp.zeros((1, *SHAPE2D, 1))
        _, out = init_and_apply(model, src, trg)
        assert out["reg"].shape == (1, *shape, 2), reg_field


def test_vxm_3d_smoke():
    model = VxmDense(inshape=SHAPE3D, int_steps=2)
    src = jnp.zeros((1, *SHAPE3D, 1))
    trg = jnp.zeros((1, *SHAPE3D, 1))
    _, out = init_and_apply(model, src, trg)
    assert out["y_source"].shape == (1, *SHAPE3D, 1)
    assert out["pos_flow"].shape == (1, *SHAPE3D, 3)


def test_instance_dense():
    model = InstanceDense(inshape=SHAPE2D, int_steps=2)
    src = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    params, out = init_and_apply(model, src)
    assert out["y_source"].shape == (1, *SHAPE2D, 1)
    assert params["flow"].shape == (1, 8, 8, 2)


def test_transform_model():
    img = jnp.asarray(RNG.normal(size=(1, 8, 8, 1)).astype(np.float32))
    trf = jnp.zeros((1, 8, 8, 2))
    model = Transform()
    out = model.apply({"params": {}}, img, trf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_hyper_vxm_dense():
    model = make_vxm(hyper=True)
    src = jnp.zeros((1, *SHAPE2D, 1))
    trg = jnp.zeros((1, *SHAPE2D, 1))
    hyp = jnp.asarray([[0.5]])
    # add a hypernetwork embedding input
    params = model.init(jax.random.PRNGKey(0), src, trg, hyp=hyp)["params"]
    out = model.apply({"params": params}, src, trg, hyp=hyp)
    assert out["y_source"].shape == (1, *SHAPE2D, 1)
    # different hyp -> different unet output (kernels are hyp-generated)
    src2 = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    out1 = model.apply({"params": params}, src2, trg, hyp=jnp.asarray([[0.1]]))
    out2 = model.apply({"params": params}, src2, trg, hyp=jnp.asarray([[5.0]]))
    assert not np.allclose(np.asarray(out1["pos_flow"]), np.asarray(out2["pos_flow"]))


def test_save_load_round_trip(tmp_path):
    model = make_vxm()
    src = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(1, *SHAPE2D, 1)).astype(np.float32))
    params, out = init_and_apply(model, src, trg)

    path = str(tmp_path / "model.npz")
    save_model(path, model, params)
    model2, params2 = load_model(path)
    out2 = model2.apply({"params": params2}, src, trg)
    np.testing.assert_allclose(np.asarray(out["y_source"]),
                               np.asarray(out2["y_source"]), atol=1e-6)


def test_vxm_overfits_toy_pair():
    """End-to-end: a few Adam steps reduce MSE on a fixed pair."""
    import optax
    from voxelmorph_tpu import losses as L

    model = make_vxm(int_steps=0, int_resolution=1, nb_unet_features=[[8, 8], [8, 8]])
    # smooth toy images
    xx, yy = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
    src = np.exp(-((xx - 7) ** 2 + (yy - 7) ** 2) / 8.0)[None, ..., None].astype(np.float32)
    trg = np.exp(-((xx - 9) ** 2 + (yy - 8) ** 2) / 8.0)[None, ..., None].astype(np.float32)
    src, trg = jnp.asarray(src), jnp.asarray(trg)

    params = model.init(jax.random.PRNGKey(0), src, trg)["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    mse = L.MSE()
    grad_loss = L.Grad("l2")

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, src, trg)
            return mse.loss(trg, out["y_source"]) + \
                0.01 * jnp.mean(grad_loss.loss(None, out["reg"]))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_vxm_dense_fast_warp_model_path(monkeypatch):
    """The phase-warp inference path traces end-to-end at model level and
    stays close to the exact path (both are first-order warp compositions).

    CPU has no Pallas backend, so the model's eligibility gate is forced on
    and the bounded warps take the XLA windowed fallback — exercising the
    exact wiring (root capture, rescale, dtype flow, lax.cond) the TPU
    dispatch uses."""
    from voxelmorph_tpu.ops import pallas_interp, warp as warp_ops
    from voxelmorph_tpu.registration import enable_fast_warp

    shape = (32, 32, 16)
    g = np.stack(np.meshgrid(*[np.linspace(0, np.pi, s) for s in shape],
                             indexing="ij"), -1)
    img = np.sin(g[..., 0]) * np.cos(g[..., 1]) * np.sin(g[..., 2] + 0.3)
    src = jnp.asarray(img.astype(np.float32))[None, ..., None]
    trg = jnp.roll(src, 2, axis=1)

    model = VxmDense(inshape=shape, int_steps=5, int_resolution=2)
    params = model.init(jax.random.PRNGKey(0), src, trg)["params"]
    exact = model.apply({"params": params}, src, trg, train=False)

    fast_model = enable_fast_warp(model, phases=2, halo=2)
    assert fast_model.fast_warp_phases == 2
    monkeypatch.setattr(pallas_interp, "pallas_available", lambda: True)
    monkeypatch.setattr(pallas_interp, "kernel_vmem_fits",
                        lambda *a, **k: True)
    # keep the actual warps on the XLA windowed path (no TPU here)
    monkeypatch.setattr(warp_ops, "_PALLAS_DISPATCH_OK", False)
    fast = fast_model.apply({"params": params}, src, trg, train=False)

    # field outputs are bit-identical (only y_source takes the phase path)
    np.testing.assert_array_equal(np.asarray(fast["pos_flow"]),
                                  np.asarray(exact["pos_flow"]))
    # random-init flows are tiny: the phase warp agrees to interpolation err
    np.testing.assert_allclose(np.asarray(fast["y_source"]),
                               np.asarray(exact["y_source"]), atol=5e-3)
