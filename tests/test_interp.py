import numpy as np
import jax.numpy as jnp
import pytest

from voxelmorph_tpu.ops import interp as I
from np_reference import interpn_np


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("nd", [1, 2, 3])
@pytest.mark.parametrize("method", ["linear", "nearest"])
def test_interpn_matches_numpy(nd, method):
    spatial = [7, 6, 5][:nd]
    vol = RNG.normal(size=(*spatial, 2)).astype(np.float32)
    loc = RNG.uniform(-1.5, max(spatial) + 1.5, size=(4, 9, nd)).astype(np.float32)
    # avoid exact .5 rounding-mode mismatches for nearest
    if method == "nearest":
        loc = np.where(np.abs(loc - np.round(loc)) > 0.49, loc + 0.02, loc)
    got = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc), interp_method=method))
    want = interpn_np(vol, loc, method=method)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["linear", "nearest"])
def test_interpn_fill_value(method):
    vol = RNG.normal(size=(5, 5, 1)).astype(np.float32)
    loc = RNG.uniform(-3, 8, size=(50, 2)).astype(np.float32)
    if method == "nearest":
        loc = np.where(np.abs(loc - np.round(loc)) > 0.49, loc + 0.02, loc)
    got = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc),
                               interp_method=method, fill_value=-7.0))
    want = interpn_np(vol, loc, method=method, fill_value=-7.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_interpn_identity_grid():
    vol = RNG.normal(size=(8, 9, 10, 3)).astype(np.float32)
    grid = I.ndgrid((8, 9, 10))
    out = np.asarray(I.interpn(jnp.asarray(vol), grid))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_interpn_no_channel_axis():
    vol = RNG.normal(size=(6, 6)).astype(np.float32)
    loc = RNG.uniform(0, 5, size=(11, 2)).astype(np.float32)
    out = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc)))
    want = interpn_np(vol[..., None], loc)[..., 0]
    assert out.shape == (11,)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_resize_round_trip_shapes():
    vol = RNG.normal(size=(8, 10, 12, 2)).astype(np.float32)
    down = I.resize(jnp.asarray(vol), 0.5)
    assert down.shape == (4, 5, 6, 2)
    up = I.resize(down, 2.0)
    assert up.shape == (8, 10, 12, 2)


def test_resize_constant_preserved():
    vol = jnp.full((6, 6, 1), 3.25)
    out = I.resize(vol, 2.0)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_resize_linear_against_coords():
    # resize by 2 samples at arange(2n)/2 = 0, .5, 1, ...
    vol = jnp.asarray(RNG.normal(size=(5, 4, 1)).astype(np.float32))
    out = np.asarray(I.resize(vol, 2.0))
    axes = [np.arange(10) / 2.0, np.arange(8) / 2.0]
    mesh = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
    want = interpn_np(np.asarray(vol), mesh)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nd", [2, 3])
def test_linear_1ch_custom_vjp_matches_autodiff(nd):
    """The 1-channel linear path carries a hand-written dense-layout VJP;
    its gradients (w.r.t. volume AND locations, including edge-clamped
    samples) must match autodiff of the generic multi-channel path."""
    import jax

    spatial = [7, 6, 5][:nd]
    vol = RNG.normal(size=(*spatial, 1)).astype(np.float32)
    # locations spanning interior, clamped-low and clamped-high regions
    loc = RNG.uniform(-1.5, max(spatial) + 1.5, size=(40, nd)).astype(np.float32)

    def via_1ch(v, l):
        out = I.interpn(v, l, interp_method="linear")
        return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

    def via_generic(v, l):
        # duplicate the channel: routes through the nch>1 autodiff path
        out = I.interpn(jnp.concatenate([v, v], -1), l, interp_method="linear")
        half = jnp.arange(out.shape[0] * 1.0)[:, None]
        return jnp.sum(out[..., :1] * half.reshape(out[..., :1].shape))

    g1v, g1l = jax.grad(via_1ch, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(loc))
    g2v, g2l = jax.grad(via_generic, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(loc))
    np.testing.assert_allclose(np.asarray(g1v), np.asarray(g2v) / 1.0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1l), np.asarray(g2l), rtol=1e-4, atol=1e-4)


def test_linear_1ch_custom_vjp_under_vmap():
    import jax

    spatial = (6, 5, 4)
    vol = RNG.normal(size=(2, *spatial, 1)).astype(np.float32)
    loc = RNG.uniform(-1, 7, size=(2, 30, 3)).astype(np.float32)

    def loss(v, l):
        out = jax.vmap(lambda vi, li: I.interpn(vi, li))(v, l)
        return jnp.sum(out ** 2)

    gv, gl = jax.grad(loss, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(loc))

    def loss_ref(v, l):
        out = jax.vmap(lambda vi, li: I.interpn(
            jnp.concatenate([vi, vi], -1), li)[..., :1])(v, l)
        return jnp.sum(out ** 2)

    gv2, gl2 = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(loc))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl2), rtol=2e-4, atol=2e-4)


def test_wide_channel_per_corner_branch_matches_table(monkeypatch):
    """The per-corner accumulation branch (taken when the corner table would
    exceed the byte limit — e.g. full-res SynthMorph 30-channel one-hot
    warps) is numerically identical to the corner-table gather, including
    edge clamping and gradients."""
    import jax

    spatial, nch = (6, 7, 5), 4
    vol = RNG.normal(size=(*spatial, nch)).astype(np.float32)
    loc = RNG.uniform(-1.5, 8.5, size=(11, 13, 3)).astype(np.float32)

    want = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc)))
    monkeypatch.setattr(I, "_CORNER_TABLE_BYTES_LIMIT", 0)
    got = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gradients agree too (the synth one-hot warp is differentiated by Dice)
    def loss(v, l, w):
        return jnp.sum(I.interpn(v, l) * w)

    w = jnp.asarray(RNG.normal(size=(11, 13, nch)).astype(np.float32))
    gv_got, gl_got = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(vol), jnp.asarray(loc), w)
    monkeypatch.undo()
    gv_want, gl_want = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(vol), jnp.asarray(loc), w)
    np.testing.assert_allclose(np.asarray(gv_got), np.asarray(gv_want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl_got), np.asarray(gl_want),
                               rtol=1e-4, atol=1e-4)


def test_gather_bwd_wide_matches_narrow(monkeypatch):
    """The wide (corner-table) backward of the 1-channel linear gather is
    numerically identical to the narrow per-corner variant on both
    d/dvol (scatter path, live in vecint self-warps) and d/dloc."""
    import jax
    import os

    def grads(flag):
        monkeypatch.setenv("VXM_GATHER_BWD", flag)
        I._linear_gather_1ch.cache_clear()
        rng = np.random.default_rng(3)
        vol = jnp.asarray(rng.normal(size=(7, 6, 5, 1)).astype(np.float32))
        loc = jnp.asarray(
            rng.uniform(-1.5, 7.5, size=(11, 9, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(11, 9, 1)).astype(np.float32))

        def loss(v, l):
            return jnp.sum(I.interpn(v, l) * w)

        return jax.grad(loss, argnums=(0, 1))(vol, loc)

    gv_n, gl_n = grads("narrow")
    gv_w, gl_w = grads("wide")
    I._linear_gather_1ch.cache_clear()  # drop env-dependent builds
    np.testing.assert_allclose(np.asarray(gv_n), np.asarray(gv_w),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl_n), np.asarray(gl_w),
                               rtol=1e-5, atol=1e-5)


def test_interpn_label_onehot_matches_packed_warp():
    """The fused image+label interpolation must bit-match interpolating the
    materialized (1+L)-channel one-hot pack (the labels_to_image synthesis
    warp it replaces) — including edge clamping and out-of-range samples."""
    import jax

    rng = np.random.default_rng(11)
    S, L = (9, 11, 13), 6
    img = jnp.asarray(rng.standard_normal(S).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, L, S).astype(np.int32))
    one_hot = jax.nn.one_hot(lab, L, dtype=jnp.float32)
    packed = jnp.concatenate([img[..., None], one_hot], -1)

    # identity-shaped dense warp with out-of-range excursions
    shift = jnp.asarray((rng.standard_normal((*S, 3)) * 3.0).astype(np.float32))
    loc = I.ndgrid(S, dtype=shift.dtype) + shift
    ref = np.asarray(I.interpn(packed, loc))
    got_img, got_oh = I.interpn_label_onehot(img, lab, loc, L)
    np.testing.assert_array_equal(np.asarray(got_img), ref[..., 0])
    np.testing.assert_array_equal(np.asarray(got_oh), ref[..., 1:])

    # non-identity output shape (point-cloud style sampling)
    loc2 = jnp.asarray(rng.uniform(-1.5, 14.0, size=(4, 7, 3)).astype(np.float32))
    ref2 = np.asarray(I.interpn(packed, loc2))
    got_img2, got_oh2 = I.interpn_label_onehot(img, lab, loc2, L)
    np.testing.assert_array_equal(np.asarray(got_img2), ref2[..., 0])
    np.testing.assert_array_equal(np.asarray(got_oh2), ref2[..., 1:])

    # partition of unity where the cell is in-volume: channels sum to 1
    assert np.allclose(np.asarray(got_oh).sum(-1), 1.0, atol=1e-6)
