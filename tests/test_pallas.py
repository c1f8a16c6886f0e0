"""Pallas bounded-displacement warp kernel: correctness vs the XLA paths.

Runs the kernel through the Pallas interpreter on the CPU test host
(VXM_PALLAS_INTERPRET=1 is set before the module imports); on TPU the same
code compiles to a Mosaic kernel, A/B-benchmarked by bench.py.
"""

import os

os.environ["VXM_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from voxelmorph_tpu.ops import pallas_interp
from voxelmorph_tpu.ops import warp as W


RNG = np.random.default_rng(23)


def _case(shape=(10, 12, 14), nch=2, scale=0.9):
    vol = jnp.asarray(RNG.normal(size=(*shape, nch)).astype(np.float32))
    shift = jnp.asarray(
        RNG.uniform(-scale, scale, size=(*shape, 3)).astype(np.float32))
    return vol, shift


def test_pallas_warp_matches_gather():
    vol, shift = _case()
    ours = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=1))
    ref = np.asarray(W.transform(vol, shift, window_halo=None))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pallas_warp_halo2():
    vol, shift = _case(scale=1.9)
    ours = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=2))
    ref = np.asarray(W.transform(vol, shift, window_halo=None))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pallas_warp_edge_clamp():
    """Shifts pushing samples past the border must clamp like the gather."""
    vol, _ = _case(nch=1)
    shift = jnp.full((*vol.shape[:-1], 3), 0.97, jnp.float32)
    ours = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=1))
    ref = np.asarray(W.transform(vol, shift, window_halo=None))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pallas_warp_multi_slab():
    """A depth that doesn't divide the slab size exercises the masked tail."""
    vol, shift = _case(shape=(9, 8, 8), nch=1)
    ours = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=1))
    ref = np.asarray(W.transform(vol, shift, window_halo=None))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pallas_warp_gradients_match():
    vol, shift = _case(shape=(6, 7, 8), nch=1)

    loss_p = lambda v, s: jnp.sum(pallas_interp.warp_bounded(v, s, 1) ** 2)
    loss_g = lambda v, s: jnp.sum(W.transform(v, s, window_halo=None) ** 2)
    gv_p, gs_p = jax.grad(loss_p, argnums=(0, 1))(vol, shift)
    gv_g, gs_g = jax.grad(loss_g, argnums=(0, 1))(vol, shift)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_g),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_g),
                               rtol=1e-3, atol=1e-3)


def test_pallas_bwd_kernel_matches_reference():
    """The Pallas backward kernel must match the jnp reference VJP for both
    halos, including clamped border voxels (zero shift gradient there)."""
    for halo, scale in ((1, 0.95), (2, 1.9)):
        vol, shift = _case(shape=(7, 9, 10), nch=2, scale=scale)
        vol_cf = jnp.moveaxis(vol, -1, 0)
        g = jnp.asarray(RNG.normal(size=vol_cf.shape).astype(np.float32))
        dvol, dshift = pallas_interp._bwd_impl_pallas(vol_cf, shift, g, halo)
        dvol_r, dshift_r = pallas_interp._warp_cf_bwd_ref(halo, (vol_cf, shift), g)
        np.testing.assert_allclose(np.asarray(dvol), np.asarray(dvol_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dshift), np.asarray(dshift_r),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_warp_vmap():
    vols = jnp.asarray(RNG.normal(size=(2, 6, 6, 6, 1)).astype(np.float32))
    shifts = jnp.asarray(
        RNG.uniform(-0.8, 0.8, size=(2, 6, 6, 6, 3)).astype(np.float32))
    ours = np.asarray(jax.vmap(
        lambda v, s: pallas_interp.warp_bounded(v, s, 1))(vols, shifts))
    ref = np.asarray(jax.vmap(
        lambda v, s: W.transform(v, s, window_halo=None))(vols, shifts))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_kernel_vmem_eligibility():
    """The dispatcher must exclude shapes whose kernel would blow the 16 MB
    scoped-VMEM limit (measured: 45-channel one-hot maps at SynthMorph's
    half-res) while keeping the configurations the bench measured wins on."""
    from voxelmorph_tpu.ops.pallas_interp import kernel_vmem_fits

    assert not kernel_vmem_fits((80, 96, 112), 45, 1)  # crashed in the wild
    assert kernel_vmem_fits((80, 96, 112), 1, 1)
    assert kernel_vmem_fits((80, 96, 112), 3, 1)       # bench A/B config
    assert kernel_vmem_fits((80, 96, 112), 3, 2)       # vecint halo-2 config
    # full-res single-channel slabs: the v4 forward fits (measured on-chip,
    # pallas A/B full_h1/full_h2 configs) — the default fwd-mode gate admits
    # them and the VJP quietly takes its XLA fallback; the all-Pallas 'both'
    # gate still routes them to the XLA paths (the bwd window blows VMEM)
    assert kernel_vmem_fits((160, 192, 224), 1, 1)
    assert kernel_vmem_fits((160, 192, 224), 1, 2)     # phase-warp config
    assert not kernel_vmem_fits((160, 192, 224), 1, 1, mode="both")
    assert not kernel_vmem_fits((8, 8), 1, 1)          # 3-D only


def test_pallas_warp_bf16_window_close_to_f32():
    """VXM_PALLAS_BF16_WIN stores the windowed volume bf16 (halving the
    kernel's dominant HBM term); taps widen back to f32 in-kernel, so the
    result differs from the f32 path only by the taps' 8-bit mantissa —
    weights and shift math are untouched."""
    vol, shift = _case(shape=(8, 10, 12), nch=2, scale=0.9)
    ref = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=1))
    os.environ["VXM_PALLAS_BF16_WIN"] = "1"
    try:
        got = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=1))
    finally:
        del os.environ["VXM_PALLAS_BF16_WIN"]
    # bf16 has ~3 decimal digits; the trilinear sum averages 8 taps
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    assert np.abs(got - ref).max() > 0.0  # the flag actually changed the path


def test_pallas_warp_bf16_shift_close_to_f32():
    """VXM_PALLAS_BF16_SHIFT stores the displacement components bf16
    (~75% of kernel input bytes in the 1-channel full-res phase warp);
    coordinate error is bounded by bf16 rounding of |shift|<=h, <0.01
    voxel at h<=2, and weight math runs f32 on the widened values."""
    vol, shift = _case(shape=(8, 10, 12), nch=2, scale=1.9)
    ref = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=2))
    os.environ["VXM_PALLAS_BF16_SHIFT"] = "1"
    try:
        got = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=2))
    finally:
        del os.environ["VXM_PALLAS_BF16_SHIFT"]
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
    assert np.abs(got - ref).max() > 0.0


def test_pallas_warp_2d_grid_matches_1d():
    """VXM_PALLAS_TH_FWD tiles H onto a 2-D (z, y) kernel grid; results
    must be identical to the production 1-D-grid kernel, including
    non-divisible tz/th edge slabs."""
    vol, shift = _case(shape=(10, 13, 14), nch=2, scale=1.9)
    ref = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=2))
    os.environ["VXM_PALLAS_TH_FWD"] = "5"   # 13 = 2*5 + 3 (partial tile)
    os.environ["VXM_PALLAS_TZ_FWD"] = "4"   # 10 = 2*4 + 2 (partial slab)
    try:
        got = np.asarray(pallas_interp.warp_bounded(vol, shift, halo=2))
    finally:
        del os.environ["VXM_PALLAS_TH_FWD"]
        del os.environ["VXM_PALLAS_TZ_FWD"]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_bwd_2d_grid_matches_reference():
    """VXM_PALLAS_TH_BWD tiles the backward onto a 2-D (z, y) grid — the
    layout that fits scoped VMEM at full resolution. Must reproduce the XLA
    reference VJP exactly, including partial edge tiles and clamped border
    voxels."""
    rng = np.random.default_rng(31)
    for halo in (1, 2):
        vol_cf = jnp.asarray(rng.normal(size=(2, 10, 13, 14)).astype(np.float32))
        shift = jnp.asarray(rng.uniform(
            -halo, halo, size=(10, 13, 14, 3)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(2, 10, 13, 14)).astype(np.float32))
        os.environ["VXM_PALLAS_TH_BWD"] = "5"
        os.environ["VXM_PALLAS_TZ_BWD"] = "4"
        try:
            dvol, dshift = pallas_interp._bwd_impl_pallas(vol_cf, shift, g, halo)
        finally:
            del os.environ["VXM_PALLAS_TH_BWD"]
            del os.environ["VXM_PALLAS_TZ_BWD"]
        dvol_r, dshift_r = pallas_interp._warp_cf_bwd_ref(halo, (vol_cf, shift), g)
        np.testing.assert_allclose(np.asarray(dvol), np.asarray(dvol_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dshift), np.asarray(dshift_r),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# 3x3x3 SAME conv kernel (pallas_conv)

from voxelmorph_tpu.ops import pallas_conv


def _xla_conv3(x, kernel, bias, slope=None):
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    if slope is not None:
        out = jnp.where(out >= 0, out, slope * out)
    return out


def _conv_case(ci=2, co=4, shape=(8, 8, 32), seed=5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(1, *shape, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    return x, k, b


def test_pallas_conv_forward_matches_xla():
    x, k, b = _conv_case()
    for slope in (None, 0.2):
        got = pallas_conv.conv3_same(x, k, b, act_slope=slope)
        assert got is not None
        ref = _xla_conv3(x, k, b, slope)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_conv_gradients_match_xla():
    x, k, b = _conv_case()
    g = jnp.asarray(np.random.default_rng(7).normal(
        size=(1, 8, 8, 32, 4)).astype(np.float32))

    def loss_p(x, k, b):
        return jnp.sum(pallas_conv.conv3_same(x, k, b, act_slope=0.2) * g)

    def loss_r(x, k, b):
        return jnp.sum(_xla_conv3(x, k, b, 0.2) * g)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4)


def test_pallas_conv_declines_ineligible():
    # ragged lane extent: W=28, th*W never a 128 multiple at any th
    x, k, b = _conv_case(shape=(8, 8, 28))
    assert pallas_conv.conv3_same(x, k, b) is None
    # odd ci
    rng = np.random.default_rng(3)
    x3 = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 3)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))
    assert pallas_conv.conv3_same(x3, k3, b) is None


def test_unet_pallas_conv_dispatch_parity():
    """VXM_PALLAS_CONV=1 swaps eligible ConvBlocks onto the kernel; the
    network output must match the XLA path (same params, same math)."""
    from voxelmorph_tpu.models import unet as unet_mod
    import voxelmorph_tpu as vxm

    model = vxm.networks.VxmDense(
        inshape=(8, 8, 32), nb_unet_features=[[2, 4], [4, 4, 2]],
        int_steps=0)
    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 1)).astype(np.float32))
    trg = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), src, trg)
    ref = model.apply(params, src, trg)
    os.environ["VXM_PALLAS_CONV"] = "1"
    try:
        got = model.apply(params, src, trg)
    finally:
        del os.environ["VXM_PALLAS_CONV"]
    np.testing.assert_allclose(np.asarray(got["y_source"]),
                               np.asarray(ref["y_source"]), rtol=2e-5, atol=2e-5)


def test_pallas_conv_batched_matches_xla():
    """The batch rides the Pallas grid — must match XLA at B>1, fwd + grads."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 32, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 4)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(3, 8, 8, 32, 4)).astype(np.float32))
    got = pallas_conv.conv3_same(x, k, b, act_slope=0.2)
    ref = _xla_conv3(x, k, b, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    gp = jax.grad(lambda *a: jnp.sum(pallas_conv.conv3_same(*a, act_slope=0.2) * g),
                  argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(lambda *a: jnp.sum(_xla_conv3(*a, 0.2) * g),
                  argnums=(0, 1, 2))(x, k, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4)


def test_lean_dw_conv_matches_autodiff():
    """conv3_same_lean_dw: forward equals the XLA conv; custom dw/db/dx
    equal autodiff of the same function (2-D and 3-D)."""
    rng = np.random.default_rng(17)
    for shape, nd in (((2, 7, 9, 11, 3), 3), ((2, 9, 11, 3), 2)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        k = jnp.asarray(rng.normal(
            size=(*((3,) * nd), 3, 5)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
        g = jnp.asarray(rng.normal(
            size=(*shape[:-1], 5)).astype(np.float32))
        got = pallas_conv.conv3_same_lean_dw(x, k, b, 0.2)
        ref = pallas_conv._xla_conv3_fwd_raw(x, k, b, 0.2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        gp = jax.grad(lambda *a: jnp.sum(
            pallas_conv.conv3_same_lean_dw(*a, 0.2) * g),
            argnums=(0, 1, 2))(x, k, b)
        gr = jax.grad(lambda *a: jnp.sum(
            pallas_conv._xla_conv3_fwd_raw(*a, 0.2) * g),
            argnums=(0, 1, 2))(x, k, b)
        for a, r in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)


def test_unet_lean_dw_dispatch_parity():
    """VXM_XLA_DW_EINSUM=1 swaps stride-1 ConvBlocks onto the lean-dw VJP;
    outputs AND parameter gradients must match the nn.Conv path."""
    import voxelmorph_tpu as vxm

    model = vxm.networks.VxmDense(
        inshape=(8, 8, 16), nb_unet_features=[[2, 4], [4, 4, 2]],
        int_steps=0)
    rng = np.random.default_rng(21)
    src = jnp.asarray(rng.normal(size=(1, 8, 8, 16, 1)).astype(np.float32))
    trg = jnp.asarray(rng.normal(size=(1, 8, 8, 16, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), src, trg)

    def loss(p):
        return jnp.mean(
            (model.apply(p, src, trg)["y_source"] - trg) ** 2)

    ref, gref = jax.value_and_grad(loss)(params)
    os.environ["VXM_XLA_DW_EINSUM"] = "1"
    try:
        got, ggot = jax.value_and_grad(loss)(params)
    finally:
        del os.environ["VXM_XLA_DW_EINSUM"]
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    fr = jax.tree_util.tree_leaves(gref)
    fg = jax.tree_util.tree_leaves(ggot)
    for a, r in zip(fg, fr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-5)
