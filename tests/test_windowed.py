"""The windowed (shifted-slices) warp path must match the gather path."""

import numpy as np
import jax
import jax.numpy as jnp

from voxelmorph_tpu.ops import warp as W


RNG = np.random.default_rng(17)


def test_windowed_matches_gather_small_shift():
    vol = jnp.asarray(RNG.normal(size=(10, 11, 12, 2)).astype(np.float32))
    shift = jnp.asarray(RNG.uniform(-0.9, 0.9, size=(10, 11, 12, 3)).astype(np.float32))
    fast = np.asarray(W.windowed_transform(vol, shift, halo=1))
    slow = np.asarray(W.transform(vol, shift, window_halo=None))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-4)


def test_windowed_matches_gather_2d():
    vol = jnp.asarray(RNG.normal(size=(9, 9, 1)).astype(np.float32))
    shift = jnp.asarray(RNG.uniform(-1.8, 1.8, size=(9, 9, 2)).astype(np.float32))
    fast = np.asarray(W.windowed_transform(vol, shift, halo=2))
    slow = np.asarray(W.transform(vol, shift, window_halo=None))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-4)


def test_windowed_edge_clamping():
    # shifts that push sampling out of bounds at edges must clamp like gather
    vol = jnp.asarray(RNG.normal(size=(6, 6, 1)).astype(np.float32))
    shift = jnp.full((6, 6, 2), 0.95, jnp.float32)
    fast = np.asarray(W.windowed_transform(vol, shift, halo=1))
    slow = np.asarray(W.transform(vol, shift, window_halo=None))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-4)


def test_transform_cond_dispatch_equivalence():
    """transform with auto-window on == off for both small and large shifts."""
    vol = jnp.asarray(RNG.normal(size=(8, 8, 8, 1)).astype(np.float32))
    for scale in (0.5, 3.0):  # small -> windowed branch, large -> gather branch
        shift = jnp.asarray(
            RNG.uniform(-scale, scale, size=(8, 8, 8, 3)).astype(np.float32))
        a = np.asarray(W.transform(vol, shift, window_halo=1))
        b = np.asarray(W.transform(vol, shift, window_halo=None))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_windowed_gradients_match():
    vol = jnp.asarray(RNG.normal(size=(6, 6, 1)).astype(np.float32))
    shift = jnp.asarray(RNG.uniform(-0.8, 0.8, size=(6, 6, 2)).astype(np.float32))

    loss_fast = lambda v, s: jnp.sum(W.windowed_transform(v, s, halo=1) ** 2)
    loss_slow = lambda v, s: jnp.sum(W.transform(v, s, window_halo=None) ** 2)
    gv_f, gs_f = jax.grad(loss_fast, argnums=(0, 1))(vol, shift)
    gv_s, gs_s = jax.grad(loss_slow, argnums=(0, 1))(vol, shift)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_s), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_s), rtol=1e-3, atol=1e-3)


def test_integrate_vec_uses_windowed_consistently():
    # small velocity: result equals pure gather-path integration
    v = jnp.asarray(RNG.uniform(-2, 2, size=(12, 12, 2)).astype(np.float32))
    a = np.asarray(W.integrate_vec(v, nb_steps=5))

    def integrate_gather(vec, nb_steps):
        vec = vec / (2.0 ** nb_steps)
        for _ in range(nb_steps):
            vec = vec + W.transform(vec, vec, window_halo=None)
        return vec

    b = np.asarray(integrate_gather(v, 5))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_tiered_dispatch_all_three_regimes():
    """window_halo=2 dispatch == gather for shifts in each switch tier:
    max|d| <= 1 (halo-1 kernel), in (1, 2] (halo-2 kernel), > 2 (gather)."""
    vol = jnp.asarray(RNG.normal(size=(8, 8, 8, 2)).astype(np.float32))
    for scale in (0.9, 1.9, 3.5):
        shift = jnp.asarray(
            RNG.uniform(-scale, scale, size=(8, 8, 8, 3)).astype(np.float32))
        # pin the max so the intended tier is actually selected
        shift = shift.at[0, 0, 0, 0].set(scale)
        a = np.asarray(W.transform(vol, shift, window_halo=2))
        b = np.asarray(W.transform(vol, shift, window_halo=None))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
        ab = np.asarray(W.transform_batched(
            vol[None], shift[None], window_halo=2))[0]
        np.testing.assert_allclose(ab, b, rtol=1e-4, atol=1e-4)


def test_integrate_root_is_partial_integration():
    """return_root_steps=s yields exactly the field after nb_steps - s
    squarings — bit-identical to integrating vec/2^s for nb_steps - s steps
    (same scaled start, same step function)."""
    v = jnp.asarray(RNG.uniform(-4, 4, size=(1, 12, 12, 10, 3)).astype(np.float32))
    full, root = W.integrate_vec_batched(v, nb_steps=6, return_root_steps=2)
    full_ref = W.integrate_vec_batched(v, nb_steps=6)
    root_ref = W.integrate_vec_batched(v / 4.0, nb_steps=4)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(full_ref))
    np.testing.assert_array_equal(np.asarray(root), np.asarray(root_ref))


def test_phase_warp_matches_single_gather():
    """2^s bounded warps by the 2^s-th root ~= one gather by the full flow
    (both are first-order compositions; they agree to interpolation error on
    a smooth field), and pos_flow-side outputs are untouched by design."""
    shape = (14, 12, 10)
    # smooth, small-magnitude SVF -> smooth diffeomorphic flow
    g = np.stack(np.meshgrid(*[np.linspace(0, np.pi, s) for s in shape],
                             indexing="ij"), -1)
    svf = (2.5 * np.stack([np.sin(g[..., 0]) * np.cos(g[..., 1]),
                           np.sin(g[..., 1]) * np.cos(g[..., 2]),
                           np.sin(g[..., 2]) * np.cos(g[..., 0])],
                          -1)).astype(np.float32)[None]
    # smooth image: both paths are exact up to trilinear interpolation error,
    # which scales with image curvature per voxel — at this tiny grid the
    # test image's wavelength spans ~10 voxels (far rougher than MRI at
    # 160^3), so the bound is loose; constant-shift exactness is pinned by
    # the case below and in the diagnostic harness
    img = np.sin(g[..., 0] * 0.9) * np.cos(g[..., 1] * 1.1) * np.sin(g[..., 2])
    vols = jnp.asarray(img.astype(np.float32))[None, ..., None]
    full, root = W.integrate_vec_batched(jnp.asarray(svf), nb_steps=5,
                                         return_root_steps=2)
    classic = np.asarray(W.transform_batched(vols, full, window_halo=None))
    phased = np.asarray(W.phase_warp_batched(vols, root, full, 4, halo=2))
    assert float(np.max(np.abs(np.asarray(root)))) <= 2.0  # fast branch taken
    np.testing.assert_allclose(phased, classic, atol=0.12)
    assert float(np.mean(np.abs(phased - classic))) < 2e-2

    # a constant integer-shift root composes exactly: both paths bit-agree
    c = jnp.ones((1, *shape, 3), jnp.float32)
    exact_classic = np.asarray(W.transform_batched(vols, 4 * c, window_halo=None))
    exact_phased = np.asarray(W.phase_warp_batched(vols, c, 4 * c, 4, halo=2))
    np.testing.assert_array_equal(exact_phased, exact_classic)


def test_phase_warp_falls_back_to_exact_gather():
    """When the root's displacement exceeds the halo, the phase warp must be
    bit-identical to the classic gather by the full flow."""
    shape = (8, 9, 10)
    vols = jnp.asarray(RNG.normal(size=(2, *shape, 1)).astype(np.float32))
    full = jnp.asarray(RNG.uniform(-5, 5, size=(2, *shape, 3)).astype(np.float32))
    root = 0.5 * full
    root = root.at[0, 0, 0, 0, 0].set(3.7)  # > halo
    classic = np.asarray(W.transform_batched(vols, full, window_halo=None))
    phased = np.asarray(W.phase_warp_batched(vols, root, full, 4, halo=2))
    # same gather math; tolerance only for XLA fusion/reassociation inside
    # the cond branch
    np.testing.assert_allclose(phased, classic, rtol=1e-6, atol=1e-6)
