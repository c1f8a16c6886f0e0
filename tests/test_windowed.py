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
