"""Random spatial-augmentation sampling (SynthMorph-style), PRNG-key threaded.

Behavior mirrors /root/reference/voxelmorph/tf/utils/augment.py, but every
function takes an explicit ``jax.random`` key instead of stateful TF seeds —
the idiomatic JAX design that keeps jitted synthesis pipelines reproducible
and parallelizable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["draw_flip_matrix", "draw_swap_matrix", "draw_affine_params"]


def draw_flip_matrix(key, grid_shape: Sequence[int], shift_center: bool = True,
                     last_row: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Random axis-flip matrix of shape (M, N+1), M = N (+1 with last_row).

    Each axis is flipped with probability 1/2. Without ``shift_center`` the
    flip is about index 0, so a translation of (dim-1) re-centers it.
    """
    ndims = len(grid_shape)
    sizes = jnp.asarray(grid_shape, dtype=dtype)
    rand_bit = (jax.random.normal(key, (ndims,)) > 0).astype(dtype)
    diag_vals = jnp.power(jnp.asarray(-1.0, dtype), rand_bit)
    idx = jnp.arange(ndims)
    diag = jnp.zeros((ndims, ndims), dtype).at[idx, idx].set(diag_vals)
    if shift_center:
        shift = jnp.zeros((ndims, 1), dtype)
    else:
        shift = ((sizes - 1) * rand_bit).reshape(-1, 1)
    out = jnp.concatenate([diag, shift], axis=1)
    if last_row:
        row = jnp.zeros((1, ndims + 1), dtype).at[0, -1].set(1.0)
        out = jnp.concatenate([out, row], axis=0)
    return out


def draw_swap_matrix(key, ndims: int, last_row: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Random axis-permutation matrix of shape (M, N+1)."""
    mat = jnp.eye(ndims, ndims + 1, dtype=dtype)
    mat = jax.random.permutation(key, mat, axis=0)
    if last_row:
        row = jnp.zeros((1, ndims + 1), dtype).at[0, -1].set(1.0)
        mat = jnp.concatenate([mat, row], axis=0)
    return mat


def draw_affine_params(
    key,
    shift=None,
    rot=None,
    scale=None,
    shear=None,
    normal_shift: bool = False,
    normal_rot: bool = False,
    normal_scale: bool = False,
    normal_shear: bool = False,
    shift_scale: bool = False,
    ndims: int = 3,
    batch_shape: Optional[Sequence[int]] = None,
    concat: bool = True,
    dtype=jnp.float32,
):
    """Sample (shift, rot, scale, shear) affine params.

    Ranges: uniform in [-x, x] per parameter, or normal with SD x when the
    matching ``normal_*`` flag is set (scale draws truncate at 2 SD).
    ``shift_scale`` adds 1 to scale draws. Returns a concatenated (..., K)
    tensor or the 4-tuple.
    """
    assert ndims in (2, 3), "only 2D and 3D supported"
    n = 1 if ndims == 2 else 3
    splits = dict(shift=ndims, rot=n, scale=ndims, shear=n)
    inputs = dict(shift=shift, rot=rot, scale=scale, shear=shear)
    trunc = dict(shift=False, rot=False, scale=True, shear=False)
    normal = dict(shift=normal_shift, rot=normal_rot, scale=normal_scale, shear=normal_shear)

    keys = dict(zip(splits, jax.random.split(key, len(splits))))
    batch = tuple(batch_shape) if batch_shape is not None else ()

    par = {}
    for k, m in splits.items():
        lim = np.ravel(0 if inputs[k] is None else inputs[k]).astype(np.float32)
        if lim.size == 1:
            lim = np.repeat(lim, m)
        assert lim.size == m, f"unexpected number of parameters {lim.size} ({k})"
        lim = jnp.asarray(lim, dtype)
        shape = (*batch, m)
        if normal[k]:
            if trunc[k]:
                draw = jax.random.truncated_normal(keys[k], -2.0, 2.0, shape, dtype)
            else:
                draw = jax.random.normal(keys[k], shape, dtype)
            par[k] = draw * lim
        else:
            par[k] = jax.random.uniform(keys[k], shape, dtype, minval=-1.0, maxval=1.0) * lim
    if shift_scale:
        par["scale"] = par["scale"] + 1

    order = ("shift", "rot", "scale", "shear")
    out = tuple(par[k] for k in order)
    return jnp.concatenate(out, axis=-1) if concat else out
