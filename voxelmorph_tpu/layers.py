"""Batched transform "layers" — the public API mirror of the reference's
Keras layers (/root/reference/voxelmorph/tf/layers.py), rebuilt as stateless
callables over jnp arrays.

Where the reference loops per-sample with ``tf.map_fn``, these vmap — XLA
turns that into one batched gather/compute kernel instead of a serialized
loop. Layers hold only configuration; calling them is a pure function, so
they compose freely under ``jax.jit``/``pjit``.

Shapes follow the reference: images are ``(B, *spatial, C)``; dense warps are
``(B, *spatial, N)``; affines are ``(B, M, N+1)`` with M in (N, N+1).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .ops import affine as affine_ops
from .ops import augment as augment_ops
from .ops import warp as warp_ops
from .ops.interp import resize as _resize

__all__ = [
    "SpatialTransformer",
    "VecInt",
    "VecIntegration",
    "RescaleTransform",
    "ComposeTransform",
    "AddIdentity",
    "InvertAffine",
    "ParamsToAffineMatrix",
    "AffineToDenseShift",
    "DrawAffineParams",
    "Resize",
]


class SpatialTransformer:
    """N-D spatial transformer: warp a batch of images by dense or affine transforms.

    Parameters match the reference layer (tf/layers.py:34-152): interp_method
    ('linear'|'nearest'), single_transform (share transform 0 across the
    batch), fill_value (None = edge clamp), shift_center / shape for affine
    densification.
    """

    def __init__(self, interp_method: str = "linear", single_transform: bool = False,
                 fill_value: Optional[float] = None, shift_center: bool = True,
                 shape: Optional[Sequence[int]] = None):
        self.interp_method = interp_method
        self.single_transform = single_transform
        self.fill_value = fill_value
        self.shift_center = shift_center
        self.shape = shape

    def __call__(self, inputs):
        vol, trf = inputs
        single = lambda v, t: warp_ops.transform(
            v, t, interp_method=self.interp_method, fill_value=self.fill_value,
            shift_center=self.shift_center, shape=self.shape, window_halo=None)
        if self.single_transform:
            return jax.vmap(lambda v: single(v, trf[0]))(vol)
        # dense same-grid transforms take the batched adaptive fast path
        if (not affine_ops.is_affine_shape(trf.shape[1:])
                and self.shape is None
                and trf.ndim == vol.ndim
                and trf.shape[1:-1] == vol.shape[1:-1]):
            return warp_ops.transform_batched(
                vol, trf, interp_method=self.interp_method,
                fill_value=self.fill_value)
        return jax.vmap(single)(vol, trf)


class VecInt:
    """Velocity-field integration layer.

    ``method`` in ('ss', 'quadrature', 'ode') with ``int_steps`` steps;
    'ode' integrates to ``out_time_pt`` with fixed-step RK4
    (tf/layers.py:155-261).
    """

    def __init__(self, method: str = "ss", int_steps: int = 7, remat: bool = True,
                 out_time_pt: float = 1.0):
        self.method = method
        self.int_steps = int_steps
        self.remat = remat
        self.out_time_pt = out_time_pt

    def __call__(self, vec):
        if vec.shape[-1] != vec.ndim - 2:
            raise ValueError(
                f"transform ndims {vec.shape[-1]} does not match expected {vec.ndim - 2}")
        if self.method in ("ss", "scaling_and_squaring"):
            return warp_ops.integrate_vec_batched(
                vec, nb_steps=self.int_steps, remat=self.remat)
        return jax.vmap(
            lambda v: warp_ops.integrate_vec(
                v, method=self.method, nb_steps=self.int_steps, remat=self.remat,
                out_time_pt=self.out_time_pt)
        )(vec)


VecIntegration = VecInt


class RescaleTransform:
    """Rescale a dense or affine transform by a zoom factor (tf/layers.py:268-316)."""

    def __init__(self, zoom_factor, interp_method: str = "linear"):
        self.zoom_factor = zoom_factor
        self.interp_method = interp_method

    def __call__(self, trf):
        if affine_ops.is_affine_shape(trf.shape[1:]):
            return affine_ops.rescale_affine(trf, self.zoom_factor)
        return jax.vmap(
            lambda t: warp_ops.rescale_dense_transform(
                t, self.zoom_factor, interp_method=self.interp_method)
        )(trf)


class ComposeTransform:
    """Compose a list of batched affine/dense transforms (tf/layers.py:319-374)."""

    def __init__(self, interp_method: str = "linear", shift_center: bool = True,
                 shape: Optional[Sequence[int]] = None):
        self.interp_method = interp_method
        self.shift_center = shift_center
        self.shape = shape

    def __call__(self, transforms):
        if len(transforms) == 1:
            return transforms[0]
        single = lambda *ts: warp_ops.compose(
            list(ts), interp_method=self.interp_method,
            shift_center=self.shift_center, shape=self.shape)
        return jax.vmap(single)(*transforms)


class AddIdentity:
    """Add identity to a 'shift' affine given flat params or matrices (tf/layers.py:377-415)."""

    def __call__(self, trf):
        if trf.ndim == 2:  # flat params (B, N*(N+1))
            nb_params = trf.shape[-1]
            if nb_params == 6:
                nd = 2
            elif nb_params == 12:
                nd = 3
            else:
                raise ValueError(
                    f"flat affine must be of length 6 (2D) or 12 (3D), got {nb_params}")
            trf = trf.reshape(-1, nd, nd + 1)
        affine_ops.validate_affine_shape(trf.shape)
        return affine_ops.affine_add_identity(trf)


class InvertAffine:
    """Invert a batch of affine matrices (tf/layers.py:418-436)."""

    def __call__(self, matrix):
        return affine_ops.invert_affine(matrix)


class ParamsToAffineMatrix:
    """Affine params -> matrices (tf/layers.py:439-491)."""

    def __init__(self, ndims: int = 3, deg: bool = True, shift_scale: bool = False,
                 last_row: bool = False):
        self.ndims = ndims
        self.deg = deg
        self.shift_scale = shift_scale
        self.last_row = last_row

    def __call__(self, params):
        return affine_ops.params_to_affine_matrix(
            params, deg=self.deg, shift_scale=self.shift_scale,
            last_row=self.last_row, ndims=self.ndims)


class AffineToDenseShift:
    """Affine matrices -> dense shifts (tf/layers.py:494-528)."""

    def __init__(self, shape: Sequence[int], shift_center: bool = True):
        self.shape = tuple(shape)
        self.shift_center = shift_center

    def __call__(self, mat):
        affine_ops.validate_affine_shape(mat.shape)
        return affine_ops.affine_to_dense_shift(mat, self.shape, shift_center=self.shift_center)


class DrawAffineParams:
    """Sample random affine params per batch element (tf/layers.py:531-643).

    JAX version takes an explicit PRNG key at call time: call(key, batch).
    """

    def __init__(self, shift=None, rot=None, scale=None, shear=None,
                 normal_shift=False, normal_rot=False, normal_scale=False,
                 normal_shear=False, shift_scale=False, ndims=3, concat=True,
                 dtype=jnp.float32):
        self.kwargs = dict(
            shift=shift, rot=rot, scale=scale, shear=shear,
            normal_shift=normal_shift, normal_rot=normal_rot,
            normal_scale=normal_scale, normal_shear=normal_shear,
            shift_scale=shift_scale, ndims=ndims, concat=concat, dtype=dtype)

    def __call__(self, key, batch_size: int = 1):
        return augment_ops.draw_affine_params(
            key, batch_shape=(batch_size,), **self.kwargs)


class Resize:
    """Resize batched images by a zoom factor (ne.layers.Resize equivalent)."""

    def __init__(self, zoom_factor, interp_method: str = "linear"):
        self.zoom_factor = zoom_factor
        self.interp_method = interp_method

    def __call__(self, vol):
        return jax.vmap(
            lambda v: _resize(v, self.zoom_factor, interp_method=self.interp_method)
        )(vol)
