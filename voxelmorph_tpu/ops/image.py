"""Image-synthesis ops: separable Gaussian blur, multi-scale noise fields,
barycenters, matrix square root — the device-side building blocks of
SynthMorph-style generation and affine feature registration.

All functions are jit-friendly: static shapes, traced parameters allowed
(e.g. a traced blur sigma with a static kernel radius).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .interp import resize

__all__ = ["gaussian_blur", "draw_multiscale_noise", "barycenter", "sqrtm"]


def gaussian_blur(x: jnp.ndarray, sigma, max_sigma: Optional[float] = None) -> jnp.ndarray:
    """Separable Gaussian blur over the spatial axes of ``x`` (*S, C).

    ``sigma`` may be a traced scalar (per-sample randomized blur): the kernel
    RADIUS is static, derived from ``max_sigma`` (defaults to sigma if it is a
    python number), while the weights are computed from the traced value.
    sigma == 0 degenerates to identity.
    """
    if max_sigma is None:
        if hasattr(sigma, "dtype") and getattr(sigma, "aval", None) is not None:
            raise ValueError("max_sigma is required when sigma is traced")
        max_sigma = float(sigma)
    radius = max(int(math.ceil(3 * max_sigma)), 1)
    offsets = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sig = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-5)
    kernel = jnp.exp(-0.5 * (offsets / sig) ** 2)
    kernel = kernel / jnp.sum(kernel)

    nd = x.ndim - 1
    out = x
    for axis in range(nd):
        moved = jnp.moveaxis(out, axis, -1)
        n = moved.shape[-1]
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(radius, radius)],
                         mode="edge")
        acc = jnp.zeros_like(moved)
        for i in range(2 * radius + 1):
            acc = acc + kernel[i] * jax.lax.slice_in_dim(padded, i, i + n, axis=-1)
        out = jnp.moveaxis(acc, -1, axis)
    return out


def draw_multiscale_noise(key, shape: Sequence[int], scales, max_std: float,
                          nb_channels: int = 1, isotropic_std: bool = True) -> jnp.ndarray:
    """Smooth random field: per scale, draw N(0, std) noise on a grid
    downsampled by that scale, upsample (linear) to ``shape``, and sum.
    std is itself drawn uniformly from [0, max_std] per scale (and channel).

    Returns (*shape, nb_channels). This is the SVF / bias-field generator of
    the SynthMorph pipeline (perlin-style smooth noise).
    """
    if not isinstance(scales, (list, tuple)):
        scales = [scales]
    shape = tuple(int(s) for s in shape)
    total = jnp.zeros((*shape, nb_channels), jnp.float32)
    for scale in scales:
        key, k_std, k_noise = jax.random.split(key, 3)
        small = tuple(max(int(math.ceil(s / scale)), 2) for s in shape)
        std_shape = (1,) * (len(shape) + 1) if isotropic_std else (*([1] * len(shape)), nb_channels)
        std = jax.random.uniform(k_std, std_shape, jnp.float32, 0.0, max_std)
        noise = jax.random.normal(k_noise, (*small, nb_channels), jnp.float32) * std
        if small != shape:
            noise = resize(noise, [s / t for s, t in zip(shape, small)], new_shape=shape)
        total = total + noise
    return total


def barycenter(feat: jnp.ndarray, normalize: bool = True,
               shift_center: bool = True) -> jnp.ndarray:
    """Per-channel center of mass of batched feature maps.

    feat: (B, *S, K) non-negative maps. Returns (B, K, N) coordinates, in ij
    order. With ``shift_center`` coordinates are relative to the grid center;
    with ``normalize`` they are divided by the axis size (so multiplying by a
    target shape maps them to that resolution). Mirrors the conventions of
    ne.utils.barycenter as used by VxmAffineFeatureDetector
    (tf/networks.py:1396-1399).
    """
    spatial = feat.shape[1:-1]
    nd = len(spatial)
    w = feat
    denom = jnp.sum(w.reshape(w.shape[0], -1, w.shape[-1]), axis=1) + 1e-8  # (B, K)
    coords = []
    for d, s in enumerate(spatial):
        ax = jnp.arange(s, dtype=jnp.float32)
        if shift_center:
            ax = ax - 0.5 * (s - 1)
        if normalize:
            ax = ax / s
        bshape = [1] * (nd + 2)
        bshape[d + 1] = s
        num = jnp.sum((w * ax.reshape(bshape)).reshape(w.shape[0], -1, w.shape[-1]), axis=1)
        coords.append(num / denom)
    return jnp.stack(coords, axis=-1)  # (B, K, N)


def sqrtm(mat: jnp.ndarray, iters: int = 20) -> jnp.ndarray:
    """Principal matrix square root via the Denman–Beavers iteration.

    Differentiable and jit-friendly (fixed iteration count); converges for
    matrices with no nonpositive-real eigenvalues, which includes the
    well-conditioned near-identity affines of mid-space registration.
    Batched over leading dims: (..., M, M).
    """
    eye = jnp.broadcast_to(jnp.eye(mat.shape[-1], dtype=mat.dtype), mat.shape)

    def body(_, yz):
        y, z = yz
        y_next = 0.5 * (y + jnp.linalg.inv(z))
        z_next = 0.5 * (z + jnp.linalg.inv(y))
        return y_next, z_next

    y, _ = jax.lax.fori_loop(0, iters, body, (mat, eye))
    return y
