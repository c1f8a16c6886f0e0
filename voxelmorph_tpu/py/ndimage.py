"""Pure-numpy N-D image utilities: zoom, Gaussian blur, connected components,
Euclidean distance transform.

These replace the scipy/skimage calls of the reference's python layer
(/root/reference/voxelmorph/py/utils.py:308-470) with dependency-free
implementations so the framework runs on a bare JAX image.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

__all__ = [
    "zoom",
    "gaussian_filter",
    "label_components",
    "distance_transform_edt",
]


def zoom(array: np.ndarray, factors, order: int = 0) -> np.ndarray:
    """Resize by per-axis factors with nearest (order=0) or linear (order=1)
    interpolation. Output size is round(in * factor) per axis (scipy.ndimage
    zoom convention); sample coordinates map endpoints to endpoints.
    """
    if np.isscalar(factors):
        factors = [factors] * array.ndim
    out_shape = [int(round(s * f)) for s, f in zip(array.shape, factors)]
    out = array
    for axis, n_out in enumerate(out_shape):
        n_in = out.shape[axis]
        if n_out == n_in:
            continue
        if n_out == 1:
            coords = np.zeros(1)
        else:
            coords = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        if order == 0:
            idx = np.clip(np.round(coords).astype(int), 0, n_in - 1)
            out = np.take(out, idx, axis=axis)
        else:
            lo = np.clip(np.floor(coords).astype(int), 0, n_in - 1)
            hi = np.clip(lo + 1, 0, n_in - 1)
            w = (coords - lo).reshape([-1 if a == axis else 1 for a in range(out.ndim)])
            out = np.take(out, lo, axis=axis) * (1 - w) + np.take(out, hi, axis=axis) * w
    return out


def _gauss_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_filter(array: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Separable Gaussian blur with reflect padding (scipy default mode)."""
    out = np.asarray(array, dtype=np.float64)
    if sigma <= 0:
        return out
    k = _gauss_kernel1d(sigma, truncate)
    r = (len(k) - 1) // 2
    for axis in range(out.ndim):
        moved = np.moveaxis(out, axis, -1)
        n = moved.shape[-1]
        pad = min(r, n - 1) if n > 1 else 0
        if pad < r:
            # reflect-pad repeatedly for tiny axes
            padded = np.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(r, r)], mode="symmetric")
        else:
            padded = np.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(r, r)], mode="reflect")
        acc = np.zeros_like(moved)
        for i, w in enumerate(k):
            acc += w * padded[..., i:i + n]
        out = np.moveaxis(acc, -1, axis)
    return out


def label_components(bw: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Label connected components of a binary array (face connectivity).

    Iterative vectorized min-label propagation: each foreground voxel starts
    with a unique id and repeatedly takes the min over its face neighbors
    until a fixed point. Returns int labels (0 = background, components
    numbered 1..K contiguously).
    """
    bw = np.asarray(bw).astype(bool)
    if connectivity != 1:
        raise NotImplementedError("only face connectivity (1) is implemented")
    lab = np.where(bw, np.arange(bw.size, dtype=np.int64).reshape(bw.shape) + 1, 0)
    big = np.iinfo(np.int64).max
    while True:
        cur = np.where(bw, lab, big)
        new = cur.copy()
        for axis in range(bw.ndim):
            fwd = np.roll(cur, 1, axis=axis)
            idx = [slice(None)] * bw.ndim
            idx[axis] = 0
            fwd[tuple(idx)] = big
            bwd = np.roll(cur, -1, axis=axis)
            idx[axis] = -1
            bwd[tuple(idx)] = big
            new = np.minimum(new, np.minimum(fwd, bwd))
        new = np.where(bw, new, 0)
        nxt = np.where(bw, new, lab)
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    # compact labels to 1..K
    uniq = np.unique(lab)
    uniq = uniq[uniq > 0]
    remap = {int(u): i + 1 for i, u in enumerate(uniq)}
    flat = lab.reshape(-1)
    out = np.zeros_like(flat)
    for u, i in remap.items():
        out[flat == u] = i
    return out.reshape(bw.shape)


def _edt_1d_sq(f: np.ndarray) -> np.ndarray:
    """Exact 1-D squared-distance transform along the last axis.

    Computes out[i] = min_j (f[j] + (i - j)^2) as a chunked, fully-vectorized
    min-plus product. O(n^2) per scanline but exact for arbitrary f, which the
    sequential-axis EDT decomposition requires.
    """
    n = f.shape[-1]
    lead = int(np.prod(f.shape[:-1], dtype=np.int64)) if f.ndim > 1 else 1
    f2 = f.reshape(lead, n)
    out = np.empty_like(f2)
    # chunk scanlines so the (chunk, n, n) broadcast stays < ~256 MB
    chunk = max(1, int(2.5e7 // (n * n) + 1))
    i = np.arange(n, dtype=np.float64)
    d2 = (i[None, :] - i[:, None]) ** 2  # (n, n): cost of using source j for output i
    for s in range(0, lead, chunk):
        block = f2[s:s + chunk]  # (c, n)
        out[s:s + chunk] = (block[:, None, :] + d2[None]).min(axis=-1)
    return out.reshape(f.shape)


def distance_transform_edt(binary: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance to the nearest zero (background) voxel.

    Matches scipy.ndimage.distance_transform_edt semantics: distance from
    each non-zero voxel to the nearest zero voxel; zero voxels get 0.
    """
    binary = np.asarray(binary).astype(bool)
    INF = 1e12
    f = np.where(binary, INF, 0.0)
    for axis in range(binary.ndim):
        f = np.moveaxis(_edt_1d_sq(np.moveaxis(f, axis, -1)), -1, axis)
    return np.sqrt(f)
