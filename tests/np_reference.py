"""Independent numpy reference implementations used as golden oracles.

Written directly from the mathematical definitions (multilinear interpolation
with edge clamping, etc.) — deliberately a *different* implementation strategy
from the library (per-point python loops / np.vectorize style) so tests
cross-check the math, not the code.
"""

import itertools

import numpy as np


def interpn_np(vol, loc, method="linear", fill_value=None):
    """vol: (*S, C); loc: (*out, N). Returns (*out, C)."""
    nd = loc.shape[-1]
    spatial = vol.shape[:nd]
    C = vol.shape[nd]
    out_shape = loc.shape[:-1]
    pts = loc.reshape(-1, nd).astype(np.float64)
    out = np.zeros((pts.shape[0], C), dtype=np.float64)

    for i, p in enumerate(pts):
        if method == "nearest":
            idx = np.clip(np.round(p).astype(int), 0, np.array(spatial) - 1)
            out[i] = vol[tuple(idx)]
        else:
            p_cl = np.clip(p, 0, np.array(spatial) - 1.0)
            lo = np.clip(np.floor(p).astype(int), 0, np.array(spatial) - 1)
            hi = np.clip(lo + 1, 0, np.array(spatial) - 1)
            w_hi = p_cl - lo  # weight of the hi corner
            acc = np.zeros(C)
            for corner in itertools.product([0, 1], repeat=nd):
                idx = tuple(hi[d] if corner[d] else lo[d] for d in range(nd))
                w = np.prod([w_hi[d] if corner[d] else 1 - w_hi[d] for d in range(nd)])
                acc += w * np.asarray(vol[idx], dtype=np.float64)
            out[i] = acc
        if fill_value is not None:
            inside = np.all((p >= 0) & (p <= np.array(spatial) - 1.0))
            if not inside:
                out[i] = fill_value

    return out.reshape(*out_shape, C)


def transform_np(vol, shift, method="linear", fill_value=None):
    """Pull-warp: out(x) = vol(x + shift(x)). vol (*S, C), shift (*S, N)."""
    nd = shift.shape[-1]
    grid = np.stack(
        np.meshgrid(*[np.arange(s, dtype=np.float64) for s in shift.shape[:-1]], indexing="ij"),
        axis=-1,
    )
    return interpn_np(vol, grid + shift, method=method, fill_value=fill_value)


def window_sum_np(x, win):
    """Moving-window sum with SAME zero padding. x: (B, *S, C)."""
    nd = x.ndim - 2
    out = x.astype(np.float64).copy()
    for d in range(nd):
        axis = d + 1
        w = win[d]
        pad_lo = (w - 1) // 2
        pad_hi = w - 1 - pad_lo
        pads = [(0, 0)] * x.ndim
        pads[axis] = (pad_lo, pad_hi)
        xp = np.pad(out, pads)
        n = out.shape[axis]
        acc = np.zeros_like(out)
        for k in range(w):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(k, k + n)
            acc += xp[tuple(sl)]
        out = acc
    return out
