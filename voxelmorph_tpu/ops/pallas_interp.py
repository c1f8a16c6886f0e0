"""Pallas TPU kernel for the bounded-displacement dense warp.

This module owns the hot gather of the framework (the reference delegates it
to ne.utils.interpn, /root/reference/voxelmorph/tf/utils/utils.py:174): the
trilinear self-warp inside scaling-and-squaring integration and any dense
warp whose displacements are bounded by a small halo ``h``.

Why a kernel, and why this shape
--------------------------------
A general 3-D grid-sample is 8 random gathers per voxel. The XLA path in
``ops.interp.interpn`` turns that into ONE row-gather from a corner table,
but the table is 2^N x the volume in HBM and every gather transaction is
random. For |shift| <= h, however, the warp is exactly

    out[x] = sum_{o in [-h, h]^3}  prod_d max(0, 1 - |d_eff_d(x) - o_d|)
             * vol[x + o]

a sum of (2h+1)^3 *contiguous shifted slices* — every HBM access is
sequential (offsets outside [-h, h] carry identically-zero triangle weights,
because the clamped effective shift obeys |d| <= h). The XLA formulation of
this sum (ops.warp.windowed_transform) re-reads the volume per term; this
kernel instead streams each padded input
slab into VMEM ONCE and accumulates all (2h+1)^3 terms on the VPU, so HBM
traffic is ~(read vol + read shift + write out) regardless of h, and the
backward pass is the same single-pass structure (no scatters).

The kernel processes the volume in z-slabs: grid = (num_slabs,); each step
sees an overlapping (TZ + 2p, H + 2p, W + 2p) window of the edge-padded
input (p = h) and writes a (TZ, H, W) output block. Channels are looped
inside the kernel (C is small: 1 for images, 3 for SVF fields).

Edge semantics match ops.interp.interpn: sampling coordinates are clamped to
[0, dim-1] (the pre-pad is edge-replicated so clamped taps read edge values).

Used via ops.warp.transform/transform_batched, which dispatch here on TPU
when the windowed fast path is eligible; falls back to the XLA formulation
on CPU (Pallas TPU kernels don't run on the host platform).
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["warp_bounded", "pallas_available"]

# Run kernels through the Pallas interpreter (for CPU testing of the kernel
# logic itself; the TPU compiled path is exercised on hardware).
_INTERPRET = os.environ.get("VXM_PALLAS_INTERPRET", "0") == "1"


def pallas_available() -> bool:
    """True when the TPU Pallas backend can run (not on CPU/interpreter)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def kernel_vmem_fits(spatial, nch: int, halo: int) -> bool:
    """Conservative check that the fwd AND vjp kernels fit scoped VMEM.

    Mosaic double-buffers every grid block and the TPU scoped-vmem limit is
    16 MB. The channel count multiplies both the input window and the output
    block, so many-channel volumes — e.g. SynthMorph's ~45-channel one-hot
    label maps — cannot run this kernel even at tz=1 and must take the XLA
    shifted-slice path instead. Footprints are modeled at tz=1 (the smallest
    slab the pickers can choose) and gated at 10 MB: calibrated against a
    measured failure (45ch x 80x96x112, halo 1: model 12.9 MB, actual
    17.9 MB > 16 MB limit — the model under-counts Mosaic stack overhead by
    ~1.4x, and 10 MB keeps the real footprint safely under 16 MB).
    """
    if len(spatial) != 3:
        return False
    _, H, W = (int(s) for s in spatial)
    p, tz = int(halo), 1
    n_off = 2 * p + 1
    hwp = (H + 2 * p) * (W + 2 * p) * 4
    hw = H * W * 4
    win_z = tz + 2 * p
    fwd = (2 * (nch * win_z * hwp + 3 * tz * hw + nch * tz * hw)
           + tz * hw * (n_off ** 2 + 8))
    bwd = (2 * ((2 * nch + 3) * win_z * hwp + nch * tz * hw + 3 * tz * hw)
           + tz * hw * (n_off ** 2 + 2 * nch + 10))
    return max(fwd, bwd) <= 10 * 1024 * 1024


def _pick_tz(d: int, h: int, hw_bytes: int, nch: int, budget=6 * 1024 * 1024):
    """Choose the z-slab size: as large as fits the VMEM budget and divides
    reasonably; the grid covers D with ceil-division and a masked tail.
    The budget accounts for the input window plus the (2h+1)^2 live
    (tz, H, W) temporaries of the unrolled inner accumulation."""
    pad = 2 * h
    n_off = 2 * h + 1
    for tz in (16, 8, 4, 2, 1):
        if tz > d:
            continue
        win_bytes = (tz + pad) * hw_bytes * nch  # input window
        tmp_bytes = tz * hw_bytes * (n_off * n_off + 8)
        if win_bytes + tmp_bytes <= budget:
            return tz
    return 1


def _warp_kernel(h, tz, spatial, nch, vol_ref, sz_ref, sy_ref, sx_ref, out_ref):
    """One z-slab: accumulate the (2h+1)^3 shifted-slice terms in VMEM.

    vol_ref: (C, TZ+2p, H+2p, W+2p) edge-padded input window
    s*_ref:  (TZ, H, W) per-axis displacement components
    out_ref: (C, TZ, H, W)

    The z offsets run in a fori_loop — z is an untiled dim, so a dynamic
    slice start is legal there; the (y, x) offsets are unrolled with STATIC
    (if unaligned) starts, which Mosaic lowers to vector shifts. This bounds
    live VMEM temporaries to one z-window plus the (2h+1)^2 inner terms.
    """
    import jax.experimental.pallas as pl

    D, H, W = spatial
    p = h
    n_off = 2 * h + 1
    i = pl.program_id(0)

    # effective per-axis displacement after clamping to the volume border;
    # |d_eff| <= h everywhere given the caller's |shift| <= h guard
    fiota = lambda d: jax.lax.broadcasted_iota(
        jnp.int32, (tz, H, W), d).astype(jnp.float32)
    z_base = (i * tz).astype(jnp.float32) + fiota(0)
    dz = jnp.clip(z_base + sz_ref[...], 0.0, D - 1.0) - z_base
    y_base = fiota(1)
    dy = jnp.clip(y_base + sy_ref[...], 0.0, H - 1.0) - y_base
    x_base = fiota(2)
    dx = jnp.clip(x_base + sx_ref[...], 0.0, W - 1.0) - x_base

    tri = lambda d, o: jnp.maximum(0.0, 1.0 - jnp.abs(d - o))

    for c in range(nch):
        def body(k, acc):
            oz = k - h
            wz = tri(dz, oz.astype(jnp.float32))
            # one dynamically-offset z window; (tz, H+2p, W+2p)
            zwin = vol_ref[c, pl.ds(p + oz, tz), :, :]
            for oy in range(-h, h + 1):
                wzy = wz * tri(dy, float(oy))
                for ox in range(-h, h + 1):
                    w = wzy * tri(dx, float(ox))
                    tap = zwin[:, p + oy:p + oy + H, p + ox:p + ox + W]
                    acc = acc + w * tap
            return acc

        out_ref[c] = jax.lax.fori_loop(
            0, n_off, body, jnp.zeros((tz, H, W), jnp.float32))


def _warp_fwd_impl(vol_cf, sz, sy, sx, h: int):
    """vol_cf: (C, D, H, W) float32; s*: (D, H, W). Returns (C, D, H, W)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch, D, H, W = vol_cf.shape
    p = h
    tz = _pick_tz(D, h, (H + 2 * p) * (W + 2 * p) * 4, nch)
    grid = (D + tz - 1) // tz
    d_pad = grid * tz  # pad D so every slab is full-size

    pads = [(0, 0), (p, p + (d_pad - D)), (p, p), (p, p)]
    vol_p = jnp.pad(vol_cf, pads, mode="edge")
    spads = [(0, d_pad - D), (0, 0), (0, 0)]
    sz_p = jnp.pad(sz, spads)
    sy_p = jnp.pad(sy, spads)
    sx_p = jnp.pad(sx, spads)

    kernel = functools.partial(_warp_kernel, h, tz, (D, H, W), nch)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            # overlapping input windows: element-offset indexing (pl.Element)
            # so consecutive slabs share their z halo (Mosaic requires all
            # dims to be Element when any is)
            pl.BlockSpec((pl.Element(nch), pl.Element(tz + 2 * p),
                          pl.Element(H + 2 * p), pl.Element(W + 2 * p)),
                         lambda i: (0, i * tz, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nch, tz, H, W), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, d_pad, H, W), jnp.float32),
        interpret=_INTERPRET,
    )(vol_p, sz_p, sy_p, sx_p)
    return out[:, :D]


# ------------------------------------------------------------ backward kernel

def _bwd_kernel(h, tz, spatial, nch,
                vol_ref, g_ref, sz_ref, sy_ref, sx_ref,
                dvol_ref, dsz_ref, dsy_ref, dsx_ref):
    """One z-slab of the warp VJP.

    All inputs are (…, tz+2p, H+2p, W+2p) element-offset windows over arrays
    padded by p (vol edge-padded; g and the shift fields zero-padded).

      d vol[u]     = sum_o w_o(u - o) g(u - o)
      d shift_a(x) = [not clamped]_a(x) * sum_o (dw_o/dd_a)(x) vol[x + o] . g(x)

    The dvol terms slice every input at the FLIPPED offset and recompute the
    weights there (slab-sized temporaries only); the dshift terms use the
    slab-centered fields. z offsets run in a fori_loop (dynamic start on the
    untiled dim), y/x offsets are static unrolled.
    """
    import jax.experimental.pallas as pl

    D, H, W = spatial
    p = h
    n_off = 2 * h + 1
    i = pl.program_id(0)

    iota = lambda d: jax.lax.broadcasted_iota(jnp.int32, (tz, H, W), d)
    z0i = i * tz + iota(0)  # global z of each slab voxel (int)
    z0 = z0i.astype(jnp.float32)
    y0 = iota(1).astype(jnp.float32)
    x0 = iota(2).astype(jnp.float32)

    ctr = lambda ref: ref[pl.ds(p, tz), p:p + H, p:p + W]
    sz0, sy0, sx0 = ctr(sz_ref), ctr(sy_ref), ctr(sx_ref)
    dz0 = jnp.clip(z0 + sz0, 0.0, D - 1.0) - z0
    dy0 = jnp.clip(y0 + sy0, 0.0, H - 1.0) - y0
    dx0 = jnp.clip(x0 + sx0, 0.0, W - 1.0) - x0
    # clamp interior masks (zero gradient through a saturated clip)
    in_z = ((z0 + sz0) > 0.0) & ((z0 + sz0) < D - 1.0)
    in_y = ((y0 + sy0) > 0.0) & ((y0 + sy0) < H - 1.0)
    in_x = ((x0 + sx0) > 0.0) & ((x0 + sx0) < W - 1.0)
    g0 = [g_ref[c, pl.ds(p, tz), p:p + H, p:p + W] for c in range(nch)]

    tri = lambda d, o: jnp.maximum(0.0, 1.0 - jnp.abs(d - o))
    dtri = lambda d, o: jnp.where(jnp.abs(d - o) < 1.0, -jnp.sign(d - o), 0.0)
    zeros = lambda: jnp.zeros((tz, H, W), jnp.float32)

    def body(k, carry):
        dvol, dsz, dsy, dsx = carry
        oz = k - h
        ozf = oz.astype(jnp.float32)
        # --- dvol: read everything at the flipped offset (y - o) ---
        zs = pl.ds(p - oz, tz)
        zq = z0 - ozf  # global z of the source position y - o
        for oy in range(-h, h + 1):
            for ox in range(-h, h + 1):
                ysl = slice(p - oy, p - oy + H)
                xsl = slice(p - ox, p - ox + W)
                yq = y0 - float(oy)
                xq = x0 - float(ox)
                valid = ((zq >= 0.0) & (zq <= D - 1.0) & (yq >= 0.0)
                         & (yq <= H - 1.0) & (xq >= 0.0) & (xq <= W - 1.0))
                szq = sz_ref[zs, ysl, xsl]
                syq = sy_ref[zs, ysl, xsl]
                sxq = sx_ref[zs, ysl, xsl]
                dzq = jnp.clip(zq + szq, 0.0, D - 1.0) - zq
                dyq = jnp.clip(yq + syq, 0.0, H - 1.0) - yq
                dxq = jnp.clip(xq + sxq, 0.0, W - 1.0) - xq
                w = jnp.where(valid,
                              tri(dzq, ozf) * tri(dyq, float(oy))
                              * tri(dxq, float(ox)), 0.0)
                dvol = [dv + w * g_ref[c, zs, ysl, xsl]
                        for c, dv in enumerate(dvol)]

        # --- dshift: same-position weights, taps at + offset ---
        zs2 = pl.ds(p + oz, tz)
        wz, dwz = tri(dz0, ozf), dtri(dz0, ozf)
        for oy in range(-h, h + 1):
            wy, dwy = tri(dy0, float(oy)), dtri(dy0, float(oy))
            for ox in range(-h, h + 1):
                wx, dwx = tri(dx0, float(ox)), dtri(dx0, float(ox))
                ysl = slice(p + oy, p + oy + H)
                xsl = slice(p + ox, p + ox + W)
                gv = zeros()
                for c in range(nch):
                    gv = gv + g0[c] * vol_ref[c, zs2, ysl, xsl]
                dsz = dsz + gv * dwz * wy * wx
                dsy = dsy + gv * wz * dwy * wx
                dsx = dsx + gv * wz * wy * dwx
        return dvol, dsz, dsy, dsx

    dvol, dsz, dsy, dsx = jax.lax.fori_loop(
        0, n_off, body, ([zeros() for _ in range(nch)], zeros(), zeros(), zeros()))
    for c in range(nch):
        dvol_ref[c] = dvol[c]
    dsz_ref[...] = jnp.where(in_z, dsz, 0.0)
    dsy_ref[...] = jnp.where(in_y, dsy, 0.0)
    dsx_ref[...] = jnp.where(in_x, dsx, 0.0)


def _bwd_impl_pallas(vol_cf, shift, g, h: int):
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    n_off = 2 * h + 1
    hw = (H + 2 * p) * (W + 2 * p) * 4
    # window arrays: vol + g (nch each) + 3 shift fields; slab temps — Mosaic
    # keeps roughly the full inner-unroll live set on its stack, so budget
    # conservatively (measured: the 16M scoped-vmem limit binds well before
    # the analytic estimate)
    budget = 6 * 1024 * 1024
    tz = 1
    for cand in (16, 8, 4, 2, 1):
        if cand > D:
            continue
        win = (cand + 2 * p) * hw * (2 * nch + 3)
        tmp = cand * hw * (n_off * n_off + 2 * nch + 10)
        if win + tmp <= budget:
            tz = cand
            break
    grid = (D + tz - 1) // tz
    d_pad = grid * tz

    pads3 = [(p, p + (d_pad - D)), (p, p), (p, p)]
    vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
    g_p = jnp.pad(g, [(0, 0)] + pads3)
    sz_p = jnp.pad(shift[..., 0], pads3)
    sy_p = jnp.pad(shift[..., 1], pads3)
    sx_p = jnp.pad(shift[..., 2], pads3)

    win_z = tz + 2 * p
    vol_spec = pl.BlockSpec(
        (pl.Element(nch), pl.Element(win_z), pl.Element(H + 2 * p),
         pl.Element(W + 2 * p)), lambda i: (0, i * tz, 0, 0))
    s_spec = pl.BlockSpec(
        (pl.Element(win_z), pl.Element(H + 2 * p), pl.Element(W + 2 * p)),
        lambda i: (i * tz, 0, 0))

    kernel = functools.partial(_bwd_kernel, h, tz, (D, H, W), nch)
    dvol, dsz, dsy, dsx = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[vol_spec, vol_spec, s_spec, s_spec, s_spec],
        out_specs=[
            pl.BlockSpec((nch, tz, H, W), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nch, d_pad, H, W), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, H, W), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, H, W), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, H, W), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(vol_p, g_p, sz_p, sy_p, sx_p)
    dshift = jnp.stack([dsz[:D], dsy[:D], dsx[:D]], axis=-1)
    return dvol[:, :D], dshift


# ---------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _warp_bounded_cf(vol_cf, shift, h):
    """Channels-first bounded warp. shift: (D, H, W, 3)."""
    return _warp_fwd_impl(vol_cf, shift[..., 0], shift[..., 1], shift[..., 2], h)


def _warp_cf_fwd(vol_cf, shift, h):
    out = _warp_bounded_cf(vol_cf, shift, h)
    return out, (vol_cf, shift)


def _warp_cf_bwd(h, res, g):
    """Production backward: the Pallas kernel (default).

    Measured warm on v5e at 80x96x112x3, halo 1, chained-probe timing:
    Pallas 2.1ms vs 4.0ms for the XLA shifted-slice formulation (1.9x).
    VXM_PALLAS_BWD=0 falls back to the XLA version (also the path taken on
    hosts without the TPU backend, where the forward itself only runs under
    the Pallas interpreter).
    """
    vol_cf, shift = res
    if os.environ.get("VXM_PALLAS_BWD", "1") == "0":
        return _warp_cf_bwd_ref(h, res, g)
    return _bwd_impl_pallas(vol_cf, shift, g, h)


def _warp_cf_bwd_ref(h, res, g):
    """Backward in plain jnp — the same shifted-slice identity, fused by XLA
    into scatter-free pad/slice loops:

      d vol[u]    = sum_o w_o(u - o) g(u - o)        (flipped-offset gather)
      d shift_d(x) = g(x) . sum_o (dw_o/dd_d)(x) vol[x + o]   (if not clamped)
    """
    vol_cf, shift = res
    nch, D, H, W = vol_cf.shape
    spatial = (D, H, W)
    p = h

    grid = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                    for s in spatial], indexing="ij"), -1)
    maxc = jnp.asarray([s - 1.0 for s in spatial])
    coords = jnp.clip(grid + shift, 0.0, maxc)
    d_eff = coords - grid
    interior = ((grid + shift) > 0.0) & ((grid + shift) < maxc)  # (*S, 3)

    pads3 = [(p, p)] * 3
    vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")

    tri = lambda d, o: jnp.maximum(0.0, 1.0 - jnp.abs(d - o))
    # derivative of the triangle kernel (sign convention: d/dd)
    dtri = lambda d, o: jnp.where(jnp.abs(d - o) < 1.0, -jnp.sign(d - o), 0.0)

    dvol = jnp.zeros_like(vol_cf)
    dshift = jnp.zeros_like(shift)
    sl = lambda arr, off: arr[tuple(
        [slice(None)] + [slice(p + o, p + o + s) for o, s in zip(off, spatial)])]

    for off in itertools.product(range(-h, h + 1), repeat=3):
        wz0 = tri(d_eff[..., 0], off[0])
        wy0 = tri(d_eff[..., 1], off[1])
        wx0 = tri(d_eff[..., 2], off[2])
        w = wz0 * wy0 * wx0

        # dvol[y] = sum_o (w_o * g)(y - o): zero-pad the weighted cotangent
        # and read it at the flipped offset (taps that land in the edge-pad
        # carry zero weight by construction, so nothing leaks).
        wg_p = jnp.pad(w[None] * g, [(0, 0)] + pads3)
        dvol = dvol + sl(wg_p, tuple(-o for o in off))

        tap = sl(vol_p, off)  # (C, *S)
        gv = jnp.sum(g * tap, axis=0)  # (*S)
        dshift = dshift + jnp.stack([
            gv * dtri(d_eff[..., 0], off[0]) * wy0 * wx0,
            gv * wz0 * dtri(d_eff[..., 1], off[1]) * wx0,
            gv * wz0 * wy0 * dtri(d_eff[..., 2], off[2]),
        ], -1)

    dshift = jnp.where(interior, dshift, 0.0)
    return dvol, dshift


_warp_bounded_cf.defvjp(_warp_cf_fwd, _warp_cf_bwd)


def warp_bounded(vol: jnp.ndarray, loc_shift: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Dense trilinear warp, valid when |loc_shift| <= halo element-wise.

    Drop-in for ops.warp.windowed_transform on TPU: vol (*S, C),
    loc_shift (*S, 3) -> (*S, C), edge-clamped sampling. Differentiable in
    both arguments (custom VJP).
    """
    assert loc_shift.shape[-1] == 3, "pallas warp kernel is 3-D only"
    vol_cf = jnp.moveaxis(vol, -1, 0).astype(jnp.float32)
    out_cf = _warp_bounded_cf(vol_cf, loc_shift.astype(jnp.float32), int(halo))
    return jnp.moveaxis(out_cf, 0, -1).astype(vol.dtype)
