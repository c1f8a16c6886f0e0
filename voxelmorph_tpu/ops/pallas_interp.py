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

Kernel layout (v4; v2 measured ~30x the v1 Element-spec design)
---------------------------------------------------------------
The volume is processed in z-slabs. Operands that are read at halo offsets
are pre-windowed host-side into a (grid, C, TZ + 2p, H + 2p, W + 2p) array
of overlapping windows, so every pallas input/output uses plain
BLOCK-indexed specs. That matters on TPU: element-offset specs (the v1
design: `pl.Element` windows sharing their halo in HBM) disable Mosaic's
pipelined double-buffered DMA, serializing every window fetch behind the
compute; block specs restore the pipeline, and the window materialization
costs only an extra (tz+2p)/tz ~ 1.2-1.5x sequential read that XLA fuses
into one pass. v4: only operands actually read at offsets are windowed —
the forward windows just the volume channels, while the three displacement
components ride an ordinary unwindowed center block (halving the forward's
window VMEM + DMA and roughly doubling the admissible slab size tz, which
cuts the grid-step count and the window read amplification). The backward
still windows vol+g+shift (all are read at flipped offsets). Triangle
weights are computed ONCE per tap offset and applied to every channel (v1
recomputed them per channel). The y/x tap offsets are statically unrolled
into vector shifts — dynamic-start slices inside a fori_loop measured ~100x
slower on Mosaic.

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


def _bf16_window() -> bool:
    """bf16 forward window operand (VXM_PALLAS_BF16_WIN=1, A/B lab).

    The windowed volume is the kernel's dominant HBM term — at full-res
    halo=2/tz=2 the overlap makes it ~3x the volume, written once by the
    XLA window-stack pass and read once by the kernel DMA. Storing it bf16
    halves those bytes; taps are widened back to f32 in-kernel and the
    accumulate chain stays f32, so only the 8-bit-smaller tap mantissa is
    lost (images, not coordinates: the shift/weight math is untouched)."""
    return os.environ.get("VXM_PALLAS_BF16_WIN", "0") == "1"


def _bf16_shift() -> bool:
    """bf16 forward shift operand (VXM_PALLAS_BF16_SHIFT=1, A/B lab).

    In the single-channel full-res phase-warp the 3 displacement components
    are ~75% of the kernel's input bytes. bf16 storage halves them at a
    bounded coordinate cost: |shift| <= halo <= 2, so the bf16 rounding
    error is < 2^-8 of 2 = ~0.008 voxel, i.e. <1% of a trilinear weight —
    noise relative to the model's own flow error. Weight math runs f32 on
    the widened values."""
    return os.environ.get("VXM_PALLAS_BF16_SHIFT", "0") == "1"


def pallas_available() -> bool:
    """True when the TPU Pallas backend can run (not on CPU/interpreter)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Scoped-VMEM budgets for one kernel invocation, per kernel direction. The
# hardware stack limit is 16 MB; the gap absorbs Mosaic scheduling slack.
# Calibrated on TPU v5e via scripts/pallas_vmem_calibrate.py against the
# fori-over-oz kernels (the fully-unrolled predecessors overran the model
# ~4x because the scheduler kept every tap slice of the (2h+1)^3 unroll
# live at once). Boundary observations the budgets separate: bwd at
# (80,96,112) nch=3 halo=2 compiles at a modeled 8.9 MB, while fwd at
# (40,48,56) nch=4 halo=2 OOMs at a modeled 8.3 MB slab size.
_VMEM_BUDGET = {"fwd": int(7.5 * 1024 * 1024), "bwd": 9 * 1024 * 1024}


def _footprint(spatial, nch: int, halo: int, tz: int, mode: str) -> int:
    """Modeled scoped-VMEM bytes of one kernel grid step at slab size tz.

    Counts the Mosaic-double-buffered input window and output block plus the
    live (tz, H, W) f32 temporaries of the kernel body: the fori carry, the
    clamped-displacement fields, and one z-plane of the statically-unrolled
    (2h+1)^2 y/x tap terms with their weight intermediates (the z taps are
    sequential by construction; the backward holds two tap groups per
    plane — dvol and dshift — hence the 3x coefficient).

    v4: the forward windows ONLY the volume channels; the shift components
    ride an unwindowed center block (they are never read at a halo offset),
    so win_ch drops from nch+3 to nch and the 3 shift channels move to the
    center-block term. live_n for the forward is calibrated down to the
    measured liveness of the fori-carry accumulate chain (Mosaic retires
    each unrolled y/x tap's product into the carry; the old 2*(2h+1)^2
    charge modeled every tap staying live, which forced tz=2 at the
    canonical half-res shape and made per-grid-step overhead dominate —
    40 steps of 2 z-planes with a 2x window read amplification).
    """
    _, H, W = (int(s) for s in spatial)
    p = int(halo)
    n_off = 2 * p + 1
    hwp = (H + 2 * p) * (W + 2 * p) * 4
    hw = H * W * 4
    win_z = tz + 2 * p
    if mode == "fwd":
        # double-buffered: vol window + center shift block + center out block
        live_n = n_off + nch + 8
        return (2 * (nch * win_z * hwp + (nch + 3) * tz * hw)
                + live_n * tz * hw)
    win_ch, out_ch = 2 * nch + 3, nch + 3
    live_n = 3 * n_off ** 2 + 2 * nch + 16
    return (2 * (win_ch * win_z * hwp + out_ch * tz * hw)
            + live_n * tz * hw)


def _pick_tz(spatial, nch: int, halo: int, mode: str):
    """Largest z-slab size whose modeled footprint fits the VMEM budget,
    or None if even tz=1 does not fit (caller must fall back to XLA).

    VXM_PALLAS_TZ_FWD / VXM_PALLAS_TZ_BWD force a slab size (A/B lab use)."""
    d = int(spatial[0])
    env = os.environ.get(f"VXM_PALLAS_TZ_{mode.upper()}")
    if env:
        tz = int(env)
        return min(tz, d) if tz > 0 else None
    for tz in (16, 8, 4, 2, 1):
        if tz > d:
            continue
        if _footprint(spatial, nch, halo, tz, mode) <= _VMEM_BUDGET[mode]:
            break
    else:
        return None
    # Measured override (AB_tz_sweep_r04.txt): at the canonical full
    # resolution the analytic model is too conservative and forces tz=1,
    # but tz=2 compiles (scoped < 16M on v5e) and runs 5-32% faster
    # (h1: 6.10->5.82 ms, h2: 8.87->6.70 ms); tz>=4 exceeds the scoped
    # limit. Scoped strictly to the measured regime: forward kernel,
    # few-channel, halo<=2, plane size at/above the canonical 192x224.
    if (mode == "fwd" and tz == 1 and halo <= 2 and nch <= 4 and d >= 2
            and 192 * 224 <= int(spatial[1]) * int(spatial[2]) <= 256 * 256):
        tz = 2
    return tz


def kernel_vmem_fits(spatial, nch: int, halo: int, mode: str = "fwd") -> bool:
    """True when the kernel fits scoped VMEM at some slab size — evaluated
    with the same model and tz choice the kernels use, so the gate can never
    admit a configuration the launcher would then OOM. Many-channel volumes
    (e.g. SynthMorph's ~45-channel one-hot label maps) fall back to the XLA
    paths.

    mode 'fwd' (default) gates on the forward kernel only: the VJP falls
    back to the XLA shifted-slice backward on its own when its kernel does
    not fit (see ``_warp_cf_bwd``), so a fitting forward is always safe to
    dispatch — and inference (e.g. the full-resolution phase warp, where the
    backward never runs) would otherwise be blocked by the much larger
    backward footprint. mode 'both' additionally requires the VJP kernel,
    for callers that want the all-Pallas guarantee.
    """
    if len(spatial) != 3:
        return False
    # mirror of _warp_fwd_impl's dispatch order: v5 streaming kernel, then
    # the v4 2-D/1-D window layouts
    fwd_ok = ((_v5_enabled() and _v5_pick_tz(spatial, nch, halo) is not None)
              or _pick_tz(spatial, nch, halo, "fwd") is not None)
    if mode == "fwd":
        return fwd_ok
    return fwd_ok and _pick_tz(spatial, nch, halo, "bwd") is not None


def _window_stack(arr, tz: int, p: int, grid: int):
    """(C, d_pad + 2p, Hp, Wp) -> (grid, C, tz + 2p, Hp, Wp) overlapping
    windows; XLA fuses the slice-stack into one strided read."""
    return jnp.stack([
        jax.lax.dynamic_slice_in_dim(arr, i * tz, tz + 2 * p, axis=1)
        for i in range(grid)], 0)


def _window_stack2(arr, tz: int, th: int, p: int, gz: int, gy: int):
    """(C, d_pad + 2p, h_pad + 2p, Wp) -> (gz*gy, C, tz+2p, th+2p, Wp)
    overlapping (z, y) windows, stacked in (zi, yi) row-major order to match
    the 2-D grid's flattened index map i*gy + j."""
    rows = []
    for zi in range(gz):
        zs = jax.lax.dynamic_slice_in_dim(arr, zi * tz, tz + 2 * p, axis=1)
        for yi in range(gy):
            rows.append(jax.lax.dynamic_slice_in_dim(
                zs, yi * th, th + 2 * p, axis=2))
    return jnp.stack(rows, 0)


def _pick_th(H: int, mode: str = "fwd"):
    """Optional y-tile (VXM_PALLAS_TH_FWD / VXM_PALLAS_TH_BWD, A/B lab).

    None (default) keeps the v4 single-block-H layout. A y-tile th < H puts
    the kernel on a 2-D (z, y) grid: window VMEM shrinks by ~H/th, letting
    the z-slab tz grow within the same scoped budget, which cuts the window
    materialization's read amplification (tz+2p)/tz — the dominant HBM term
    at full resolution, where scoped VMEM forces tz<=2 with full-H blocks.
    For the backward it is what makes the kernel fit at full resolution AT
    ALL (full-H bwd windows need 14.4 MB at h=1 nch=1 vs the 9 MB budget)."""
    env = os.environ.get(f"VXM_PALLAS_TH_{mode.upper()}")
    if not env:
        return None
    th = int(env)
    return th if 0 < th < H else None


def _pick_th_bwd(H: int):
    return _pick_th(H, "bwd")


def _tri(d, o):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d - o))


def _dtri(d, o):
    return jnp.where(jnp.abs(d - o) < 1.0, -jnp.sign(d - o), 0.0)


def _lane_pad(w_center: int, p: int) -> int:
    """Extra right-pad so the window width (center + 2p) is a 128-lane
    multiple. Measured win on the v3 retile: aligned window DMAs. The pad
    columns carry zero shift (clamped coordinates stay in range, so no NaNs)
    and are cropped from the result; valid columns never read pad-region
    values of g/shift (zero-padded) beyond what the halo pad already
    implied."""
    return (-(w_center + 2 * p)) % 128


def _warp_kernel(h, tz, spatial, nch, ww, win_ref, shift_ref, out_ref):
    """One z-slab: accumulate the (2h+1)^3 shifted-slice terms in VMEM.

    win_ref: (1, nch, TZ+2p, H+2p, WW+2p) edge-padded volume window;
             WW = W + lane pad.
    shift_ref: (3, TZ, H, WW) displacement components, an UNWINDOWED center
             block at (0, i*TZ, 0, 0) — the shifts are only ever read at the
             window center, so windowing them (v3) wasted VMEM and DMA.
    out_ref: (nch, TZ, H, WW), block-placed at (0, i*TZ, 0, 0) of the
             (nch, D_pad, H, WW) result — no epilogue transpose.
    """
    import jax.experimental.pallas as pl

    D, H, W = spatial
    p = h
    n_off = 2 * h + 1
    i = pl.program_id(0)

    # effective per-axis displacement after clamping to the volume border;
    # |d_eff| <= h everywhere given the caller's |shift| <= h guard
    fiota = lambda d: jax.lax.broadcasted_iota(
        jnp.int32, (tz, H, ww), d).astype(jnp.float32)
    sref = lambda a: shift_ref[a].astype(jnp.float32)
    z_base = (i * tz).astype(jnp.float32) + fiota(0)
    dz = jnp.clip(z_base + sref(0), 0.0, D - 1.0) - z_base
    y_base = fiota(1)
    dy = jnp.clip(y_base + sref(1), 0.0, H - 1.0) - y_base
    x_base = fiota(2)
    dx = jnp.clip(x_base + sref(2), 0.0, W - 1.0) - x_base

    # The y/x offsets are statically unrolled into vector shifts (dynamic
    # lane/sublane-start slices measured ~100x slower on Mosaic), but the z
    # offset runs as a fori_loop with a dynamic z-start (z is the outer,
    # untiled axis, where dynamic starts are cheap): the sequential carry
    # bounds Mosaic's live set to ONE z-plane of taps. The fully-unrolled
    # (2h+1)^3 version let the scheduler keep every tap slice live at once
    # and overran the 16 MB scoped-VMEM stack (measured: 16.64M at halo=2,
    # 96x112 slabs, vs a 4.5M analytic model). The channel axis rides INSIDE
    # each accumulate (one (nch, tz, H, WW) op per tap) — measured ~35%
    # faster than per-channel accumulator ops.
    #
    # The tap sum factorizes EXACTLY into nested per-axis contractions —
    # sum_oz wz * [sum_oy wy * [sum_ox wx * v(x+o)]] — because each axis
    # weight depends only on the OUTPUT voxel, not the tap: this replaces
    # the per-tap 3-weight product ((2h+1)^3 of them) with (2h+1)^2 inner
    # x-contractions + (2h+1) y + 1 z, cutting slab-ops ~1.6x at h=1/nch=1
    # and ~2x at h=2, with a strictly smaller live set (two small carries
    # instead of per-tap weight products). VXM_PALLAS_FACTORED=0 restores
    # the per-tap form for A/B.
    wxs = [_tri(dx, float(ox)) for ox in range(-h, h + 1)]

    def oz_body_factored(ozi, acc):
        ozf = ozi.astype(jnp.float32) - float(h)
        wz = _tri(dz, ozf)
        a = jnp.zeros((nch, tz, H, ww), jnp.float32)
        for oy in range(-h, h + 1):
            wy = _tri(dy, float(oy))
            b = jnp.zeros((nch, tz, H, ww), jnp.float32)
            for ox in range(-h, h + 1):
                tap = win_ref[0, 0:nch, pl.ds(ozi, tz),
                              p + oy:p + oy + H,
                              p + ox:p + ox + ww].astype(jnp.float32)
                b = b + wxs[ox + h][None] * tap
            a = a + wy[None] * b
        return acc + wz[None] * a

    def oz_body(ozi, acc):
        # oz = ozi - h; window z-slice [p + oz, p + oz + tz) starts at ozi
        ozf = ozi.astype(jnp.float32) - float(h)
        wz = _tri(dz, ozf)
        for oy in range(-h, h + 1):
            wzy = wz * _tri(dy, float(oy))
            for ox in range(-h, h + 1):
                # weights once per offset, applied to every channel
                w = wzy * _tri(dx, float(ox))
                tap = win_ref[0, 0:nch, pl.ds(ozi, tz),
                              p + oy:p + oy + H,
                              p + ox:p + ox + ww].astype(jnp.float32)
                acc = acc + w[None] * tap
        return acc

    body = (oz_body if os.environ.get("VXM_PALLAS_FACTORED", "1") == "0"
            else oz_body_factored)
    acc = jax.lax.fori_loop(
        0, n_off, body, jnp.zeros((nch, tz, H, ww), jnp.float32))
    out_ref[...] = acc


def _warp_kernel_2d(h, tz, th, spatial, nch, ww,
                    win_ref, shift_ref, out_ref):
    """2-D (z, y) grid variant of ``_warp_kernel`` (VXM_PALLAS_TH_FWD lab).

    win_ref: (1, nch, TZ+2p, TH+2p, WW+2p) edge-padded volume window at
             flattened stack index i*gy + j.
    shift_ref / out_ref: (3 | nch, TZ, TH, WW) center blocks at
             (0, i*TZ, j*TH, 0). Same factored per-axis contraction and
             fori-over-z liveness bound as the 1-D kernel; only the y base
             coordinate and the block's y extent differ."""
    import jax.experimental.pallas as pl

    D, H, W = spatial
    p = h
    n_off = 2 * h + 1
    i = pl.program_id(0)
    j = pl.program_id(1)

    fiota = lambda d: jax.lax.broadcasted_iota(
        jnp.int32, (tz, th, ww), d).astype(jnp.float32)
    sref = lambda a: shift_ref[a].astype(jnp.float32)
    z_base = (i * tz).astype(jnp.float32) + fiota(0)
    dz = jnp.clip(z_base + sref(0), 0.0, D - 1.0) - z_base
    y_base = (j * th).astype(jnp.float32) + fiota(1)
    dy = jnp.clip(y_base + sref(1), 0.0, H - 1.0) - y_base
    x_base = fiota(2)
    dx = jnp.clip(x_base + sref(2), 0.0, W - 1.0) - x_base

    wxs = [_tri(dx, float(ox)) for ox in range(-h, h + 1)]

    def oz_body(ozi, acc):
        ozf = ozi.astype(jnp.float32) - float(h)
        wz = _tri(dz, ozf)
        a = jnp.zeros((nch, tz, th, ww), jnp.float32)
        for oy in range(-h, h + 1):
            wy = _tri(dy, float(oy))
            b = jnp.zeros((nch, tz, th, ww), jnp.float32)
            for ox in range(-h, h + 1):
                tap = win_ref[0, 0:nch, pl.ds(ozi, tz),
                              p + oy:p + oy + th,
                              p + ox:p + ox + ww].astype(jnp.float32)
                b = b + wxs[ox + h][None] * tap
            a = a + wy[None] * b
        return acc + wz[None] * a

    acc = jax.lax.fori_loop(
        0, n_off, oz_body, jnp.zeros((nch, tz, th, ww), jnp.float32))
    out_ref[...] = acc


def _warp_fwd_impl_2d(vol_cf, sz, sy, sx, h: int, tz: int, th: int):
    """2-D-grid forward launcher (A/B lab; see ``_pick_th``)."""
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    gz = (D + tz - 1) // tz
    gy = (H + th - 1) // th
    d_pad, h_pad = gz * tz, gy * th
    wpad = _lane_pad(W, p)
    ww = W + wpad

    pads3 = [(p, p + (d_pad - D)), (p, p + (h_pad - H)), (p, p + wpad)]
    vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
    if _bf16_window():
        vol_p = vol_p.astype(jnp.bfloat16)
    wins = _window_stack2(vol_p, tz, th, p, gz, gy)
    s_c = jnp.stack([
        jnp.pad(s, [(0, d_pad - D), (0, h_pad - H), (0, wpad)])
        for s in (sz, sy, sx)], 0)
    if _bf16_shift():
        s_c = s_c.astype(jnp.bfloat16)

    kernel = functools.partial(_warp_kernel_2d, h, tz, th, (D, H, W), nch, ww)
    out = pl.pallas_call(
        kernel,
        grid=(gz, gy),
        in_specs=[
            pl.BlockSpec((1, nch, tz + 2 * p, th + 2 * p, ww + 2 * p),
                         lambda i, j, gy=gy: (i * gy + j, 0, 0, 0, 0)),
            pl.BlockSpec((3, tz, th, ww), lambda i, j: (0, i, j, 0)),
        ],
        out_specs=pl.BlockSpec((nch, tz, th, ww),
                               lambda i, j: (0, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, d_pad, h_pad, ww), jnp.float32),
        interpret=_INTERPRET,
    )(wins, s_c)
    return out[:, :D, :H, :W]


def _warp_fwd_impl(vol_cf, sz, sy, sx, h: int):
    """vol_cf: (C, D, H, W) float32; s*: (D, H, W). Returns (C, D, H, W)."""
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    if _v5_enabled():
        tz5 = _v5_pick_tz((D, H, W), nch, h)
        if tz5 is not None:
            return _warp_fwd_impl_v5(vol_cf, sz, sy, sx, h, tz5)
    th = _pick_th(H)
    if th is not None:
        tz = _pick_tz((D, H, W), nch, h, "fwd") or 1
        return _warp_fwd_impl_2d(vol_cf, sz, sy, sx, h, tz, th)
    tz = _pick_tz((D, H, W), nch, h, "fwd")
    assert tz is not None, "caller must gate on kernel_vmem_fits"
    grid = (D + tz - 1) // tz
    d_pad = grid * tz  # pad D so every slab is full-size
    wpad = _lane_pad(W, p)
    ww = W + wpad

    pads3 = [(p, p + (d_pad - D)), (p, p), (p, p + wpad)]
    vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
    if _bf16_window():
        vol_p = vol_p.astype(jnp.bfloat16)
    wins = _window_stack(vol_p, tz, p, grid)
    # shifts ride an unwindowed center block: zero-pad to the padded grid
    # only (no halo) — clamped coordinates keep the pad region in range
    s_c = jnp.stack([jnp.pad(s, [(0, d_pad - D), (0, 0), (0, wpad)])
                     for s in (sz, sy, sx)], 0)
    if _bf16_shift():
        s_c = s_c.astype(jnp.bfloat16)

    kernel = functools.partial(_warp_kernel, h, tz, (D, H, W), nch, ww)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, nch, tz + 2 * p, H + 2 * p, ww + 2 * p),
                         lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((3, tz, H, ww), lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nch, tz, H, ww),
                               lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, d_pad, H, ww), jnp.float32),
        interpret=_INTERPRET,
    )(wins, s_c)
    return out[:, :D, :, :W]


# ------------------------------------------------- v5 streaming forward kernel
#
# The v4 layout's end-to-end cost is dominated not by the kernel body but by
# the HBM passes AROUND it (measured full-res h2: 6.7 ms ~ 75 GB/s actual
# traffic): the host-side window stack writes+reads (tz+2p)/tz x the volume,
# the shift components are pad-copied (3 channels = 3x the 1-ch volume!), and
# the lane-pad forces a crop copy of the output. v5 deletes every one of
# those passes:
#
#   * shift and out ride UNPADDED block specs (tz | D, no lane pad) — ZERO
#     copies for the largest input term and the output;
#   * the volume halo window is DMA'd manually (make_async_copy) from an
#     edge-padded copy in HBM (ANY memory space) into a 2-slot VMEM ring,
#     double-buffered across grid steps by hand — no window materialization
#     in HBM at all (the one remaining copy is the p-voxel edge pad of the
#     volume itself, 1 channel instead of v4's 3-channel shift pad);
#   * compute runs an inner fori over the tz output planes, so the live
#     temporaries are PLANE-sized, not slab-sized — which is what frees the
#     slab to grow to tz=4..16 (v4's slab-sized temporaries forced tz<=2 at
#     full resolution and made per-step overhead + window amplification
#     dominate).
#
# HBM traffic at full res h=2 tz=8 (1 ch): pad 2V + window DMA 1.25V +
# shift 3V + out V ~= 7.3V vs v4's ~18V. Taps are read from the VMEM ring at
# static y/x offsets (lane/sublane rolls) with the same factored per-axis
# contraction as v4.


def _v5_enabled() -> bool:
    """v5 streaming kernel dispatch — opt-in (VXM_PALLAS_V5=1).

    Real-chip status (artifacts_r5/V5_SMOKE_r05.json): forward is correct
    and 1.7x faster than v4 where it compiles (66 GB/s full-res halo-1),
    but the backward kernel returns wrong gradients (max err ~1.9 vs the
    XLA reference) and the halo-2 shapes fail the Mosaic remote compile.
    v4 stays the production dispatch until both are fixed."""
    return os.environ.get("VXM_PALLAS_V5", "0") == "1"


# Scoped-VMEM budget for the v5 launcher: explicit ring scratch + Mosaic's
# double-buffered shift/out blocks + plane-sized temporaries, against the
# 16 MB hardware stack. Headroom absorbs Mosaic slack.
_V5_BUDGET = int(13.5 * 1024 * 1024)


def _v5_lanes(n: int) -> int:
    return -(-n // 128) * 128


def _v5_sub(n: int, sub: int) -> int:
    return -(-n // sub) * sub


def _v5_ring_hw(H: int, W: int, p: int, sub: int):
    """Tile-aligned (Hp, Wp) for a DMA'd halo window of an (H, W) plane.

    Mosaic DMA requires the copied extents in the tiled dims to be aligned
    to the tiling — (sub, 128), sub = 8 for f32 / 16 for bf16 — so the
    HBM-side padded operand and the VMEM ring both carry these extents.
    """
    return _v5_sub(H + 2 * p, sub), _v5_lanes(W + 2 * p)


def _v5_footprint(spatial, nch: int, halo: int, tz: int) -> int:
    D, H, W = (int(s) for s in spatial)
    p = halo
    win_bytes = 4 if not _bf16_window() else 2
    sh_bytes = 4 if not _bf16_shift() else 2
    Hp, Wp = _v5_ring_hw(H, W, p, 16 if _bf16_window() else 8)
    ring = 2 * nch * (tz + 2 * p) * Hp * Wp * win_bytes
    shift = 2 * 3 * tz * H * _v5_lanes(W) * sh_bytes
    out = 2 * nch * tz * H * _v5_lanes(W) * 4
    # plane-sized live set: acc/a/b (nch each), dz/dy/dx, wxs+wys (2h+1 each),
    # iota bases and clip temps
    temps = (3 * nch + 3 + 2 * (2 * halo + 1) + 6) * H * _v5_lanes(W) * 4
    return ring + shift + out + temps


def _v5_pick_tz(spatial, nch: int, halo: int):
    """Largest tz dividing D whose v5 footprint fits; None -> v4/XLA path."""
    D = int(spatial[0])
    env = os.environ.get("VXM_PALLAS_V5_TZ")
    if env:
        tz = int(env)
        return tz if tz > 0 and D % tz == 0 else None
    for tz in (16, 8, 4, 2, 1):
        if D % tz == 0 and _v5_footprint(spatial, nch, halo, tz) <= _V5_BUDGET:
            return tz
    return None


def _v5_kernel(h, tz, spatial, nch, grid, vol_hbm, shift_ref, out_ref,
               win, sem):
    """One z-slab, v5: manual double-buffered window DMA + per-plane compute.

    vol_hbm: (nch, D+2p, Hp, Wp) edge-padded volume (H/W tile-aligned,
        see _v5_ring_hw), ANY (HBM) space.
    shift_ref: (3, TZ, H, W) center block (zero-copy — tz | D, no lane pad).
    out_ref: (nch, TZ, H, W) center block (zero-copy).
    win: (2, nch, TZ+2p, Hp, Wp) VMEM ring; sem: 2 DMA semaphores.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, H, W = spatial
    p = h
    i = pl.program_id(0)

    def dma(slot, step):
        return pltpu.make_async_copy(
            vol_hbm.at[:, pl.ds(step * tz, tz + 2 * p)],
            win.at[slot], sem.at[slot])

    # step 0 fills its own slot; every step prefetches the next window into
    # the other slot before waiting on its own — classic 2-slot pipeline.
    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < grid)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    slot = i % 2

    fiota = lambda d: jax.lax.broadcasted_iota(
        jnp.int32, (H, W), d).astype(jnp.float32)
    y0 = fiota(0)
    x0 = fiota(1)

    def plane(zi, carry):
        sz = shift_ref[0, zi].astype(jnp.float32)
        sy = shift_ref[1, zi].astype(jnp.float32)
        sx = shift_ref[2, zi].astype(jnp.float32)
        zf = (i * tz + zi).astype(jnp.float32)
        dz = jnp.clip(zf + sz, 0.0, D - 1.0) - zf
        dy = jnp.clip(y0 + sy, 0.0, H - 1.0) - y0
        dx = jnp.clip(x0 + sx, 0.0, W - 1.0) - x0
        wxs = [_tri(dx, float(ox)) for ox in range(-h, h + 1)]
        wys = [_tri(dy, float(oy)) for oy in range(-h, h + 1)]
        acc = jnp.zeros((nch, H, W), jnp.float32)
        for oz in range(2 * h + 1):
            wz = _tri(dz, float(oz - h))
            a = jnp.zeros((nch, H, W), jnp.float32)
            for oy in range(2 * h + 1):
                b = jnp.zeros((nch, H, W), jnp.float32)
                for ox in range(2 * h + 1):
                    tap = win[slot, 0:nch, zi + oz,
                              oy:oy + H, ox:ox + W].astype(jnp.float32)
                    b = b + wxs[ox][None] * tap
                a = a + wys[oy][None] * b
            acc = acc + wz[None] * a
        out_ref[:, zi] = acc
        return carry

    jax.lax.fori_loop(0, tz, plane, 0)


def _warp_fwd_impl_v5(vol_cf, sz, sy, sx, h: int, tz: int):
    """v5 launcher: vol_cf (C, D, H, W) f32, s*: (D, H, W) -> (C, D, H, W)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch, D, H, W = vol_cf.shape
    p = h
    grid = D // tz
    # DMA-aligned window extents: H+2p -> sublane tile, W+2p -> 128 lanes
    # (the slack rows/cols replicate the edge and are never read — taps only
    # touch [0, H+2p) x [0, W+2p))
    Hp, Wp = _v5_ring_hw(H, W, p, 16 if _bf16_window() else 8)
    vol_p = jnp.pad(vol_cf, [(0, 0), (p, p), (p, Hp - H - p), (p, Wp - W - p)],
                    mode="edge")
    if _bf16_window():
        vol_p = vol_p.astype(jnp.bfloat16)
    shift = jnp.stack([sz, sy, sx], 0)
    if _bf16_shift():
        shift = shift.astype(jnp.bfloat16)

    kernel = functools.partial(_v5_kernel, h, tz, (D, H, W), nch, grid)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, tz, H, W), lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nch, tz, H, W), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nch, tz + 2 * p, Hp, Wp), vol_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(vol_p, shift)


# ------------------------------------------------- v5 streaming backward pair
#
# The VJP splits into two independent kernels so each windows only what it
# reads at halo offsets (the v4 single-kernel backward packs vol+g+shift into
# one (2*nch+3)-channel window, whose VMEM footprint forces tiny slabs and
# whose HBM window materialization is the dominant cost):
#
#   dshift[x] = g(x) . sum_o (dw_o/dd)(x) vol[x + o]   — windows VOL only
#               (g, shift, and the 3 outputs ride zero-copy center blocks);
#   dvol[u]   = sum_o w_o(u - o) g(u - o)              — windows G and SHIFT
#               (two separate DMA rings; no host-side channel concat).
#
# Zero-padded g makes the flipped-offset taps self-masking (out-of-volume
# source positions contribute w * 0), the same identity the XLA reference
# backward uses — no validity mask needed. Compute runs the same per-plane
# inner fori as the v5 forward, keeping temporaries plane-sized.


def _v5_bwd_footprints(spatial, nch: int, halo: int, tz: int):
    D, H, W = (int(s) for s in spatial)
    p = halo
    lw = _v5_lanes(W)
    Hp, Wp = _v5_ring_hw(H, W, p, 8)
    ring = lambda ch: 2 * ch * (tz + 2 * p) * Hp * Wp * 4
    blk = lambda ch: 2 * ch * tz * H * lw * 4
    temps = (3 * nch + 20) * H * lw * 4
    dshift = ring(nch) + blk(nch) + blk(3) + blk(3) + temps
    dvol = ring(nch) + ring(3) + blk(nch) + temps
    return dshift, dvol


def _v5_pick_tz_bwd(spatial, nch: int, halo: int):
    """Largest tz dividing D with BOTH backward kernels in budget."""
    D = int(spatial[0])
    env = os.environ.get("VXM_PALLAS_V5_TZ_BWD")
    if env:
        tz = int(env)
        return tz if tz > 0 and D % tz == 0 else None
    for tz in (16, 8, 4, 2, 1):
        if D % tz == 0:
            ds, dv = _v5_bwd_footprints(spatial, nch, halo, tz)
            if max(ds, dv) <= _V5_BUDGET:
                return tz
    return None


def _v5_dshift_kernel(h, tz, spatial, nch, grid,
                      vol_hbm, g_ref, shift_ref, out_ref, win, sem):
    """dshift = g . d(warp)/d(shift): vol windowed, everything else centered.

    vol_hbm: (nch, D+2p, Hp, Wp) edge-padded, tile-aligned, ANY space.
    g_ref: (nch, TZ, H, W); shift_ref: (3, TZ, H, W) center blocks.
    out_ref: (3, TZ, H, W) — the three displacement cotangents.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, H, W = spatial
    p = h
    i = pl.program_id(0)

    def dma(slot, step):
        return pltpu.make_async_copy(
            vol_hbm.at[:, pl.ds(step * tz, tz + 2 * p)],
            win.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < grid)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    slot = i % 2

    fiota = lambda d: jax.lax.broadcasted_iota(
        jnp.int32, (H, W), d).astype(jnp.float32)
    y0 = fiota(0)
    x0 = fiota(1)

    def plane(zi, carry):
        sz = shift_ref[0, zi].astype(jnp.float32)
        sy = shift_ref[1, zi].astype(jnp.float32)
        sx = shift_ref[2, zi].astype(jnp.float32)
        zf = (i * tz + zi).astype(jnp.float32)
        dz = jnp.clip(zf + sz, 0.0, D - 1.0) - zf
        dy = jnp.clip(y0 + sy, 0.0, H - 1.0) - y0
        dx = jnp.clip(x0 + sx, 0.0, W - 1.0) - x0
        # zero gradient through a saturated clip
        in_z = ((zf + sz) > 0.0) & ((zf + sz) < D - 1.0)
        in_y = ((y0 + sy) > 0.0) & ((y0 + sy) < H - 1.0)
        in_x = ((x0 + sx) > 0.0) & ((x0 + sx) < W - 1.0)
        g0 = g_ref[:, zi].astype(jnp.float32)

        wxs = [(_tri(dx, float(ox)), _dtri(dx, float(ox)))
               for ox in range(-h, h + 1)]
        wys = [(_tri(dy, float(oy)), _dtri(dy, float(oy)))
               for oy in range(-h, h + 1)]
        dsz = jnp.zeros((H, W), jnp.float32)
        dsy = jnp.zeros((H, W), jnp.float32)
        dsx = jnp.zeros((H, W), jnp.float32)
        for oz in range(2 * h + 1):
            ozf = float(oz - h)
            wz, dwz = _tri(dz, ozf), _dtri(dz, ozf)
            for oy in range(2 * h + 1):
                wy, dwy = wys[oy]
                for ox in range(2 * h + 1):
                    wx, dwx = wxs[ox]
                    tap = win[slot, 0:nch, zi + oz,
                              oy:oy + H, ox:ox + W].astype(jnp.float32)
                    gv = jnp.sum(g0 * tap, axis=0)
                    dsz = dsz + gv * dwz * wy * wx
                    dsy = dsy + gv * wz * dwy * wx
                    dsx = dsx + gv * wz * wy * dwx
        out_ref[0, zi] = jnp.where(in_z, dsz, 0.0)
        out_ref[1, zi] = jnp.where(in_y, dsy, 0.0)
        out_ref[2, zi] = jnp.where(in_x, dsx, 0.0)
        return carry

    jax.lax.fori_loop(0, tz, plane, 0)


def _v5_dvol_kernel(h, tz, spatial, nch, grid,
                    g_hbm, s_hbm, out_ref, gwin, swin, gsem, ssem):
    """dvol[u] = sum_o w_o(u-o) g(u-o): g and shift windowed (flipped reads).

    g_hbm: (nch, D+2p, Hp, Wp) ZERO-padded cotangent, ANY space.
    s_hbm: (3, D+2p, Hp, Wp) ZERO-padded shift, ANY space.
    out_ref: (nch, TZ, H, W).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, H, W = spatial
    p = h
    i = pl.program_id(0)

    def dmas(slot, step):
        zsl = pl.ds(step * tz, tz + 2 * p)
        return (pltpu.make_async_copy(g_hbm.at[:, zsl], gwin.at[slot],
                                      gsem.at[slot]),
                pltpu.make_async_copy(s_hbm.at[:, zsl], swin.at[slot],
                                      ssem.at[slot]))

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < grid)
    def _():
        for d in dmas((i + 1) % 2, i + 1):
            d.start()

    for d in dmas(i % 2, i):
        d.wait()
    slot = i % 2

    fiota = lambda d: jax.lax.broadcasted_iota(
        jnp.int32, (H, W), d).astype(jnp.float32)
    y0 = fiota(0)
    x0 = fiota(1)

    def plane(zi, carry):
        zf = (i * tz + zi).astype(jnp.float32)
        acc = jnp.zeros((nch, H, W), jnp.float32)
        for oz in range(2 * h + 1):
            ozf = float(oz - h)
            # source position q = u - o; window row of q.z is zi + 2h - oz
            row = zi + 2 * h - oz
            zq = zf - ozf
            for oy in range(-h, h + 1):
                ys = p - oy
                yq = y0 - float(oy)
                for ox in range(-h, h + 1):
                    xs = p - ox
                    xq = x0 - float(ox)
                    szq = swin[slot, 0, row, ys:ys + H, xs:xs + W].astype(jnp.float32)
                    syq = swin[slot, 1, row, ys:ys + H, xs:xs + W].astype(jnp.float32)
                    sxq = swin[slot, 2, row, ys:ys + H, xs:xs + W].astype(jnp.float32)
                    dzq = jnp.clip(zq + szq, 0.0, D - 1.0) - zq
                    dyq = jnp.clip(yq + syq, 0.0, H - 1.0) - yq
                    dxq = jnp.clip(xq + sxq, 0.0, W - 1.0) - xq
                    w = (_tri(dzq, ozf) * _tri(dyq, float(oy))
                         * _tri(dxq, float(ox)))
                    gtap = gwin[slot, 0:nch, row,
                                ys:ys + H, xs:xs + W].astype(jnp.float32)
                    acc = acc + w[None] * gtap
        out_ref[:, zi] = acc
        return carry

    jax.lax.fori_loop(0, tz, plane, 0)


def _bwd_impl_v5(vol_cf, shift, g, h: int, tz: int):
    """v5 backward launcher: two streaming kernels, shared padded operands."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch, D, H, W = vol_cf.shape
    p = h
    grid = D // tz
    # DMA-aligned window extents (see _warp_fwd_impl_v5); backward rings are
    # always f32 -> sublane tile 8
    Hp, Wp = _v5_ring_hw(H, W, p, 8)
    pads3 = [(p, p), (p, Hp - H - p), (p, Wp - W - p)]

    s_cf = jnp.moveaxis(shift, -1, 0)  # (3, D, H, W)

    # dshift: vol edge-padded + windowed; g/shift/out zero-copy blocks
    vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
    ker = functools.partial(_v5_dshift_kernel, h, tz, (D, H, W), nch, grid)
    dshift_cf = pl.pallas_call(
        ker,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((nch, tz, H, W), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((3, tz, H, W), lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, tz, H, W), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nch, tz + 2 * p, Hp, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(vol_p, g, s_cf)

    # dvol: g and shift zero-padded + windowed; out zero-copy
    g_p = jnp.pad(g, [(0, 0)] + pads3)
    s_p = jnp.pad(s_cf, [(0, 0)] + pads3)
    ker = functools.partial(_v5_dvol_kernel, h, tz, (D, H, W), nch, grid)
    dvol = pl.pallas_call(
        ker,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((nch, tz, H, W), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nch, tz + 2 * p, Hp, Wp), jnp.float32),
            pltpu.VMEM((2, 3, tz + 2 * p, Hp, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(g_p, s_p)

    return dvol, jnp.moveaxis(dshift_cf, 0, -1)


# ------------------------------------------------------------ backward kernel

def _bwd_kernel(h, tz, spatial, nch, ww, win_ref, out_ref):
    """One z-slab of the warp VJP.

    win_ref: (1, 2*nch+3, TZ+2p, H+2p, WW+2p) packed window — channels
             [0, nch) the edge-padded volume, [nch, 2*nch) the zero-padded
             cotangent g, [2*nch, 2*nch+3) the zero-padded shift components;
             WW = W + lane pad.
    out_ref: (nch+3, TZ, H, WW), block-placed at (0, i*TZ, 0, 0) —
             [0, nch) dvol, [nch, nch+3) dshift.

      d vol[u]     = sum_o w_o(u - o) g(u - o)
      d shift_a(x) = [not clamped]_a(x) * sum_o (dw_o/dd_a)(x) vol[x + o] . g(x)

    The dvol terms slice every input at the FLIPPED offset and recompute the
    weights there (slab-sized temporaries only); the dshift terms use the
    slab-centered fields. y/x offsets are statically unrolled; triangle
    weights are computed once per offset and shared across channels (the
    channel axis rides inside each accumulate, like the forward kernel).
    """
    import jax.experimental.pallas as pl

    D, H, W = spatial
    p = h
    n_off = 2 * h + 1
    i = pl.program_id(0)
    cg = nch       # g channel base
    cs = 2 * nch   # shift channel base

    iota = lambda d: jax.lax.broadcasted_iota(jnp.int32, (tz, H, ww), d)
    z0 = (i * tz + iota(0)).astype(jnp.float32)
    y0 = iota(1).astype(jnp.float32)
    x0 = iota(2).astype(jnp.float32)

    ctr = lambda c: win_ref[0, c, p:p + tz, p:p + H, p:p + ww]
    sz0, sy0, sx0 = ctr(cs), ctr(cs + 1), ctr(cs + 2)
    dz0 = jnp.clip(z0 + sz0, 0.0, D - 1.0) - z0
    dy0 = jnp.clip(y0 + sy0, 0.0, H - 1.0) - y0
    dx0 = jnp.clip(x0 + sx0, 0.0, W - 1.0) - x0
    # clamp interior masks (zero gradient through a saturated clip)
    in_z = ((z0 + sz0) > 0.0) & ((z0 + sz0) < D - 1.0)
    in_y = ((y0 + sy0) > 0.0) & ((y0 + sy0) < H - 1.0)
    in_x = ((x0 + sx0) > 0.0) & ((x0 + sx0) < W - 1.0)
    g0 = win_ref[0, cg:cg + nch, p:p + tz, p:p + H, p:p + ww]

    zeros = lambda: jnp.zeros((tz, H, ww), jnp.float32)

    # z offsets as a fori_loop with dynamic z-starts, y/x statically unrolled
    # — same liveness-bounding structure as the forward kernel (see its note)
    def oz_body(ozi, carry):
        dvol, dsz, dsy, dsx = carry
        ozf = ozi.astype(jnp.float32) - float(h)
        # --- dvol: read everything at the flipped offset (y - o);
        # window z-slice [p - oz, p - oz + tz) starts at 2h - ozi ---
        zs = pl.ds(2 * h - ozi, tz)
        zq = z0 - ozf  # global z of the source position y - o
        for oy in range(-h, h + 1):
            for ox in range(-h, h + 1):
                ysl = slice(p - oy, p - oy + H)
                xsl = slice(p - ox, p - ox + ww)
                yq = y0 - float(oy)
                xq = x0 - float(ox)
                valid = ((zq >= 0.0) & (zq <= D - 1.0) & (yq >= 0.0)
                         & (yq <= H - 1.0) & (xq >= 0.0) & (xq <= W - 1.0))
                szq = win_ref[0, cs, zs, ysl, xsl]
                syq = win_ref[0, cs + 1, zs, ysl, xsl]
                sxq = win_ref[0, cs + 2, zs, ysl, xsl]
                dzq = jnp.clip(zq + szq, 0.0, D - 1.0) - zq
                dyq = jnp.clip(yq + syq, 0.0, H - 1.0) - yq
                dxq = jnp.clip(xq + sxq, 0.0, W - 1.0) - xq
                w = jnp.where(valid,
                              _tri(dzq, ozf) * _tri(dyq, float(oy))
                              * _tri(dxq, float(ox)), 0.0)
                dvol = dvol + w[None] * win_ref[0, cg:cg + nch, zs, ysl, xsl]

        # --- dshift: same-position weights, taps at + offset;
        # window z-slice [p + oz, p + oz + tz) starts at ozi ---
        zs2 = pl.ds(ozi, tz)
        wz, dwz = _tri(dz0, ozf), _dtri(dz0, ozf)
        for oy in range(-h, h + 1):
            wy, dwy = _tri(dy0, float(oy)), _dtri(dy0, float(oy))
            for ox in range(-h, h + 1):
                wx, dwx = _tri(dx0, float(ox)), _dtri(dx0, float(ox))
                ysl = slice(p + oy, p + oy + H)
                xsl = slice(p + ox, p + ox + ww)
                tap = win_ref[0, 0:nch, zs2, ysl, xsl]
                gv = jnp.sum(g0 * tap, axis=0)
                dsz = dsz + gv * dwz * wy * wx
                dsy = dsy + gv * wz * dwy * wx
                dsx = dsx + gv * wz * wy * dwx
        return (dvol, dsz, dsy, dsx)

    carry = jax.lax.fori_loop(
        0, n_off, oz_body,
        (jnp.zeros((nch, tz, H, ww), jnp.float32), zeros(), zeros(), zeros()))
    dvol, dsz, dsy, dsx = carry

    out_ref[0:nch] = dvol
    out_ref[nch] = jnp.where(in_z, dsz, 0.0)
    out_ref[nch + 1] = jnp.where(in_y, dsy, 0.0)
    out_ref[nch + 2] = jnp.where(in_x, dsx, 0.0)


def _bwd_kernel_2d(h, tz, th, spatial, nch, ww, win_ref, out_ref):
    """2-D (z, y) grid variant of ``_bwd_kernel`` (VXM_PALLAS_TH_BWD lab).

    Same packed-window layout and flipped-offset/dshift structure; the
    block's y extent is th and the y base coordinate comes from
    program_id(1). y-tiling shrinks the window ~H/th, which is what lets
    the backward fit scoped VMEM at the canonical full resolution (full-H
    blocks need 14.4 MB at h=1 nch=1 against the 9 MB budget)."""
    import jax.experimental.pallas as pl

    D, H, W = spatial
    p = h
    n_off = 2 * h + 1
    i = pl.program_id(0)
    j = pl.program_id(1)
    cg = nch
    cs = 2 * nch

    iota = lambda d: jax.lax.broadcasted_iota(jnp.int32, (tz, th, ww), d)
    z0 = (i * tz + iota(0)).astype(jnp.float32)
    y0 = (j * th + iota(1)).astype(jnp.float32)
    x0 = iota(2).astype(jnp.float32)

    ctr = lambda c: win_ref[0, c, p:p + tz, p:p + th, p:p + ww]
    sz0, sy0, sx0 = ctr(cs), ctr(cs + 1), ctr(cs + 2)
    dz0 = jnp.clip(z0 + sz0, 0.0, D - 1.0) - z0
    dy0 = jnp.clip(y0 + sy0, 0.0, H - 1.0) - y0
    dx0 = jnp.clip(x0 + sx0, 0.0, W - 1.0) - x0
    in_z = ((z0 + sz0) > 0.0) & ((z0 + sz0) < D - 1.0)
    in_y = ((y0 + sy0) > 0.0) & ((y0 + sy0) < H - 1.0)
    in_x = ((x0 + sx0) > 0.0) & ((x0 + sx0) < W - 1.0)
    g0 = win_ref[0, cg:cg + nch, p:p + tz, p:p + th, p:p + ww]

    zeros = lambda: jnp.zeros((tz, th, ww), jnp.float32)

    def oz_body(ozi, carry):
        dvol, dsz, dsy, dsx = carry
        ozf = ozi.astype(jnp.float32) - float(h)
        zs = pl.ds(2 * h - ozi, tz)
        zq = z0 - ozf
        for oy in range(-h, h + 1):
            for ox in range(-h, h + 1):
                ysl = slice(p - oy, p - oy + th)
                xsl = slice(p - ox, p - ox + ww)
                yq = y0 - float(oy)
                xq = x0 - float(ox)
                valid = ((zq >= 0.0) & (zq <= D - 1.0) & (yq >= 0.0)
                         & (yq <= H - 1.0) & (xq >= 0.0) & (xq <= W - 1.0))
                szq = win_ref[0, cs, zs, ysl, xsl]
                syq = win_ref[0, cs + 1, zs, ysl, xsl]
                sxq = win_ref[0, cs + 2, zs, ysl, xsl]
                dzq = jnp.clip(zq + szq, 0.0, D - 1.0) - zq
                dyq = jnp.clip(yq + syq, 0.0, H - 1.0) - yq
                dxq = jnp.clip(xq + sxq, 0.0, W - 1.0) - xq
                w = jnp.where(valid,
                              _tri(dzq, ozf) * _tri(dyq, float(oy))
                              * _tri(dxq, float(ox)), 0.0)
                dvol = dvol + w[None] * win_ref[0, cg:cg + nch, zs, ysl, xsl]

        zs2 = pl.ds(ozi, tz)
        wz, dwz = _tri(dz0, ozf), _dtri(dz0, ozf)
        for oy in range(-h, h + 1):
            wy, dwy = _tri(dy0, float(oy)), _dtri(dy0, float(oy))
            for ox in range(-h, h + 1):
                wx, dwx = _tri(dx0, float(ox)), _dtri(dx0, float(ox))
                ysl = slice(p + oy, p + oy + th)
                xsl = slice(p + ox, p + ox + ww)
                tap = win_ref[0, 0:nch, zs2, ysl, xsl]
                gv = jnp.sum(g0 * tap, axis=0)
                dsz = dsz + gv * dwz * wy * wx
                dsy = dsy + gv * wz * dwy * wx
                dsx = dsx + gv * wz * wy * dwx
        return (dvol, dsz, dsy, dsx)

    carry = jax.lax.fori_loop(
        0, n_off, oz_body,
        (jnp.zeros((nch, tz, th, ww), jnp.float32), zeros(), zeros(), zeros()))
    dvol, dsz, dsy, dsx = carry

    out_ref[0:nch] = dvol
    out_ref[nch] = jnp.where(in_z, dsz, 0.0)
    out_ref[nch + 1] = jnp.where(in_y, dsy, 0.0)
    out_ref[nch + 2] = jnp.where(in_x, dsx, 0.0)


def _bwd_impl_pallas_2d(vol_cf, shift, g, h: int, tz: int, th: int):
    """2-D-grid backward launcher (A/B lab; see ``_pick_th``)."""
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    gz = (D + tz - 1) // tz
    gy = (H + th - 1) // th
    d_pad, h_pad = gz * tz, gy * th
    wpad = _lane_pad(W, p)
    ww = W + wpad

    pads3 = [(p, p + (d_pad - D)), (p, p + (h_pad - H)), (p, p + wpad)]
    vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
    g_p = jnp.pad(g, [(0, 0)] + pads3)
    s_p = jnp.stack([jnp.pad(shift[..., a], pads3) for a in range(3)], 0)
    wins = _window_stack2(jnp.concatenate([vol_p, g_p, s_p], 0),
                          tz, th, p, gz, gy)

    kernel = functools.partial(_bwd_kernel_2d, h, tz, th, (D, H, W), nch, ww)
    out = pl.pallas_call(
        kernel,
        grid=(gz, gy),
        in_specs=[pl.BlockSpec(
            (1, 2 * nch + 3, tz + 2 * p, th + 2 * p, ww + 2 * p),
            lambda i, j, gy=gy: (i * gy + j, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((nch + 3, tz, th, ww),
                               lambda i, j: (0, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((nch + 3, d_pad, h_pad, ww),
                                       jnp.float32),
        interpret=_INTERPRET,
    )(wins)
    out = out[:, :D, :H, :W]
    dvol = out[:nch]
    dshift = jnp.moveaxis(out[nch:], 0, -1)
    return dvol, dshift


def _bwd_impl_pallas(vol_cf, shift, g, h: int):
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    th = _pick_th_bwd(H)
    if th is not None:
        tz = _pick_tz((D, H, W), nch, h, "bwd") or 1
        return _bwd_impl_pallas_2d(vol_cf, shift, g, h, tz, th)
    tz = _pick_tz((D, H, W), nch, h, "bwd")
    assert tz is not None, "caller must gate on kernel_vmem_fits"
    grid = (D + tz - 1) // tz
    d_pad = grid * tz
    wpad = _lane_pad(W, p)
    ww = W + wpad

    pads3 = [(p, p + (d_pad - D)), (p, p), (p, p + wpad)]
    vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
    g_p = jnp.pad(g, [(0, 0)] + pads3)
    s_p = jnp.stack([jnp.pad(shift[..., a], pads3) for a in range(3)], 0)
    wins = _window_stack(jnp.concatenate([vol_p, g_p, s_p], 0), tz, p, grid)

    kernel = functools.partial(_bwd_kernel, h, tz, (D, H, W), nch, ww)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(
            (1, 2 * nch + 3, tz + 2 * p, H + 2 * p, ww + 2 * p),
            lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((nch + 3, tz, H, ww),
                               lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch + 3, d_pad, H, ww), jnp.float32),
        interpret=_INTERPRET,
    )(wins)
    out = out[:, :D, :, :W]
    dvol = out[:nch]
    dshift = jnp.moveaxis(out[nch:], 0, -1)
    return dvol, dshift


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

    VXM_PALLAS_BWD=0 falls back to the XLA shifted-slice version (also the
    path taken on hosts without the TPU backend, where the forward itself
    only runs under the Pallas interpreter), as does any configuration whose
    backward kernel does not fit scoped VMEM — the forward-only dispatch
    gate (``kernel_vmem_fits`` mode 'fwd') admits those."""
    vol_cf, shift = res
    nch, D, H, W = vol_cf.shape
    if os.environ.get("VXM_PALLAS_BWD", "1") == "0":
        return _warp_cf_bwd_ref(h, res, g)
    if _v5_enabled():
        tz5 = _v5_pick_tz_bwd((D, H, W), nch, h)
        if tz5 is not None:
            return _bwd_impl_v5(vol_cf, shift, g, h, tz5)
    if (_pick_tz((D, H, W), nch, h, "bwd") is None
            and _pick_th_bwd(H) is None):
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

    tri = _tri
    dtri = _dtri

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
    # match the XLA paths' promotion (gather/windowed emit the promoted
    # dtype) so lax.switch branches agree when vol is bf16
    return jnp.moveaxis(out_cf, 0, -1).astype(
        jnp.promote_types(vol.dtype, loc_shift.dtype))
