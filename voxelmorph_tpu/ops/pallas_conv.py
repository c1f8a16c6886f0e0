"""Pallas TPU kernel for the U-Net's 3x3x3 SAME convolutions.

Why: XLA's TPU lowering of 3-D convs with voxelmorph's tiny channel counts
(2..48) tiles the volume spatially and lane-pads the channel dim to 128,
materializing multi-GB padded copies (measured: the bs2-bf16 train step's
backward holds a 3.63 GB copy at 4.0x padding + a 3.40 GB tile buffer for
ONE conv's weight gradient, and even the forward of a single full-res
48->32 conv carries 5.4 GB of temps). The whole-network effect is a U-Net
forward ~4.5x above its MXU co/128-utilization bound (PERF_BREAKDOWN_r04:
116 ms bf16 vs ~26 ms bound).

Design (channels-first, lane-FLATTENED im2col):

  * x rides CHANNELS-FIRST (ci, D, H, W): channels land on sublanes (8/16-
    granular — every voxelmorph width fits densely) instead of 128-padded
    lanes.
  * host side (free, HBM metadata / fused strided reads): zero-pad z,y,
    FLATTEN (H+2, W) into one lane axis, pad 1 lane each side, and
    window-stack overlapping (tz+2, (th+2)*W + 2) tiles — the proven v4
    pallas_interp BlockSpec layout (keeps Mosaic's double-buffered
    pipeline; in-kernel reshapes of tiled dims crash Mosaic, host-side
    flattening avoids them entirely).
  * in-kernel, every (dz, dy, dx) tap of an output plane is a STATIC
    lane-slice of the flattened row at offset dy*W + dx (adjacent-row
    bleed at the two x-boundary columns is zeroed with an iota mask),
    written into the im2col scratch P (27*ci, th*W).
  * ONE MXU matmul per output plane: Wmat (co, 27*ci) @ P (27*ci, th*W),
    K = 27*ci (54..1296), f32 accumulation, bias + LeakyReLU fused, write.

Utilization ceiling: co/128 on the MXU N dim (co = 16..32 -> 12.5..25%),
~4x today's measured end-to-end; HBM traffic ~1.3x(read x) + write y.

Backward: dx reuses the SAME kernel (taps flipped, kernel transposed
ci<->co — the transpose conv of a stride-1 SAME conv is itself a stride-1
SAME conv); the LeakyReLU derivative is recovered from the OUTPUT sign (the
activation is monotone), so the only residuals are (x, kernel, y). dw/db
fall back to XLA einsums over the 27 shifted volumes for now.

Reference behavior matched: flax nn.Conv(features, (3,3,3), SAME) as used
by voxelmorph's U-Net conv blocks (ref: tf/networks.py Unet conv_block,
kernel (3,3,3,ci,co) + bias + LeakyReLU(0.2)).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = os.environ.get("VXM_PALLAS_INTERPRET", "0") == "1"

# scoped-VMEM budget: window block + P scratch + out block (double-buffered
# blocks); headroom for Mosaic slack and plane temps
_BUDGET = int(11.5 * 1024 * 1024)


_FORCED = None  # process-local override: True/False beats the env var


def set_pallas_conv(enabled):
    """Force the conv-kernel dispatch on/off for this process (None = env).
    Takes effect at the next trace — callers re-jit after toggling."""
    global _FORCED
    _FORCED = enabled


def pallas_conv_enabled() -> bool:
    if _FORCED is not None:
        return _FORCED
    return os.environ.get("VXM_PALLAS_CONV", "0") == "1"


def _lanes(n: int) -> int:
    return -(-n // 128) * 128


def _sub(n: int, s: int) -> int:
    return -(-n // s) * s


def _footprint(ci, co, tz, th, W, in_bytes, out_bytes):
    L2 = (th + 2) * W + 2
    win = 2 * ci * (tz + 2) * _lanes(L2) * in_bytes
    P = _sub(27 * ci, 16) * _lanes(th * W) * in_bytes
    out = 2 * co * tz * _lanes(th * W) * out_bytes
    wmat = _sub(co, 16) * _lanes(27 * ci) * in_bytes
    temps = 6 * ci * _lanes(th * W) * 4  # tap temps, masks, f32 plane acc
    return win + P + out + wmat + temps


def _pick_tiles(ci, co, D, H, W, in_bytes, out_bytes):
    """(tz, th) ladder: largest footprint-fitting tiles dividing D and H."""
    for tz in (8, 4, 2, 1):
        if D % tz:
            continue
        for th in (32, 16, 8, 4):
            # th*W must be lane-aligned: Mosaic rejects the (co, th*W) ->
            # (1, co, 1, th*W) store cast when the lane extent is ragged
            # (hit at the deep U-Net levels, e.g. th=8, W=28)
            if H % th or (th * W) % 128:
                continue
            if _footprint(ci, co, tz, th, W, in_bytes, out_bytes) <= _BUDGET:
                return tz, th
    return None


def _window_stack_flat(xf2, tz, th, W, gz, gy):
    """(ci, D+2, (H+2)*W + 2) -> (gz*gy, ci, tz+2, (th+2)*W + 2) overlapping
    windows in (zi, yi) row-major order; XLA fuses the slice-stack into one
    strided read."""
    Lw = (th + 2) * W + 2
    rows = []
    for zi in range(gz):
        zs = jax.lax.dynamic_slice_in_dim(xf2, zi * tz, tz + 2, axis=1)
        for yi in range(gy):
            rows.append(jax.lax.dynamic_slice_in_dim(
                zs, yi * th * W, Lw, axis=2))
    return jnp.stack(rows, 0)


def _kernel(tz, th, W, ci, co, act_slope, out_dtype,
            win_ref, wmat_ref, bias_ref, out_ref, P):
    """One (z, y) tile: per-plane im2col via static lane slices + one MXU
    matmul.

    win_ref: (1, ci, tz+2, (th+2)*W + 2) zero-padded flattened window.
    wmat_ref: (co, 27*ci) packed weights, [dz, dy, dx, ci] row order.
    bias_ref: (co, 1).
    out_ref: (1, co, tz, th*W).
    P: (27*ci, th*W) VMEM scratch.
    """
    N = th * W
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % W

    def plane(zi, carry):
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    o = (dz * 3 + dy) * 3 + dx
                    # output flat pos j = y*W + w reads input flat pos
                    # j + dy*W + (dx-1); +1 for the host-side lane pre-pad
                    s0 = dy * W + dx
                    t = win_ref[0, :, zi + dz, s0:s0 + N]
                    if dx == 0:
                        t = jnp.where(lane >= 1, t, 0)
                    elif dx == 2:
                        t = jnp.where(lane <= W - 2, t, 0)
                    P[o * ci:(o + 1) * ci, :] = t
        acc = jax.lax.dot_general(
            wmat_ref[...], P[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (co, th*W)
        acc = acc + bias_ref[...].astype(jnp.float32)
        if act_slope is not None:
            acc = jnp.where(acc >= 0, acc, act_slope * acc)
        out_ref[0, :, zi, :] = acc.astype(out_dtype)
        return carry

    jax.lax.fori_loop(0, tz, plane, 0, unroll=True)


def _conv3_same_cf_fwd_impl(x_bcf, kernel, bias, act_slope, out_dtype):
    """Batched channels-first forward: (B, ci, D, H, W) -> (B, co, D, H, W).

    The batch is folded into the Pallas GRID (one (b, z, y) tile per grid
    step), not unrolled in Python: a Python unroll serializes B kernel
    launches per conv and measured 0.54x XLA at bs4 end-to-end
    (artifacts_r5/BENCH_trial_r05a.json) while the folded grid keeps the
    single-launch pipeline."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, ci, D, H, W = x_bcf.shape
    co = int(kernel.shape[-1])
    in_bytes = 2 if x_bcf.dtype == jnp.bfloat16 else 4
    out_dtype = out_dtype or x_bcf.dtype
    ob = 2 if jnp.dtype(out_dtype) == jnp.bfloat16 else 4
    tiles = _pick_tiles(ci, co, D, H, W, in_bytes, ob)
    if tiles is None:
        return None
    tz, th = tiles
    gz, gy = D // tz, H // th
    N = th * W

    xp = jnp.pad(x_bcf, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    xf2 = jnp.pad(xp.reshape(B, ci, D + 2, (H + 2) * W),
                  [(0, 0), (0, 0), (0, 0), (1, 1)])
    win = jnp.concatenate(
        [_window_stack_flat(xf2[b], tz, th, W, gz, gy) for b in range(B)], 0)
    # (3,3,3,ci,co) -> (co, 27*ci), row order [dz, dy, dx, ci]
    wmat = jnp.transpose(kernel, (4, 0, 1, 2, 3)).reshape(co, 27 * ci)
    wmat = wmat.astype(x_bcf.dtype)
    b2 = bias.reshape(co, 1)

    kfun = functools.partial(_kernel, tz, th, W, ci, co, act_slope, out_dtype)
    Lw = (th + 2) * W + 2
    out = pl.pallas_call(
        kfun,
        grid=(B * gz * gy,),
        in_specs=[
            pl.BlockSpec((1, ci, tz + 2, Lw), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((co, 27 * ci), lambda i: (0, 0)),
            pl.BlockSpec((co, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, co, tz, N), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * gz * gy, co, tz, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((27 * ci, N), x_bcf.dtype)],
        interpret=_INTERPRET,
    )(win, wmat, b2)
    # (B*gz*gy, co, tz, th*W) -> (B, co, D, H, W)
    out = out.reshape(B, gz, gy, co, tz, th, W)
    return jnp.transpose(out, (0, 3, 1, 4, 2, 5, 6)).reshape(B, co, D, H, W)


def _flip_transpose_kernel(kernel):
    """(3,3,3,ci,co) -> taps flipped, ci<->co: the dx-of-SAME-conv kernel."""
    return jnp.transpose(kernel[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3_block_cf(x_cf, kernel, bias, act_slope):
    out = _conv3_same_cf_fwd_impl(x_cf, kernel, bias, act_slope, None)
    assert out is not None
    return out


def _conv3_block_cf_fwd(x_cf, kernel, bias, act_slope):
    y = _conv3_block_cf(x_cf, kernel, bias, act_slope)
    return y, (x_cf, kernel, y)


def _conv3_block_cf_bwd(act_slope, res, g):
    x_bcf, kernel, y = res
    if act_slope is not None:
        # LeakyReLU is monotone with positive slopes: sign(y) == sign(preact)
        gf = jnp.where(y >= 0, g, jnp.asarray(act_slope, g.dtype) * g)
    else:
        gf = g
    B, ci, D, H, W = x_bcf.shape
    co = y.shape[1]
    # dx: transpose conv == SAME conv with flipped taps and ci<->co swapped
    dx = _conv3_same_cf_fwd_impl(
        gf, _flip_transpose_kernel(kernel),
        jnp.zeros((ci,), x_bcf.dtype), None, x_bcf.dtype)
    assert dx is not None
    # dw / db via XLA reductions: 27 shifted contractions over (B, vox).
    # Operands stay in the input dtype with f32 ACCUMULATION — explicit
    # .astype(f32) copies of full volumes OOM'd the f32 bs1 train step
    # (16.95G, BENCH_trial_r05a)
    xp = jnp.pad(x_bcf, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)])
    gflat = gf.reshape(B, co, -1)
    rows = []
    for dz in range(3):
        for dy in range(3):
            for dx_ in range(3):
                xs = jax.lax.dynamic_slice(
                    xp, (0, 0, dz, dy, dx_),
                    (B, ci, D, H, W)).reshape(B, ci, -1)
                rows.append(jax.lax.dot_general(
                    xs, gflat,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).sum(0))  # (ci, co)
    dw = jnp.stack(rows, 0).reshape(3, 3, 3, ci, co).astype(kernel.dtype)
    db = jnp.sum(gf, axis=(0, 2, 3, 4),
                 dtype=jnp.float32).astype(x_bcf.dtype)
    return dx, dw, db


_conv3_block_cf.defvjp(_conv3_block_cf_fwd, _conv3_block_cf_bwd)


def conv3_same_cf(x_bcf, kernel, bias, *, act_slope=0.2, out_dtype=None):
    """3x3x3 SAME conv + bias (+ LeakyReLU), batched channels-first.
    x_bcf: (B, ci, D, H, W); kernel: (3, 3, 3, ci, co) (flax HWIO layout);
    bias: (co,). Returns (B, co, D, H, W), differentiable.

    Returns None when the shape is ineligible (caller falls back to XLA).
    """
    B, ci, D, H, W = x_bcf.shape
    co = int(kernel.shape[-1])
    in_bytes = 2 if x_bcf.dtype == jnp.bfloat16 else 4
    ob = in_bytes if out_dtype is None else (
        2 if jnp.dtype(out_dtype) == jnp.bfloat16 else 4)
    if ci % 2 or _pick_tiles(ci, co, D, H, W, in_bytes, ob) is None:
        return None
    out = _conv3_block_cf(x_bcf, kernel.astype(x_bcf.dtype),
                          bias.astype(x_bcf.dtype), act_slope)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def conv3_same(x, kernel, bias, *, act_slope=0.2, out_dtype=None):
    """Batched channels-last wrapper: x (B, D, H, W, ci) -> (B, D, H, W, co).

    Transposes around the batched channels-first kernel (the batch rides
    the Pallas grid). Returns None when ineligible."""
    if x.ndim != 5 or tuple(kernel.shape[:3]) != (3, 3, 3):
        return None
    x_bcf = jnp.transpose(x, (0, 4, 1, 2, 3))
    o = conv3_same_cf(x_bcf, kernel, bias, act_slope=act_slope,
                      out_dtype=out_dtype)
    if o is None:
        return None
    return jnp.transpose(o, (0, 2, 3, 4, 1))


# ---------------------------------------------------------------------------
# All-XLA lean-memory conv VJP (no Pallas, no Mosaic)
#
# XLA's TPU conv-WEIGHT-gradient lowering tiles the activation into padded
# channel-minor buffers (measured 3.63G at 4.0x padding + 3.40G for ONE
# full-res conv at bs2-bf16 — the allocations that put the train step
# 261M over HBM). The dw of a stride-1 SAME conv is exactly 27 shifted
# (B*vox) dot-contractions, which XLA lowers as plain MXU dots with no
# such tiling. Forward and dx stay on XLA's conv (fast, memory-fine);
# only dw/db are rewritten. Enable with VXM_XLA_DW_EINSUM=1.


def xla_dw_einsum_enabled() -> bool:
    if _FORCED_DW is not None:
        return _FORCED_DW
    return os.environ.get("VXM_XLA_DW_EINSUM", "0") == "1"


_FORCED_DW = None


def set_xla_dw_einsum(enabled):
    global _FORCED_DW
    _FORCED_DW = enabled


def _xla_conv3_fwd_raw(x, kernel, bias, act_slope):
    nd = x.ndim - 2
    out = jax.lax.conv_general_dilated(
        x, kernel, (1,) * nd, "SAME",
        dimension_numbers=_dimnums(nd)) + bias
    if act_slope is not None:
        out = jnp.where(out >= 0, out, jnp.asarray(act_slope, out.dtype) * out)
    return out


def _dimnums(nd):
    sp = "DHW"[-nd:] if nd <= 3 else None
    return ("N" + sp + "C", sp + "IO", "N" + sp + "C")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3_same_lean_dw(x, kernel, bias, act_slope):
    """nn.Conv-equivalent k3 SAME conv (+bias, + optional LeakyReLU) whose
    dw is computed by shifted dot-contractions instead of XLA's conv
    weight-gradient. ND (1-3 spatial dims), channels-last."""
    return _xla_conv3_fwd_raw(x, kernel, bias, act_slope)


def _lean_fwd(x, kernel, bias, act_slope):
    y = conv3_same_lean_dw(x, kernel, bias, act_slope)
    return y, (x, kernel, y)


def _lean_bwd(act_slope, res, g):
    x, kernel, y = res
    nd = x.ndim - 2
    if act_slope is not None:
        # monotone activation: sign(y) == sign(preactivation)
        gf = jnp.where(y >= 0, g, jnp.asarray(act_slope, g.dtype) * g)
    else:
        gf = g
    # dx: transpose conv == SAME conv with flipped taps, ci<->co swapped
    flip = kernel[(slice(None, None, -1),) * nd]
    kt = jnp.swapaxes(flip, nd, nd + 1)
    dx = jax.lax.conv_general_dilated(
        gf, kt, (1,) * nd, "SAME", dimension_numbers=_dimnums(nd))
    # dw: one dot per tap over (batch, voxels); input-dtype operands with
    # f32 accumulation (no astype copies)
    B = x.shape[0]
    ci, co = x.shape[-1], kernel.shape[-1]
    ks = kernel.shape[:nd]
    pads = [(0, 0)] + [(k // 2, k // 2) for k in ks] + [(0, 0)]
    xp = jnp.pad(x, pads)
    gflat = gf.reshape(B, -1, co)
    taps = []
    for idx in np.ndindex(*ks):
        xs = jax.lax.dynamic_slice(
            xp, (0, *idx, 0), x.shape).reshape(B, -1, ci)
        taps.append(jax.lax.dot_general(
            xs, gflat, dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32))  # (ci, co)
    dw = jnp.stack(taps, 0).reshape(*ks, ci, co).astype(kernel.dtype)
    db = jnp.sum(gf, axis=tuple(range(x.ndim - 1)),
                 dtype=jnp.float32).astype(g.dtype)
    return dx, dw, db


conv3_same_lean_dw.defvjp(_lean_fwd, _lean_bwd)
