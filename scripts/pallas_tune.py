#!/usr/bin/env python
"""A/B harness for bounded-warp Pallas kernel variants (dev tool).

Times forward-kernel candidates against the production kernel
(ops/pallas_interp.py) and the XLA shifted-slice path at the canonical
integration-resolution shape (80x96x112, 3 channels, halo 1). Correctness is
checked against ops.warp.windowed_transform on every run.

Run on TPU for timings; on CPU (JAX_PLATFORMS=cpu VXM_PALLAS_INTERPRET=1)
only the correctness checks are meaningful.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def tri(d, o):
    import jax.numpy as jnp
    return jnp.maximum(0.0, 1.0 - jnp.abs(d - o))


# --------------------------------------------------------------- variants

def fwd_v1_chanfused(vol_cf, sz, sy, sx, h, tz=None, interpret=False):
    """Channel-fused weights: triangle weights computed once per offset and
    applied to every channel (production kernel recomputes them per channel),
    z offsets statically unrolled (halo is 1 or 2 in practice)."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    tz = tz or 4
    grid = (D + tz - 1) // tz
    d_pad = grid * tz

    def kernel(vol_ref, sz_ref, sy_ref, sx_ref, out_ref):
        i = pl.program_id(0)
        fiota = lambda d: jax.lax.broadcasted_iota(
            jnp.int32, (tz, H, W), d).astype(jnp.float32)
        z0 = (i * tz).astype(jnp.float32) + fiota(0)
        dz = jnp.clip(z0 + sz_ref[...], 0.0, D - 1.0) - z0
        y0 = fiota(1)
        dy = jnp.clip(y0 + sy_ref[...], 0.0, H - 1.0) - y0
        x0 = fiota(2)
        dx = jnp.clip(x0 + sx_ref[...], 0.0, W - 1.0) - x0

        accs = [jnp.zeros((tz, H, W), jnp.float32) for _ in range(nch)]
        for oz in range(-h, h + 1):
            wz = tri(dz, float(oz))
            for oy in range(-h, h + 1):
                wzy = wz * tri(dy, float(oy))
                for ox in range(-h, h + 1):
                    w = wzy * tri(dx, float(ox))
                    for c in range(nch):
                        tap = vol_ref[c, p + oz:p + oz + tz,
                                      p + oy:p + oy + H, p + ox:p + ox + W]
                        accs[c] = accs[c] + w * tap
        for c in range(nch):
            out_ref[c] = accs[c]

    pads = [(0, 0), (p, p + (d_pad - D)), (p, p), (p, p)]
    vol_p = jnp.pad(vol_cf, pads, mode="edge")
    spads = [(0, d_pad - D), (0, 0), (0, 0)]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((pl.Element(nch), pl.Element(tz + 2 * p),
                          pl.Element(H + 2 * p), pl.Element(W + 2 * p)),
                         lambda i: (0, i * tz, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nch, tz, H, W), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, d_pad, H, W), jnp.float32),
        interpret=interpret,
    )(vol_p, jnp.pad(sz, spads), jnp.pad(sy, spads), jnp.pad(sx, spads))
    return out[:, :D]


def fwd_v2_lanes128(vol_cf, sz, sy, sx, h, tz=None, interpret=False):
    """v1 + lane alignment: W padded host-side to a multiple of 128 so every
    vector op runs on full aligned lane tiles (112 -> 128); the input's halo
    lives INSIDE the padded width (p + W + p <= Wp), so tap slices stay
    within one aligned buffer."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    tz = tz or 4
    grid = (D + tz - 1) // tz
    d_pad = grid * tz
    Wp = ((W + 2 * p + 127) // 128) * 128

    def kernel(vol_ref, sz_ref, sy_ref, sx_ref, out_ref):
        i = pl.program_id(0)
        fiota = lambda d: jax.lax.broadcasted_iota(
            jnp.int32, (tz, H, Wp), d).astype(jnp.float32)
        z0 = (i * tz).astype(jnp.float32) + fiota(0)
        dz = jnp.clip(z0 + sz_ref[...], 0.0, D - 1.0) - z0
        y0 = fiota(1)
        dy = jnp.clip(y0 + sy_ref[...], 0.0, H - 1.0) - y0
        # x grid offset by -p: the shift arrays are embedded at x in [p, p+W)
        x0 = fiota(2) - float(p)
        dx = jnp.clip(x0 + sx_ref[...], 0.0, W - 1.0) - x0

        accs = [jnp.zeros((tz, H, Wp), jnp.float32) for _ in range(nch)]
        for oz in range(-h, h + 1):
            wz = tri(dz, float(oz))
            for oy in range(-h, h + 1):
                wzy = wz * tri(dy, float(oy))
                for ox in range(-h, h + 1):
                    w = wzy * tri(dx, float(ox))
                    for c in range(nch):
                        # x slice: shift by ox around the embedded origin p
                        tap = jnp.roll(
                            vol_ref[c, p + oz:p + oz + tz,
                                    p + oy:p + oy + H, :], -ox, axis=-1)
                        accs[c] = accs[c] + w * tap
        for c in range(nch):
            out_ref[c] = accs[c]

    # embed x in [p, p+W) of an aligned Wp buffer (edge values replicated)
    pads = [(0, 0), (p, p + (d_pad - D)), (p, p), (p, Wp - W - p)]
    vol_p = jnp.pad(vol_cf, pads, mode="edge")
    spads = [(0, d_pad - D), (0, 0), (p, Wp - W - p)]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((pl.Element(nch), pl.Element(tz + 2 * p),
                          pl.Element(H + 2 * p), pl.Element(Wp)),
                         lambda i: (0, i * tz, 0, 0)),
            pl.BlockSpec((tz, H, Wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, Wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((tz, H, Wp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nch, tz, H, Wp), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, d_pad, H, Wp), jnp.float32),
        interpret=interpret,
    )(vol_p, jnp.pad(sz, spads), jnp.pad(sy, spads), jnp.pad(sx, spads))
    return out[:, :D, :, p:p + W]


def fwd_v3_blockgrid(vol_cf, sz, sy, sx, h, tz=None, interpret=False):
    """v1 with BLOCK-index specs (no pl.Element): the input is pre-padded so
    each grid step's window is a disjoint block of a strided copy — trades
    one host-side gather (cheap XLA reshuffle) for Mosaic's pipelined
    double-buffered DMA, which Element-indexed specs disable."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    nch, D, H, W = vol_cf.shape
    p = h
    tz = tz or 4
    grid = (D + tz - 1) // tz
    d_pad = grid * tz
    win_z = tz + 2 * p

    pads = [(0, 0), (p, p + (d_pad - D)), (p, p), (p, p)]
    vol_p = jnp.pad(vol_cf, pads, mode="edge")
    # materialize per-slab overlapping windows: (grid, C, win_z, H+2p, W+2p)
    wins = jnp.stack([
        jax.lax.dynamic_slice_in_dim(vol_p, i * tz, win_z, axis=1)
        for i in range(grid)], 0)
    spads = [(0, d_pad - D), (0, 0), (0, 0)]

    def kernel(vol_ref, sz_ref, sy_ref, sx_ref, out_ref):
        i = pl.program_id(0)
        fiota = lambda d: jax.lax.broadcasted_iota(
            jnp.int32, (tz, H, W), d).astype(jnp.float32)
        z0 = (i * tz).astype(jnp.float32) + fiota(0)
        dz = jnp.clip(z0 + sz_ref[0], 0.0, D - 1.0) - z0
        y0 = fiota(1)
        dy = jnp.clip(y0 + sy_ref[0], 0.0, H - 1.0) - y0
        x0 = fiota(2)
        dx = jnp.clip(x0 + sx_ref[0], 0.0, W - 1.0) - x0

        accs = [jnp.zeros((tz, H, W), jnp.float32) for _ in range(nch)]
        for oz in range(-h, h + 1):
            wz = tri(dz, float(oz))
            for oy in range(-h, h + 1):
                wzy = wz * tri(dy, float(oy))
                for ox in range(-h, h + 1):
                    w = wzy * tri(dx, float(ox))
                    for c in range(nch):
                        tap = vol_ref[0, c, p + oz:p + oz + tz,
                                      p + oy:p + oy + H, p + ox:p + ox + W]
                        accs[c] = accs[c] + w * tap
        for c in range(nch):
            out_ref[c] = accs[c]

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, nch, win_z, H + 2 * p, W + 2 * p),
                         lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, tz, H, W), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, tz, H, W), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, tz, H, W), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nch, tz, H, W), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, d_pad, H, W), jnp.float32),
        interpret=interpret,
    )(wins,
      jnp.pad(sz, spads).reshape(grid, tz, H, W),
      jnp.pad(sy, spads).reshape(grid, tz, H, W),
      jnp.pad(sx, spads).reshape(grid, tz, H, W))
    return out[:, :D]


VARIANTS = {
    "v1_chanfused": fwd_v1_chanfused,
    "v2_lanes128": fwd_v2_lanes128,
    "v3_blockgrid": fwd_v3_blockgrid,
}


# --------------------------------------------------------------- harness

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=3, default=[80, 96, 112])
    p.add_argument("--nch", type=int, default=3)
    p.add_argument("--halo", type=int, default=1)
    p.add_argument("--tz", type=int, nargs="+", default=[4, 8])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--variants", nargs="+", default=sorted(VARIANTS))
    p.add_argument("--check-only", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu  # noqa: F401  (compile cache)
    from voxelmorph_tpu.ops import pallas_interp
    from voxelmorph_tpu.ops import warp as warp_ops

    interpret = jax.default_backend() != "tpu"
    D, H, W = args.shape
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((D, H, W, args.nch)).astype(np.float32))
    shift = jnp.asarray(np.clip(rng.standard_normal(
        (D, H, W, 3)) * 0.5, -args.halo, args.halo).astype(np.float32))
    vol_cf = jnp.moveaxis(vol, -1, 0)
    sz, sy, sx = shift[..., 0], shift[..., 1], shift[..., 2]

    ref = np.asarray(warp_ops.windowed_transform(vol, shift, args.halo))
    voxels = float(D * H * W)
    traffic = voxels * 4 * (args.nch * 2 + 3)

    # IMPORTANT: every timed fn takes its operands as real jit ARGUMENTS.
    # Zero-arg closures embed the volumes as compile-time constants, and the
    # resulting timings are artifacts (measured 20-600x off on the tunneled
    # backend) — see scripts/pallas_probe.py.
    def timeit(fn, *fargs):
        for _ in range(3):
            jax.block_until_ready(fn(*fargs))
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = acc + jnp.sum(fn(*fargs)[0, ::32, ::32, ::32])
        float(acc)
        return (time.perf_counter() - t0) / args.iters

    results = {}
    # production baselines
    if pallas_interp.pallas_available() or interpret:
        f = jax.jit(lambda vc, s: pallas_interp._warp_bounded_cf(vc, s, args.halo))
        out = np.asarray(jnp.moveaxis(f(vol_cf, shift), 0, -1))
        err = float(np.max(np.abs(out - ref)))
        assert err < 1e-4, f"production kernel mismatch {err}"
        if not args.check_only:
            t = timeit(f, vol_cf, shift)
            results["prod"] = {"ms": round(t * 1e3, 3),
                               "gbps": round(traffic / t / 1e9, 1)}
    g = jax.jit(lambda v, s: jnp.moveaxis(
        warp_ops.windowed_transform(v, s, args.halo), -1, 0))
    if not args.check_only:
        t = timeit(g, vol, shift)
        results["xla_slices"] = {"ms": round(t * 1e3, 3),
                                 "gbps": round(traffic / t / 1e9, 1)}

    for name in args.variants:
        fn = VARIANTS[name]
        for tz in args.tz:
            impl = jax.jit(functools.partial(
                fn, h=args.halo, tz=tz, interpret=interpret))
            key = f"{name}_tz{tz}"
            try:
                out = np.asarray(jnp.moveaxis(impl(vol_cf, sz, sy, sx), 0, -1))
                err = float(np.max(np.abs(out - ref)))
                if err > 1e-4:
                    results[key] = f"WRONG: max err {err:.2e}"
                    continue
                if args.check_only:
                    results[key] = "ok"
                    continue
                t = timeit(impl, vol_cf, sz, sy, sx)
                results[key] = {"ms": round(t * 1e3, 3),
                                "gbps": round(traffic / t / 1e9, 1)}
            except Exception as e:
                results[key] = f"failed: {type(e).__name__}: {str(e)[:120]}"
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
