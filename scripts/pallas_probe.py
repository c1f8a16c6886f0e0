#!/usr/bin/env python
"""Decompose the production kernel's time: window build | kernel | epilogue.

Dev tool for the Pallas kernel work. Times, at the canonical integration
resolution (80x96x112x3), (a) the packed window-stack construction alone,
(b) the pallas_call alone on a pre-built window stack, (c) the full
production warp_bounded path, and (d) the XLA windowed fallback — so kernel
optimization targets the component that actually dominates. Pass --halo to
probe the tiered variants the adaptive VecInt dispatch uses.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--halo", type=int, default=1)
    ap.add_argument("--shape", type=int, nargs=3, default=[80, 96, 112])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu  # noqa: F401  (enables the compile cache)
    from voxelmorph_tpu.ops import pallas_interp as P
    from voxelmorph_tpu.ops.warp import windowed_transform

    D, H, W = args.shape
    nch, h = 3, args.halo
    p = h
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((D, H, W, nch)).astype(np.float32))
    shift = jnp.asarray(np.clip(rng.standard_normal(
        (D, H, W, 3)) * 0.5 * h, -h, h).astype(np.float32))
    vol_cf = jnp.moveaxis(vol, -1, 0)

    tz = P._pick_tz((D, H, W), nch, h, "fwd")
    assert tz is not None, "config does not fit the VMEM gate"
    grid = (D + tz - 1) // tz
    d_pad = grid * tz
    wpad = P._lane_pad(W, p)
    ww = W + wpad
    print(f"tz={tz} grid={grid} ww={ww}", flush=True)

    pads3 = [(p, p + (d_pad - D)), (p, p), (p, p + wpad)]

    @jax.jit
    def build_wins(vol_cf, shift):
        vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
        wins = P._window_stack(vol_p, tz, p, grid)
        s_c = jnp.stack([jnp.pad(shift[..., a],
                                 [(0, d_pad - D), (0, 0), (0, wpad)])
                         for a in range(3)], 0)
        return wins, s_c

    wins, s_c = jax.block_until_ready(build_wins(vol_cf, shift))

    import jax.experimental.pallas as pl
    kernel = functools.partial(P._warp_kernel, h, tz, (D, H, W), nch, ww)

    @jax.jit
    def call_only(wins, s_c):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, nch, tz + 2 * p, H + 2 * p, ww + 2 * p),
                             lambda i: (i, 0, 0, 0, 0)),
                pl.BlockSpec((3, tz, H, ww), lambda i: (0, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nch, tz, H, ww), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nch, d_pad, H, ww), jnp.float32),
            interpret=P._INTERPRET,
        )(wins, s_c)

    @jax.jit
    def full(vol, shift):
        return P.warp_bounded(vol, shift, h)

    @jax.jit
    def xla_windowed(vol, shift):
        return windowed_transform(vol, shift, h)

    def timeit(fn, *a, iters=args.iters):
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    vol_b = D * H * W * 4
    useful_mb = vol_b * (nch + 3 + nch) / 1e6  # read vol+shift, write out
    res = {
        "halo": h, "shape": [D, H, W], "tz": tz, "ww": ww,
        "build_wins_ms": round(timeit(build_wins, vol_cf, shift), 3),
        "kernel_only_ms": round(timeit(call_only, wins, s_c), 3),
        "full_ms": round(timeit(full, vol, shift), 3),
        "xla_windowed_ms": round(timeit(xla_windowed, vol, shift), 3),
    }
    res["kernel_only_gbps"] = round(useful_mb / res["kernel_only_ms"], 1)
    res["full_gbps"] = round(useful_mb / res["full_ms"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
