#!/usr/bin/env python
"""Decompose the production kernel's time: window build | kernel | epilogue.

Dev tool for the Pallas retile work. Times, at the canonical integration
resolution, (a) the packed window stack construction alone, (b) the
pallas_call alone on a pre-built window stack, (c) the full production
warp_bounded path, and (d) the v3 tune variant for reference.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu  # noqa: F401
    from voxelmorph_tpu.ops import pallas_interp as P

    D, H, W = 80, 96, 112
    nch, h = 3, 1
    p = h
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((D, H, W, nch)).astype(np.float32))
    shift = jnp.asarray(np.clip(rng.standard_normal(
        (D, H, W, 3)) * 0.5, -h, h).astype(np.float32))
    vol_cf = jnp.moveaxis(vol, -1, 0)

    hwp = (H + 2 * p) * (W + 2 * p) * 4
    tz = P._pick_tz(D, h, hwp, n_win_ch=nch + 3, n_tmp=(2 * h + 1) ** 2 + nch + 8)
    grid = (D + tz - 1) // tz
    d_pad = grid * tz
    print(f"tz={tz} grid={grid}", flush=True)

    pads3 = [(p, p + (d_pad - D)), (p, p), (p, p)]

    @jax.jit
    def build_wins(vol_cf, shift):
        vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
        s_p = jnp.stack([jnp.pad(shift[..., a], pads3) for a in range(3)], 0)
        return P._window_stack(jnp.concatenate([vol_p, s_p], 0), tz, p, grid)

    wins = jax.block_until_ready(build_wins(vol_cf, shift))

    import jax.experimental.pallas as pl
    kernel = functools.partial(P._warp_kernel, h, tz, (D, H, W), nch)

    @jax.jit
    def call_only(wins):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, nch + 3, tz + 2 * p, H + 2 * p, W + 2 * p),
                                   lambda i: (i, 0, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, nch, tz, H, W),
                                   lambda i: (i, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, nch, tz, H, W), jnp.float32),
        )(wins)
        return jnp.sum(out[0, 0, ::32, ::32, ::32])

    @jax.jit
    def full(vol_cf, shift):
        out = P._warp_bounded_cf(vol_cf, shift, h)
        return jnp.sum(out[0, ::32, ::32, ::32])

    @jax.jit
    def wins_probe(vol_cf, shift):
        w = build_wins(vol_cf, shift)
        return jnp.sum(w[0, 0, ::32, ::32, ::32])

    def timeit(fn, *args, iters=20):
        for _ in range(3):
            jax.block_until_ready(fn(*args))
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = acc + fn(*args)
        float(acc)
        return (time.perf_counter() - t0) / iters * 1e3

    res = {
        "build_wins_ms": round(timeit(wins_probe, vol_cf, shift), 3),
        "kernel_only_ms": round(timeit(call_only, wins), 3),
        "full_ms": round(timeit(full, vol_cf, shift), 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
