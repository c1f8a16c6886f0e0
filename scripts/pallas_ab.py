#!/usr/bin/env python
"""A/B lab for bounded-warp kernel variants (dev tool for the perf push).

Times, at the canonical integration resolution (80,96,112,3ch) halo=1:
  prod        the production kernel via warp_bounded (fori z taps)
  split       window-build vs pallas_call-only decomposition of prod
  unroll      variant A: statically unrolled z taps (no fori, h=1 only)
  fusedch     variant B: channel axis folded into the accumulate ops
  lanepad     variant C: W padded to a 128 multiple inside the window
              (compute on aligned lanes, crop in the epilogue)

Every variant is checked against the production output (max |diff|) before
being timed, so a fast-but-wrong layout can't masquerade as a win.
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
    import jax.experimental.pallas as pl
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

    res = {}

    def timeit(fn, *args, iters=30):
        for _ in range(3):
            jax.block_until_ready(fn(*args))
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = acc + fn(*args)
        float(acc)
        return round((time.perf_counter() - t0) / iters * 1e3, 3)

    # ---- production reference -------------------------------------------
    ref_out = P._warp_bounded_cf(vol_cf, shift, h)

    @jax.jit
    def prod(vol_cf, shift):
        out = P._warp_bounded_cf(vol_cf, shift, h)
        return jnp.sum(out[0, ::32, ::32, ::32])

    res["prod_ms"] = timeit(prod, vol_cf, shift)

    # ---- split: window build vs kernel-only ------------------------------
    tz = P._pick_tz((D, H, W), nch, h, "fwd")
    grid = (D + tz - 1) // tz
    d_pad = grid * tz
    pads3 = [(p, p + (d_pad - D)), (p, p), (p, p)]
    res["tz"] = tz

    @jax.jit
    def build_wins(vol_cf, shift):
        vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3, mode="edge")
        s_p = jnp.stack([jnp.pad(shift[..., a], pads3) for a in range(3)], 0)
        return P._window_stack(jnp.concatenate([vol_p, s_p], 0), tz, p, grid)

    wins = jax.block_until_ready(build_wins(vol_cf, shift))

    @jax.jit
    def wins_probe(vol_cf, shift):
        w = build_wins(vol_cf, shift)
        return jnp.sum(w[0, 0, ::16, ::16, ::16])

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

    res["build_wins_ms"] = timeit(wins_probe, vol_cf, shift)
    res["kernel_only_ms"] = timeit(call_only, wins)

    # ---- variant A: static unroll of the z taps --------------------------
    def kernel_unroll(tz, win_ref, out_ref):
        i = pl.program_id(0)
        fiota = lambda d: jax.lax.broadcasted_iota(
            jnp.int32, (tz, H, W), d).astype(jnp.float32)
        ctr = lambda c: win_ref[0, c, p:p + tz, p:p + H, p:p + W]
        z_base = (i * tz).astype(jnp.float32) + fiota(0)
        dz = jnp.clip(z_base + ctr(nch), 0.0, D - 1.0) - z_base
        dy = jnp.clip(fiota(1) + ctr(nch + 1), 0.0, H - 1.0) - fiota(1)
        dx = jnp.clip(fiota(2) + ctr(nch + 2), 0.0, W - 1.0) - fiota(2)
        tri = P._tri
        accs = [jnp.zeros((tz, H, W), jnp.float32) for _ in range(nch)]
        for oz in range(-h, h + 1):
            wz = tri(dz, float(oz))
            for oy in range(-h, h + 1):
                wzy = wz * tri(dy, float(oy))
                for ox in range(-h, h + 1):
                    w = wzy * tri(dx, float(ox))
                    for c in range(nch):
                        accs[c] = accs[c] + w * win_ref[
                            0, c, p + oz:p + oz + tz,
                            p + oy:p + oy + H, p + ox:p + ox + W]
        for c in range(nch):
            out_ref[0, c] = accs[c]

    def run_variant(name, kfn, tz_v, win_ch=nch + 3, wpad=0):
        grid_v = (D + tz_v - 1) // tz_v
        d_pad_v = grid_v * tz_v
        pads3_v = [(p, p + (d_pad_v - D)), (p, p), (p, p + wpad)]

        @jax.jit
        def full(vol_cf, shift):
            vol_p = jnp.pad(vol_cf, [(0, 0)] + pads3_v, mode="edge")
            s_p = jnp.stack([jnp.pad(shift[..., a], pads3_v)
                             for a in range(3)], 0)
            wins = P._window_stack(
                jnp.concatenate([vol_p, s_p], 0), tz_v, p, grid_v)
            out = pl.pallas_call(
                functools.partial(kfn, tz_v),
                grid=(grid_v,),
                in_specs=[pl.BlockSpec(
                    (1, win_ch, tz_v + 2 * p, H + 2 * p, W + 2 * p + wpad),
                    lambda i: (i, 0, 0, 0, 0))],
                out_specs=pl.BlockSpec((1, nch, tz_v, H, W + wpad),
                                       lambda i: (i, 0, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (grid_v, nch, tz_v, H, W + wpad), jnp.float32),
            )(wins)
            out = out.transpose(1, 0, 2, 3, 4).reshape(
                nch, d_pad_v, H, W + wpad)[:, :D, :, :W]
            return out

        try:
            got = jax.block_until_ready(full(vol_cf, shift))
            err = float(jnp.max(jnp.abs(got - ref_out)))
            if err > 1e-4:
                res[name] = f"WRONG: max|diff|={err:.2e}"
                return

            @jax.jit
            def timed(vol_cf, shift):
                return jnp.sum(full(vol_cf, shift)[0, ::32, ::32, ::32])

            res[name] = timeit(timed, vol_cf, shift)
        except Exception as e:
            res[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"

    run_variant("unroll_ms", kernel_unroll, tz)
    run_variant("unroll_tz8_ms", kernel_unroll, 8)

    # ---- variant B: channel-fused accumulate ------------------------------
    def kernel_fused(tz, win_ref, out_ref):
        i = pl.program_id(0)
        fiota = lambda d: jax.lax.broadcasted_iota(
            jnp.int32, (tz, H, W), d).astype(jnp.float32)
        ctr = lambda c: win_ref[0, c, p:p + tz, p:p + H, p:p + W]
        z_base = (i * tz).astype(jnp.float32) + fiota(0)
        dz = jnp.clip(z_base + ctr(nch), 0.0, D - 1.0) - z_base
        dy = jnp.clip(fiota(1) + ctr(nch + 1), 0.0, H - 1.0) - fiota(1)
        dx = jnp.clip(fiota(2) + ctr(nch + 2), 0.0, W - 1.0) - fiota(2)
        tri = P._tri
        acc = jnp.zeros((nch, tz, H, W), jnp.float32)
        for oz in range(-h, h + 1):
            wz = tri(dz, float(oz))
            for oy in range(-h, h + 1):
                wzy = wz * tri(dy, float(oy))
                for ox in range(-h, h + 1):
                    w = wzy * tri(dx, float(ox))
                    tap = win_ref[0, 0:nch, p + oz:p + oz + tz,
                                  p + oy:p + oy + H, p + ox:p + ox + W]
                    acc = acc + w[None] * tap
        out_ref[0, 0:nch] = acc

    run_variant("fusedch_ms", kernel_fused, tz)

    # ---- variant C: lane-pad W inside the window --------------------------
    # W + 2p = 114 -> pad to 128 so every vector op runs on full lanes
    wpad = 128 - (W + 2 * p)

    def kernel_lanepad(tz, win_ref, out_ref):
        Wp = W + wpad  # output width incl. pad
        i = pl.program_id(0)
        fiota = lambda d: jax.lax.broadcasted_iota(
            jnp.int32, (tz, H, Wp), d).astype(jnp.float32)
        ctr = lambda c: win_ref[0, c, p:p + tz, p:p + H, p:p + Wp]
        z_base = (i * tz).astype(jnp.float32) + fiota(0)
        dz = jnp.clip(z_base + ctr(nch), 0.0, D - 1.0) - z_base
        dy = jnp.clip(fiota(1) + ctr(nch + 1), 0.0, H - 1.0) - fiota(1)
        dx = jnp.clip(fiota(2) + ctr(nch + 2), 0.0, W - 1.0) - fiota(2)
        tri = P._tri
        accs = [jnp.zeros((tz, H, Wp), jnp.float32) for _ in range(nch)]
        for oz in range(-h, h + 1):
            wz = tri(dz, float(oz))
            for oy in range(-h, h + 1):
                wzy = wz * tri(dy, float(oy))
                for ox in range(-h, h + 1):
                    w = wzy * tri(dx, float(ox))
                    for c in range(nch):
                        accs[c] = accs[c] + w * win_ref[
                            0, c, p + oz:p + oz + tz,
                            p + oy:p + oy + H, p + ox:p + ox + Wp]
        for c in range(nch):
            out_ref[0, c] = accs[c]

    run_variant("lanepad_ms", kernel_lanepad, tz, wpad=wpad)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
