#!/usr/bin/env python
"""A/B lab for bounded-warp kernel variants (dev tool for the perf push).

v4 edition: the production kernel now windows only the volume channels
(shifts ride an unwindowed center block), and the z-slab size tz is
overridable via VXM_PALLAS_TZ_FWD — so the lab sweeps the PRODUCTION path
across tz instead of maintaining forked kernel bodies. Per config it runs:

  * correctness vs the XLA windowed_transform reference (max |diff| gate)
  * min-of-N chained timing of the full warp_bounded path

plus a build-vs-kernel split at the best tz and a full-resolution
single-channel probe (the inference SpatialTransformer shape). Results as
one JSON line; commit the output with any kernel change it motivated.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--halos", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--tzs", type=int, nargs="+", default=[2, 4, 8, 16])
    ap.add_argument("--fullres", action="store_true",
                    help="also probe (160,192,224) nch=1")
    ap.add_argument("--v5-only", action="store_true",
                    help="skip the v4 window-layout configs (tz ladder, "
                         "bf16 variants, th grid) — probe only the XLA "
                         "reference baselines and the v5 streaming kernels")
    ap.add_argument("--out", default=None,
                    help="JSON file updated after EVERY config (timeout-safe)")
    ap.add_argument("--th-configs", type=lambda s: [
        tuple(int(x) for x in c.split(":")) for c in s.split(",")],
        default=[(4, 96), (8, 96), (8, 48), (16, 48)],
        help="2-D grid (tz:th) combos, comma-separated (e.g. 4:96,8:48)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu  # noqa: F401  (enables the compile cache)
    from voxelmorph_tpu.ops import pallas_interp as P
    from voxelmorph_tpu.ops.warp import windowed_transform

    def timeit(fn, *a, iters=args.iters, repeats=args.repeats):
        float(fn(*a))  # compile + warm
        best = np.inf
        for _ in range(repeats):
            acc = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = acc + fn(*a)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return round(best * 1e3, 3)

    res = {}

    def checkpoint():
        """Persist after every config: a timeout mid-sweep (dozens of
        multi-minute tunnel compiles) keeps everything measured so far."""
        if args.out:
            with open(args.out, "w") as f:
                json.dump(res, f, indent=1)

    def probe(tag, shape, nch, h):
        D, H, W = shape
        rng = np.random.default_rng(0)
        vol = jnp.asarray(
            rng.standard_normal((D, H, W, nch)).astype(np.float32))
        shift = jnp.asarray(np.clip(rng.standard_normal(
            (D, H, W, 3)) * 0.5 * h, -h, h).astype(np.float32))
        ref = np.asarray(jax.jit(
            lambda v, s: windowed_transform(v, s, h))(vol, shift))
        useful_mb = D * H * W * 4 * (nch + 3 + nch) / 1e6

        auto_tz = P._pick_tz(shape, nch, h, "fwd")
        res[f"{tag}_auto_tz"] = auto_tz

        def one(key, tz, env, tol):
            # the tz ladder and th/bf16 variants probe the v4 window layouts;
            # v5 (streaming DMA) configs opt back in via their own env
            os.environ.setdefault("VXM_PALLAS_V5", "0")
            for k, v in env.items():
                os.environ[k] = v
            os.environ["VXM_PALLAS_TZ_FWD"] = str(tz)
            try:
                run = jax.jit(lambda v, s: jnp.sum(
                    P.warp_bounded(v, s, h)[::32, ::32, ::32]))
                got = jax.jit(lambda v, s: P.warp_bounded(v, s, h))(vol, shift)
                err = float(jnp.max(jnp.abs(jnp.asarray(got) - ref)))
                if err > tol:
                    res[key] = f"WRONG: max|diff|={err:.2e}"
                    return
                res[key] = timeit(run, vol, shift)
                res[key.replace("_ms", "_gbps")] = round(
                    useful_mb / res[key], 1)
            except Exception as e:
                res[key] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            finally:
                os.environ.pop("VXM_PALLAS_TZ_FWD", None)
                for k in env:
                    os.environ.pop(k, None)
                checkpoint()

        for tz in (() if args.v5_only else args.tzs):
            if tz <= D:
                one(f"{tag}_tz{tz}_ms", tz, {}, 1e-4)
        # bf16 operand variants at the auto tz (each kernel compile costs
        # tunnel minutes — probe the dtype axis at one slab size only).
        # bf16 taps/coords: 8-bit mantissa, gate correctness at 2e-2
        bt = auto_tz or 1
        if not args.v5_only:
            one(f"{tag}_tz{bt}_bf16win_ms", bt,
                {"VXM_PALLAS_BF16_WIN": "1"}, 2e-2)
            one(f"{tag}_tz{bt}_bf16shift_ms", bt,
                {"VXM_PALLAS_BF16_SHIFT": "1"}, 2e-2)
            one(f"{tag}_tz{bt}_bf16both_ms", bt,
                {"VXM_PALLAS_BF16_WIN": "1", "VXM_PALLAS_BF16_SHIFT": "1"},
                4e-2)
        # 2-D (z, y) grid: y-tiling shrinks the window so tz can grow,
        # cutting the window materialization's (tz+2p)/tz read
        # amplification — the dominant HBM term at full res (tz<=2 there
        # with full-H blocks). Probe a tz ladder at two y-tiles.
        for tz, tht in (() if args.v5_only else args.th_configs):
            if tz <= D and tht < shape[1]:
                one(f"{tag}_tz{tz}_th{tht}_ms", tz,
                    {"VXM_PALLAS_TH_FWD": str(tht)}, 1e-4)
        # v5 streaming kernel (manual-DMA window, zero-copy shift/out):
        # its own tz ladder (divisors of D) + bf16-shift variant at auto tz
        res[f"{tag}_v5_auto_tz"] = P._v5_pick_tz(shape, nch, h)
        for tz in (2, 4, 8, 16):
            if D % tz == 0:
                one(f"{tag}_v5_tz{tz}_ms", tz,
                    {"VXM_PALLAS_V5": "1", "VXM_PALLAS_V5_TZ": str(tz)},
                    1e-4)
        bt5 = res[f"{tag}_v5_auto_tz"] or 1
        one(f"{tag}_v5_tz{bt5}_bf16shift_ms", bt5,
            {"VXM_PALLAS_V5": "1", "VXM_PALLAS_V5_TZ": str(bt5),
             "VXM_PALLAS_BF16_SHIFT": "1"}, 2e-2)

    def probe_bwd(tag, shape, nch, h):
        """Time the custom VJP (fwd+bwd chained via jax.grad) for 2-D-grid
        backward configs. At full res the 1-D bwd kernel does not fit
        scoped VMEM (full-H windows: 14.4 MB at h=1 nch=1 vs 9 MB budget) —
        XLA shifted-slice is the incumbent; y-tiling is the challenger."""
        D, H, W = shape
        rng = np.random.default_rng(7)
        vol = jnp.asarray(
            rng.standard_normal((D, H, W, nch)).astype(np.float32))
        shift = jnp.asarray(np.clip(rng.standard_normal(
            (D, H, W, 3)) * 0.5 * h, -h, h).astype(np.float32))

        def grad_fn():
            # full-sum objective: a DENSE cotangent (ones), the training
            # regime — a strided slice would hand the backward a sparse g
            return jax.jit(jax.grad(
                lambda v, s: jnp.sum(P.warp_bounded(v, s, h)),
                argnums=(0, 1)))

        def run(key, env):
            os.environ.setdefault("VXM_PALLAS_V5", "0")
            for k, v in env.items():
                os.environ[k] = v
            try:
                f = grad_fn()
                res[key] = timeit(lambda v, s: jnp.sum(f(v, s)[1][::64, ::64, ::64]),
                                  vol, shift)
            except Exception as e:
                res[key] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            finally:
                for k in env:
                    os.environ.pop(k, None)
                checkpoint()

        run(f"{tag}_bwd_xla_ms", {"VXM_PALLAS_BWD": "0"})
        run(f"{tag}_bwd_auto_ms", {})  # production dispatch (1-D if it fits)
        for tz, tht in (() if args.v5_only else args.th_configs):
            if tz <= D and tht < H:
                run(f"{tag}_bwd_tz{tz}_th{tht}_ms",
                    {"VXM_PALLAS_TH_BWD": str(tht),
                     "VXM_PALLAS_TZ_BWD": str(tz)})
        # v5 streaming backward pair (dshift + dvol kernels)
        res[f"{tag}_v5_bwd_auto_tz"] = P._v5_pick_tz_bwd(shape, nch, h)
        for tz in (2, 4, 8, 16):
            if D % tz == 0:
                run(f"{tag}_v5_bwd_tz{tz}_ms",
                    {"VXM_PALLAS_V5": "1", "VXM_PALLAS_V5_TZ_BWD": str(tz)})

    for h in args.halos:
        probe(f"half_h{h}_nch3", (80, 96, 112), 3, h)
        probe_bwd(f"half_h{h}_nch3", (80, 96, 112), 3, h)
    if args.fullres:
        probe("full_h1_nch1", (160, 192, 224), 1, 1)
        probe("full_h2_nch1", (160, 192, 224), 1, 2)
        probe_bwd("full_h1_nch1", (160, 192, 224), 1, 1)
        probe_bwd("full_h2_nch1", (160, 192, 224), 1, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
