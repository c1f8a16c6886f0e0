#!/usr/bin/env python
"""Real-TPU A/B of the Pallas 3x3x3 conv kernel vs XLA's conv lowering.

Times forward and forward+backward at the voxelmorph U-Net's production
conv shapes (enc/dec of the default feature spec at 160x192x224; ref
feature spec /root/reference/voxelmorph/py/utils.py:16-21). Incremental
JSON output so a killed run still leaves numbers.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# (tag, ci, co, D, H, W) — stride-1 SAME convs of the default U-Net at
# full res; deep levels (W=28, 14) are XLA-fallback by design
CASES = [
    ("fullres_2_16", 2, 16, 160, 192, 224),
    ("fullres_48_32", 48, 32, 160, 192, 224),
    ("fullres_32_16", 32, 16, 160, 192, 224),
    ("fullres_16_16", 16, 16, 160, 192, 224),
    ("half_16_32", 16, 32, 80, 96, 112),
    ("half_64_32", 64, 32, 80, 96, 112),
    ("quart_32_32", 32, 32, 40, 48, 56),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts_r5/AB_conv_r05.json")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtypes", default="bfloat16,float32")
    ap.add_argument("--cases", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from voxelmorph_tpu.ops import pallas_conv

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out = {"device": str(jax.devices()[0]), "iters": args.iters}

    def flush():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

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

    sel = [c for c in CASES if not args.cases or c[0] in args.cases.split(",")]
    for dts in args.dtypes.split(","):
        dt = jnp.bfloat16 if dts == "bfloat16" else jnp.float32
        sfx = "bf16" if dts == "bfloat16" else "f32"
        for tag, ci, co, D, H, W in sel:
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.standard_normal((1, D, H, W, ci)), dtype=dt)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1,
                            dtype=dt)
            b = jnp.asarray(rng.standard_normal((co,)), dtype=dt)
            g = jnp.asarray(rng.standard_normal((1, D, H, W, co)), dtype=dt)

            def xla(xx, kk, bb):
                o = jax.lax.conv_general_dilated(
                    xx, kk, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bb
                return jnp.where(o >= 0, o, 0.2 * o)

            def pal(xx, kk, bb):
                return pallas_conv.conv3_same(xx, kk, bb, act_slope=0.2)

            key = f"{tag}_{sfx}"
            if pallas_conv.conv3_same(x, k, b) is None:
                out[key] = "pallas declined"
                flush()
                continue
            try:
                r = np.asarray(pal(x, k, b)).astype(np.float32)
                rx = np.asarray(xla(x, k, b)).astype(np.float32)
                err = float(np.max(np.abs(r - rx)))
                out[f"{key}_err"] = err
                fx = jax.jit(lambda xx: jnp.sum(xla(xx, k, b) * g))
                fp = jax.jit(lambda xx: jnp.sum(pal(xx, k, b) * g))
                out[f"{key}_fwd_xla_ms"] = timeit(fx, x)
                flush()
                out[f"{key}_fwd_pal_ms"] = timeit(fp, x)
                flush()
                gx = jax.jit(jax.grad(
                    lambda xx, kk, bb: jnp.sum(xla(xx, kk, bb) * g),
                    argnums=(0, 1, 2)))
                gp = jax.jit(jax.grad(
                    lambda xx, kk, bb: jnp.sum(pal(xx, kk, bb) * g),
                    argnums=(0, 1, 2)))
                out[f"{key}_grad_xla_ms"] = timeit(
                    lambda: sum(jnp.sum(t.astype(jnp.float32))
                                for t in gx(x, k, b)))
                flush()
                out[f"{key}_grad_pal_ms"] = timeit(
                    lambda: sum(jnp.sum(t.astype(jnp.float32))
                                for t in gp(x, k, b)))
            except Exception as e:
                out[key] = f"failed: {type(e).__name__}: {str(e)[:300]}"
            flush()
            print(tag, sfx, "done", flush=True)

    flush()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
