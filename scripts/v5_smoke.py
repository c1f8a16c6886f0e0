#!/usr/bin/env python
"""Real-TPU smoke for the v5 streaming warp kernels (fwd + bwd pair).

Correctness vs the XLA shifted-slice reference at the three production
shapes (graft-entry 64^3, integration-res half vol, full-res), plus
min-of-N timings. Run BEFORE leaving v5 default-on: the driver's
compile check dispatches it.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu  # noqa: F401 (compile cache)
    from voxelmorph_tpu.ops import pallas_interp as P
    from voxelmorph_tpu.ops.warp import windowed_transform

    out = {}

    def timeit(fn, *a, iters=20, repeats=3):
        float(fn(*a))
        best = np.inf
        for _ in range(repeats):
            acc = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = acc + fn(*a)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return round(best * 1e3, 3)

    def case(tag, shape, nch, h, bwd=True):
        D, H, W = shape
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.standard_normal((D, H, W, nch)).astype(np.float32))
        # tanh-bounded, kink-free shifts: np.clip would put atoms exactly ON
        # the triangular kernel's |d|=h kink, where the Pallas subgradient
        # convention differs (validly) from XLA autodiff's
        shift = jnp.asarray((np.tanh(
            rng.standard_normal((D, H, W, 3))) * 0.95 * h).astype(np.float32))
        out[f"{tag}_tz"] = P._v5_pick_tz(shape, nch, h)
        out[f"{tag}_bwd_tz"] = P._v5_pick_tz_bwd(shape, nch, h)
        try:
            ref = np.asarray(jax.jit(
                lambda v, s: windowed_transform(v, s, h))(vol, shift))
            got = np.asarray(jax.jit(
                lambda v, s: P.warp_bounded(v, s, h))(vol, shift))
            err = float(np.max(np.abs(got - ref)))
            out[f"{tag}_fwd_err"] = err
            if err > 1e-4:
                out[f"{tag}_fwd"] = "WRONG"
                return
            run = jax.jit(lambda v, s: jnp.sum(
                P.warp_bounded(v, s, h)[::32, ::32, ::32]))
            out[f"{tag}_fwd_ms"] = timeit(run, vol, shift)
            vox = D * H * W
            out[f"{tag}_fwd_gbps"] = round(
                vox * 4 * (2 * nch + 3) / (out[f"{tag}_fwd_ms"] / 1e3) / 1e9, 1)
        except Exception as e:
            out[f"{tag}_fwd"] = f"failed: {type(e).__name__}: {str(e)[:200]}"
            return
        if not bwd:
            return
        try:
            gfun = jax.jit(jax.grad(
                lambda v, s: jnp.sum(P.warp_bounded(v, s, h)), argnums=(0, 1)))
            gref = jax.jit(jax.grad(
                lambda v, s: jnp.sum(windowed_transform(v, s, h)),
                argnums=(0, 1)))
            gv, gs = gfun(vol, shift)
            rv, rs = gref(vol, shift)
            ev = float(jnp.max(jnp.abs(gv - rv)))
            es = float(jnp.max(jnp.abs(gs - rs)))
            out[f"{tag}_bwd_err"] = max(ev, es)
            if max(ev, es) > 1e-3:
                out[f"{tag}_bwd"] = "WRONG"
                return
            run = jax.jit(lambda v, s: jnp.sum(
                gfun(v, s)[1][::32, ::32, ::32]))
            out[f"{tag}_bwd_ms"] = timeit(run, vol, shift)
        except Exception as e:
            out[f"{tag}_bwd"] = f"failed: {type(e).__name__}: {str(e)[:200]}"

    path = os.environ.get("V5_SMOKE_OUT", "")

    def flush():
        if path:
            with open(path, "w") as f:
                json.dump(out, f, indent=1)

    for args in (("entry64_h1_nch3", (64, 64, 64), 3, 1),
                 ("half_h2_nch3", (80, 96, 112), 3, 2),
                 ("full_h1_nch1", (160, 192, 224), 1, 1),
                 ("full_h2_nch1", (160, 192, 224), 1, 2)):
        case(*args)
        flush()
        print(args[0], "done", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
