#!/usr/bin/env python
"""Benchmark: 3-D volume pairs registered per second per chip.

Reproduces the reference's evaluation semantics (scripts/tf/test.py timing:
warp prediction timed, compile excluded) on the canonical 160x192x224 volume
with the default VxmDense (int_steps=7, int_downsize=2).

Timing note: on tunneled backends `block_until_ready` can return before
execution completes, so each timed iteration is chained into an on-device
scalar accumulator that is fetched ONCE after the loop — the fetch cannot
complete until every iteration has executed.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Measured on this image via `python bench.py --cpu-baseline` (JAX on host
# CPU, full default VxmDense forward at 160x192x224): 0.0076 pairs/s.
# Fixed here so vs_baseline is stable across runs.
BASELINE_CPU_PAIRS_PER_S = 0.0076

INSHAPE = (160, 192, 224)


def _enable_compile_cache():
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _load_pair():
    """Use the reference's canonical eval volume when available, else synthesize."""
    ref = "/root/reference/data/test_scan.npz"
    rng = np.random.default_rng(0)
    if os.path.isfile(ref):
        vol = np.load(ref)["vol"].astype(np.float32)
        vol = vol / max(vol.max(), 1e-6)
        moving = vol
        fixed = np.roll(vol, shift=(2, -3, 1), axis=(0, 1, 2))
    else:
        moving = rng.random(INSHAPE, dtype=np.float32)
        fixed = rng.random(INSHAPE, dtype=np.float32)
    return moving[None, ..., None], fixed[None, ..., None]


def measure(batch_sizes=(1,), iters=8, warmup=2):
    import jax
    import jax.numpy as jnp
    from voxelmorph_tpu.models import VxmDense

    _enable_compile_cache()
    moving, fixed = _load_pair()
    model = VxmDense(inshape=INSHAPE, int_steps=7, int_resolution=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(moving), jnp.asarray(fixed))["params"]

    @jax.jit
    def reg_probe(params, mv, fx):
        out = model.apply({"params": params}, mv, fx, train=False)
        # tiny scalar that depends on the full registration outputs
        return jnp.sum(out["y_source"][0, ::64, ::64, ::64]) + jnp.sum(
            out["pos_flow"][0, ::64, ::64, ::64])

    best = 0.0
    detail = {}
    for bs in batch_sizes:
        mv = jnp.asarray(np.repeat(moving, bs, axis=0))
        fx = jnp.asarray(np.repeat(fixed, bs, axis=0))
        try:
            for _ in range(warmup):
                float(reg_probe(params, mv, fx))  # compile + sync
            acc = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = acc + reg_probe(params, mv, fx)
            float(acc)  # forces completion of the whole chain
            dt = (time.perf_counter() - t0) / iters
            pairs_per_s = bs / dt
        except Exception as e:  # OOM at larger batch: skip
            detail[f"bs{bs}"] = f"failed: {type(e).__name__}"
            continue
        detail[f"bs{bs}"] = round(pairs_per_s, 4)
        best = max(best, pairs_per_s)
    return best, detail


def measure_cpu_baseline():
    """One-off helper to (re)estimate the CPU baseline. Not run by default."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    best, detail = measure(batch_sizes=(1,), iters=2, warmup=1)
    print("cpu baseline:", best, detail)
    return best


if __name__ == "__main__":
    if "--cpu-baseline" in sys.argv:
        measure_cpu_baseline()
        sys.exit(0)
    value, detail = measure()
    print(json.dumps({
        "metric": "vxm_dense_registration_throughput_160x192x224",
        "value": round(value, 4),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / BASELINE_CPU_PAIRS_PER_S, 2),
        "detail": detail,
    }))
