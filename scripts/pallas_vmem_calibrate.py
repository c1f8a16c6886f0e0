#!/usr/bin/env python
"""Calibrate kernel_vmem_fits against ACTUAL Mosaic compiles on TPU.

For each (shape, nch, halo) configuration of interest, attempt to compile
the forward and backward Pallas warp kernels and report ok/oom next to the
gate's modeled footprint. The gate multiplies model bytes by a safety
factor; this tool measures what that factor must be so that nothing the
gate admits can OOM the 16 MB scoped-VMEM stack (the failure mode seen in
BENCH: `vecint_adaptive_pallas` halo=2 needed 16.64M with a 4.46M model).

Usage: python scripts/pallas_vmem_calibrate.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from voxelmorph_tpu.ops import pallas_interp as P

    rng = np.random.default_rng(0)
    configs = []
    for shape in ((80, 96, 112), (40, 48, 56)):
        for nch in (1, 3, 4):
            for halo in (1, 2):
                configs.append((shape, nch, halo))
    configs.append(((160, 192, 224), 1, 1))  # full-res single-channel warp

    rows = []
    for shape, nch, halo in configs:
        D, H, W = shape
        vol = jnp.asarray(
            rng.standard_normal((D, H, W, nch)).astype(np.float32))
        shift = jnp.asarray(np.clip(
            rng.standard_normal((D, H, W, 3)), -halo, halo).astype(np.float32))
        row = {"shape": list(shape), "nch": nch, "halo": halo,
               "gate": P.kernel_vmem_fits(shape, nch, halo)}

        def try_compile(fn, *args):
            try:
                jax.block_until_ready(jax.jit(fn)(*args))
                return "ok"
            except Exception as e:
                msg = str(e)
                if "vmem" in msg.lower() or "out of memory" in msg.lower():
                    return "vmem_oom"
                return f"fail: {msg.splitlines()[0][:120]}"

        vol_cf = jnp.moveaxis(vol, -1, 0)
        row["fwd"] = try_compile(
            lambda v, s: P._warp_bounded_cf(v, s, halo), vol_cf, shift)
        row["bwd"] = try_compile(
            lambda v, s: jax.grad(
                lambda vv, ss: jnp.sum(P._warp_bounded_cf(vv, ss, halo)),
                argnums=(0, 1))(v, s)[1].sum(), vol_cf, shift)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
