#!/usr/bin/env python
"""Compile-time HBM demand of a train step, without running it.

AOT-compiles the exact train-step computation (fwd+bwd+Adam, donated
buffers) for a chosen config and prints XLA's memory analysis — the tool
behind the probabilistic-step memory work (the full-res MICCAI step must fit
a 16 GB v5e chip, reference params at /root/reference/README.md:73-77).
Compilation runs on the host compile service; the chip itself is untouched,
so this can run alongside a live training job.

Examples:
  python scripts/memory_probe.py --use-probs --image-loss ncc
  python scripts/memory_probe.py --use-probs --dtype bfloat16
  python scripts/memory_probe.py --batch-size 8 --infer-only
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=3, default=[160, 192, 224])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--use-probs", action="store_true")
    p.add_argument("--image-loss", default="ncc", choices=["ncc", "mse"])
    p.add_argument("--int-steps", type=int, default=7)
    p.add_argument("--int-downsize", type=int, default=2)
    p.add_argument("--kl-lambda", type=float, default=10.0)
    p.add_argument("--lambda-weight", type=float, default=0.02)
    p.add_argument("--infer-only", action="store_true",
                   help="probe the inference fn instead of the train step")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import optax
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import VxmDense
    from voxelmorph_tpu.training import (LossTerm, make_train_step,
                                         enable_compile_cache, resolve_dtype)

    enable_compile_cache()
    inshape = tuple(args.shape)
    model = VxmDense(
        inshape=inshape,
        use_probs=args.use_probs,
        int_steps=args.int_steps,
        int_resolution=args.int_downsize,
        dtype=resolve_dtype(args.dtype),
    )

    B = args.batch_size
    src = jnp.zeros((B, *inshape, 1), jnp.float32)
    trg = jnp.zeros((B, *inshape, 1), jnp.float32)
    zeros = jnp.zeros((B, *inshape, 3), jnp.float32)

    if args.infer_only:
        params = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "sample": jax.random.PRNGKey(0)}, src, trg))["params"]
        fn = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b,
                                                 train=False)["y_source"])
        lowered = fn.lower(params, src, trg)
        label = "inference"
    else:
        if args.image_loss == "ncc":
            img_loss = vxm.losses.NCC().loss
        else:
            img_loss = vxm.losses.MSE(0.01).loss
        terms = [LossTerm("y_source", img_loss, weight=1.0, target_index=0)]
        if args.use_probs:
            terms.append(LossTerm(
                "reg", vxm.losses.KL(args.kl_lambda, inshape).loss,
                weight=args.lambda_weight, target_index=1, name="kl"))
        else:
            terms.append(LossTerm(
                "reg", vxm.losses.Grad("l2", loss_mult=args.int_downsize).loss,
                weight=args.lambda_weight, target_index=1, name="grad"))
        tx = optax.adam(1e-4)
        rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
        params = jax.eval_shape(lambda: model.init(rngs, src, trg))["params"]
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), params)
        opt_state = tx.init(params)
        step_fn = make_train_step(model, terms, tx,
                                  rng_names=["sample"] if args.use_probs else [])
        lowered = step_fn.lower(params, {}, opt_state, jax.random.PRNGKey(0),
                                jnp.zeros((), jnp.int32), (src, trg),
                                (trg, zeros))
        label = "train_step"

    try:
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        report = {
            "config": vars(args), "what": label, "compiled": True,
            "argument_size_gb": round(mem.argument_size_in_bytes / 2**30, 3),
            "output_size_gb": round(mem.output_size_in_bytes / 2**30, 3),
            "temp_size_gb": round(mem.temp_size_in_bytes / 2**30, 3),
            "alias_size_gb": round(mem.alias_size_in_bytes / 2**30, 3),
            "peak_gb": round((mem.argument_size_in_bytes
                              + mem.output_size_in_bytes
                              + mem.temp_size_in_bytes
                              - mem.alias_size_in_bytes) / 2**30, 3),
        }
    except Exception as e:
        text = str(e)
        # surface the XLA OOM accounting + largest-buffer lines when the
        # tunneled backend wraps them in an opaque HTTP 500 (same idea as
        # bench._short_err, but keep the whole buffer table for diagnosis)
        keep = [ln for ln in text.split("\n")
                if any(k in ln for k in ("Ran out of memory", "Exceeded",
                                         "Largest program allocations",
                                         "Allocation type", "Buffer", "GB",
                                         "MiB", "XLA label", "Shape"))]
        report = {"config": vars(args), "what": label, "compiled": False,
                  "error": f"{type(e).__name__}: {text[:600]}",
                  "oom_lines": keep[:80]}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
