#!/usr/bin/env python
"""Per-stage timing breakdown of the flagship registration pipeline.

bench.py reports the end-to-end numbers the driver tracks; this tool answers
"where does the time go" so optimization work targets the actual hot stage.
Stages timed independently at the canonical 160x192x224 (batch 1):

  unet            full-res U-Net forward (2-channel input, default features)
  flow_rescale    half-res flow resize to full res (separable MXU matmuls)
  vecint          7-step scaling-and-squaring at int_resolution=2
  final_warp      full-res 1-channel warp via the corner-table gather
  forward         whole VxmDense apply (the bench.py inference quantity)
  ncc_grad        NCC(win 9^3) loss value+grad wrt the warped image
  train_step      full fwd+bwd+Adam (MSE+Grad losses, device-resident batch)

Timing uses the same chained-probe accumulator as bench.py (see its header:
`block_until_ready` is not trusted on tunneled backends).

Prints one JSON object; pass --dtype bfloat16 for the bf16 U-Net path.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

INSHAPE = (160, 192, 224)


def _timed(fn, *args, iters=8, warmup=2):
    import jax.numpy as jnp
    for _ in range(warmup):
        float(fn(*args))
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--shape", type=int, nargs=3, default=None,
                   help="override the volume shape (e.g. a small CPU sanity run)")
    args = p.parse_args(argv)
    global INSHAPE
    if args.shape:
        INSHAPE = tuple(args.shape)

    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import VxmDense
    from voxelmorph_tpu.models.unet import Unet
    from voxelmorph_tpu.ops import warp as W
    from voxelmorph_tpu.training import LossTerm, Trainer, enable_compile_cache

    enable_compile_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    half = tuple(s // 2 for s in INSHAPE)
    out = {"dtype": args.dtype, "inshape": list(INSHAPE)}

    moving = jnp.asarray(rng.random((1, *INSHAPE, 1), np.float32))
    fixed = jnp.asarray(rng.random((1, *INSHAPE, 1), np.float32))
    pair = jnp.concatenate([moving, fixed], axis=-1)

    # --- unet ---
    unet = Unet(ndims=3, dtype=dtype, remat=False)
    uparams = unet.init(jax.random.PRNGKey(0), pair)["params"]

    @jax.jit
    def unet_probe(p, x):
        y = unet.apply({"params": p}, x)
        return jnp.sum(y[0, ::64, ::64, ::64]).astype(jnp.float32)

    out["unet_ms"] = round(_timed(unet_probe, uparams, pair, iters=args.iters) * 1e3, 2)

    # --- flow rescale half -> full (3 channels) ---
    flow_half = jnp.asarray(rng.random((*half, 3), np.float32))

    @jax.jit
    def rescale_probe(f):
        r = W.rescale_dense_transform(f, 2.0)
        return jnp.sum(r[::64, ::64, ::64]).astype(jnp.float32)

    out["flow_rescale_ms"] = round(
        _timed(rescale_probe, flow_half, iters=args.iters) * 1e3, 2)

    # --- vecint at integration resolution ---
    svf = jnp.asarray(
        4.0 * rng.standard_normal((1, *half, 3)).astype(np.float32))

    @jax.jit
    def vecint_probe(v):
        r = W.integrate_vec_batched(v, nb_steps=7)
        return jnp.sum(r[0, ::32, ::32, ::32]).astype(jnp.float32)

    out["vecint_ms"] = round(_timed(vecint_probe, svf, iters=args.iters) * 1e3, 2)

    # --- vecint backward (the train-step cost bench never isolates: the
    # gather path's VJP scatters into the sampled field on every squaring
    # step whose displacement exceeds the windowed halo) ---
    @jax.jit
    def vecint_grad_probe(v):
        g = jax.grad(lambda x: jnp.sum(
            W.integrate_vec_batched(x, nb_steps=7)[0, ::32, ::32, ::32]))(v)
        return jnp.sum(g[0, ::32, ::32, ::32]).astype(jnp.float32)

    out["vecint_grad_ms"] = round(
        _timed(vecint_grad_probe, svf, iters=args.iters) * 1e3, 2)

    # --- final full-res warp (unbounded displacements -> corner gather) ---
    warp_full = jnp.asarray(
        8.0 * rng.standard_normal((*INSHAPE, 3)).astype(np.float32))

    @jax.jit
    def warp_probe(vol, w):
        r = W.transform(vol[0], w, window_halo=None)
        return jnp.sum(r[::64, ::64, ::64]).astype(jnp.float32)

    out["final_warp_ms"] = round(
        _timed(warp_probe, moving, warp_full, iters=args.iters) * 1e3, 2)

    # --- final warp backward wrt the WARP only (training needs no gradient
    # wrt the moving image, so the corner-table scatter should be DCE'd;
    # this probe verifies that) ---
    @jax.jit
    def warp_grad_probe(vol, w):
        g = jax.grad(lambda s: jnp.sum(
            W.transform(vol[0], s, window_halo=None)[::64, ::64, ::64]))(w)
        return jnp.sum(g[::64, ::64, ::64]).astype(jnp.float32)

    out["final_warp_grad_ms"] = round(
        _timed(warp_grad_probe, moving, warp_full, iters=args.iters) * 1e3, 2)

    # --- whole forward ---
    model = VxmDense(inshape=INSHAPE, int_steps=7, int_resolution=2, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0), moving, fixed)["params"]

    @jax.jit
    def fwd_probe(p, m, f):
        o = model.apply({"params": p}, m, f, train=False)
        return (jnp.sum(o["y_source"][0, ::64, ::64, ::64])
                + jnp.sum(o["pos_flow"][0, ::64, ::64, ::64])).astype(jnp.float32)

    out["forward_ms"] = round(
        _timed(fwd_probe, params, moving, fixed, iters=args.iters) * 1e3, 2)

    # --- NCC value+grad at full res ---
    ncc = vxm.losses.NCC().loss

    @jax.jit
    def ncc_probe(pred, true):
        val, g = jax.value_and_grad(lambda x: jnp.sum(ncc(true, x)))(pred)
        return (val + jnp.sum(g[0, ::64, ::64, ::64])).astype(jnp.float32)

    out["ncc_grad_ms"] = round(
        _timed(ncc_probe, moving, fixed, iters=args.iters) * 1e3, 2)

    # --- full train step ---
    terms = [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=1.0, target_index=0),
        LossTerm("reg", vxm.losses.Grad("l2", loss_mult=2).loss, weight=0.01,
                 target_index=1, name="grad"),
    ]
    trainer = Trainer(model, terms, lr=1e-4)
    np_moving = np.asarray(moving)
    np_fixed = np.asarray(fixed)
    trainer.init((np_moving, np_fixed))
    inputs = trainer._put((np_moving, np_fixed))
    targets = trainer._put((np_fixed, np.zeros((1, *INSHAPE, 3), np.float32)))
    key = jax.random.PRNGKey(0)
    step_idx = np.asarray(0, np.int32)

    def step_probe():
        (trainer.params, trainer.state, trainer.opt_state, metrics) = (
            trainer.step_fn(trainer.params, trainer.state, trainer.opt_state,
                            key, step_idx, inputs, targets))
        return metrics["loss"]

    out["train_step_ms"] = round(
        _timed(step_probe, iters=max(3, args.iters // 2)) * 1e3, 2)

    # accounted fraction of the forward
    parts = out["unet_ms"] + out["flow_rescale_ms"] + out["vecint_ms"] + out["final_warp_ms"]
    out["stage_sum_ms"] = round(parts, 2)
    out["stage_sum_over_forward"] = round(parts / out["forward_ms"], 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
