#!/usr/bin/env python
"""Dice-vs-lambda sweep of a trained HyperMorph model.

The point of HyperMorph is amortizing the regularization weight: one model
answers "how does quality trade off against smoothness" without retraining.
The reference's post-train sweep writes moved images only
(scripts/tf/train_hypermorph.py:195-211); this runner quantifies it — for
each lambda it registers every eval pair (one jitted fn, lambda is a traced
input so the sweep costs a single compile), transports the segmentation
nearest-neighbor, and reports mean Dice + %folded voxels.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="HyperVxmDense checkpoint")
    p.add_argument("--pairs", default="data_gen/test_pairs.txt")
    p.add_argument("--labels", default="/root/reference/data/labels.npz")
    p.add_argument("--lambdas", type=float, nargs="+",
                   default=[0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0])
    p.add_argument("--out", default="hypermorph_sweep.json")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import load_model
    from voxelmorph_tpu.ops import warp as warp_ops
    from voxelmorph_tpu.training import enable_compile_cache

    enable_compile_cache()
    labels = np.load(args.labels)
    if not isinstance(labels, np.ndarray):
        labels = labels["labels"]
    pairs = vxm.py.utils.read_pair_list(args.pairs)
    # re-target the (fully convolutional) net to the eval resolution, so a
    # checkpoint amortized on the half-res population sweeps at the
    # canonical 160x192x224 (same mechanism as run_quality_eval)
    from voxelmorph_tpu.registration import resolve_registration_model
    eval_shape = np.load(pairs[0][0])["vol"].shape
    model, params = resolve_registration_model(
        *load_model(args.model), inshape=eval_shape)

    @jax.jit
    def register(params, hyp, mv, fx, ms):
        out = model.apply({"params": params}, mv, fx, hyp, train=False)
        warp = out["pos_flow"]
        moved_seg = warp_ops.transform_batched(ms, warp,
                                               interp_method="nearest")
        return warp, moved_seg

    # identity (unregistered) Dice floor, lambda-independent
    id_dices = []
    for mov_path, fix_path in pairs:
        mov, fix = np.load(mov_path), np.load(fix_path)
        id_dices.append(float(np.mean(
            vxm.py.utils.dice(mov["seg"], fix["seg"], labels=labels))))
    identity_mean = round(float(np.mean(id_dices)), 4)
    print(f"identity floor: dice {identity_mean:.4f}")

    rows = []
    for lam in args.lambdas:
        hyp = jnp.full((1, 1), lam, jnp.float32)
        dices, folds = [], []
        for mov_path, fix_path in pairs:
            mov, fix = np.load(mov_path), np.load(fix_path)
            warp, warped_seg = register(
                params, hyp,
                jnp.asarray(mov["vol"], jnp.float32)[None, ..., None],
                jnp.asarray(fix["vol"], jnp.float32)[None, ..., None],
                jnp.asarray(mov["seg"], jnp.float32)[None, ..., None])
            warped_seg = np.asarray(jax.block_until_ready(warped_seg)).squeeze()
            d = vxm.py.utils.dice(warped_seg, fix["seg"], labels=labels)
            jac = vxm.py.utils.jacobian_determinant(np.asarray(warp).squeeze())
            dices.append(float(np.mean(d)))
            folds.append(100.0 * float(np.mean(jac <= 0)))
        rows.append({"lambda": lam,
                     "dice_mean": round(float(np.mean(dices)), 4),
                     "pct_folded_mean": round(float(np.mean(folds)), 4)})
        print(f"lambda {lam:4.2f}: dice {rows[-1]['dice_mean']:.4f}  "
              f"folded {rows[-1]['pct_folded_mean']:.3f}%")

    shape_str = "x".join(str(s) for s in np.load(pairs[0][0])["vol"].shape)
    report = {"model": os.path.abspath(args.model),
              "n_pairs": len(pairs), "n_labels": int(len(labels)),
              "protocol": f"identity-floor Dice sweep over lambda; volume "
                          f"resolution {shape_str}; pairs from {args.pairs}",
              "identity_dice_mean": identity_mean,
              "sweep": rows}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
