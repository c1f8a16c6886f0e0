#!/usr/bin/env python
"""Derive SynthMorph training label maps + half-res eval pairs from data_gen.

SynthMorph trains on label maps ALONE (images are synthesized on device, see
scripts/train_synthmorph.py); registration quality is then evaluated on real
image pairs the model never saw. This script prepares both sides at half
resolution (80x96x112 — the reference's SynthMorph models are themselves
trained at reduced resolution, /root/reference/voxelmorph/tf/networks.py:1466):

  <out>/lab_XXX.npz   ('vol' = int label map)   from data_gen/train_XXX.npz segs
  <out>/test_XXX.npz  ('vol' + 'seg')           from data_gen/test_XXX.npz
  <out>/test_pairs.txt

Downsampling is nearest-neighbor (labels) / 2x2x2 mean (images).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="data_gen", help="population directory")
    p.add_argument("--out", default="data_synth", help="output directory")
    p.add_argument("--augment", type=int, default=0,
                   help="extra randomly-warped variants per training label "
                        "map (diversifies the single-subject population the "
                        "way SynthMorph's multi-subject corpus does)")
    p.add_argument("--warp-std", type=float, default=3.0,
                   help="SVF std (voxels at half-res) for --augment variants")
    p.add_argument("--warp-res", type=float, default=16.0,
                   help="SVF spatial scale for --augment variants")
    p.add_argument("--seed", type=int, default=2027)
    p.add_argument("--scale", type=int, default=2, choices=[1, 2],
                   help="downsampling factor from the data_gen resolution; "
                        "1 writes the canonical full-resolution population "
                        "(160x192x224) for full-res SynthMorph training")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    make_variant = None
    if args.augment:
        import jax
        import jax.numpy as jnp
        from voxelmorph_tpu.ops import warp as W
        from voxelmorph_tpu.ops.image import draw_multiscale_noise

        @jax.jit
        def make_variant(key, seg):
            svf = draw_multiscale_noise(key, seg.shape, (args.warp_res,),
                                        args.warp_std, nb_channels=seg.ndim)
            # draw_multiscale_noise draws its std ~ U(0, warp_std) (the
            # per-sample synthesis semantics); an augmentation variant must
            # actually differ from its base, so rescale the field to a
            # guaranteed std of warp_std
            svf = svf * (args.warp_std / (jnp.std(svf) + 1e-6))
            field = W.integrate_vec(svf, nb_steps=5)
            out = W.transform(seg.astype(jnp.float32)[..., None], field,
                              interp_method="nearest")[..., 0]
            return out.astype(jnp.int32)

    k = args.scale

    def pool_mean(vol):
        if k == 1:
            return vol
        return vol.reshape(vol.shape[0] // k, k, vol.shape[1] // k, k,
                           vol.shape[2] // k, k).mean(axis=(1, 3, 5))

    n_aug = 0
    train_vols = []
    for path in sorted(glob.glob(os.path.join(args.src, "train_*.npz"))):
        data = np.load(path)
        seg = data["seg"][::k, ::k, ::k].astype(np.int32)
        stem = os.path.basename(path).split("_")[1].split(".")[0]
        np.savez(os.path.join(args.out, f"lab_{stem}"), vol=seg)
        # vol+seg training volumes (kxkxk mean / nearest), for trainers
        # that run at this resolution (e.g. the HyperMorph lambda sweep)
        vol = pool_mean(data["vol"].astype(np.float32))
        tr_path = os.path.abspath(
            os.path.join(args.out, f"train_{stem}.npz"))
        np.savez(tr_path, vol=vol, seg=seg)
        train_vols.append(tr_path)
        if args.augment:
            base = jax.random.fold_in(jax.random.PRNGKey(args.seed), int(stem))
            for a in range(args.augment):
                key = jax.random.fold_in(base, a)
                var = np.asarray(make_variant(key, seg))
                np.savez(os.path.join(args.out, f"lab_{stem}a{a}"), vol=var)
                n_aug += 1
    if train_vols:
        with open(os.path.join(args.out, "train_list.txt"), "w") as f:
            f.write("\n".join(train_vols) + "\n")
    if args.augment:
        print(f"augmented: {n_aug} extra warped label maps")

    tests = []
    for path in sorted(glob.glob(os.path.join(args.src, "test_*.npz"))):
        data = np.load(path)
        # kxkxk mean pooling (shapes are even at 160x192x224); k=1 keeps
        # the canonical resolution (eval pairs then match data_gen's)
        vol = pool_mean(data["vol"].astype(np.float32))
        seg = data["seg"][::k, ::k, ::k].astype(np.int32)
        out_path = os.path.abspath(
            os.path.join(args.out, os.path.basename(path)))
        np.savez(out_path, vol=vol, seg=seg)
        tests.append(out_path)

    if tests:
        pairs = [(tests[i], tests[(i + 1) % len(tests)])
                 for i in range(len(tests))]
        with open(os.path.join(args.out, "test_pairs.txt"), "w") as f:
            f.write("\n".join(f"{a} {b}" for a, b in pairs) + "\n")
    print(f"wrote {args.out}: {len(glob.glob(os.path.join(args.out, 'lab_*.npz')))} "
          f"label maps, {len(tests)} eval volumes")


if __name__ == "__main__":
    main()
