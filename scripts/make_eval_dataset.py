#!/usr/bin/env python
"""Build a training/eval population from the canonical reference scan.

The reference bundles exactly one labeled volume
(/root/reference/data/test_scan.npz, 160x192x224 vol+seg with the 30 eval
labels of labels.npz); its atlas blobs are not present in this checkout. To
run the BASELINE evaluation protocol (register pairs, transport the moving
seg nearest-neighbor, Dice over labels.npz) we therefore synthesize a
population of anatomically-consistent variants of that scan: each variant is
the scan pushed through a random smooth diffeomorphic warp (+ mild intensity
jitter), with its segmentation transported by the *same* warp. Registration
between two variants is then a genuine deformable-registration task with
label ground truth on both sides.

Deterministic: variant i depends only on --seed and i. Outputs
<out>/train_XXX.npz and <out>/test_XXX.npz ('vol' + 'seg' keys) and
<out>/train_list.txt / test_list.txt.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/reference/data/test_scan.npz",
                   help="labeled source scan (npz with vol+seg)")
    p.add_argument("--out", default="data_gen", help="output directory")
    p.add_argument("--num-train", type=int, default=20)
    p.add_argument("--num-test", type=int, default=6)
    p.add_argument("--warp-std", type=float, default=4.0,
                   help="std of the random stationary velocity fields (voxels)")
    p.add_argument("--warp-res", type=float, default=32.0,
                   help="spatial scale of the velocity fields (voxels)")
    p.add_argument("--seed", type=int, default=2026)
    p.add_argument("--splits", nargs="+", default=["train", "test"],
                   choices=["train", "test"],
                   help="which splits to (re)generate")
    p.add_argument("--downsample", type=int, default=1,
                   help="integer factor to shrink the generated volumes by "
                        "(vol: separable linear resize, seg: nearest). Use 2 "
                        "to evaluate models trained at half resolution (e.g. "
                        "SynthMorph at 80x96x112) on the same anatomy")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from voxelmorph_tpu.ops import warp as W
    from voxelmorph_tpu.ops.image import draw_multiscale_noise
    from voxelmorph_tpu.ops.interp import resize

    data = np.load(args.src)
    vol = data["vol"].astype(np.float32)
    vol = vol / max(float(vol.max()), 1e-6)
    seg = data["seg"].astype(np.float32)
    shape = vol.shape
    os.makedirs(args.out, exist_ok=True)

    @jax.jit
    def make_variant(key):
        k_svf, k_gamma, k_scale = jax.random.split(key, 3)
        svf = draw_multiscale_noise(k_svf, shape, (args.warp_res,),
                                    args.warp_std, nb_channels=len(shape))
        warp = W.integrate_vec(svf, nb_steps=5)
        v = W.transform(jnp.asarray(vol)[..., None], warp,
                        window_halo=None)[..., 0]
        s = W.transform(jnp.asarray(seg)[..., None], warp,
                        interp_method="nearest")[..., 0]
        # mild appearance jitter so pairs aren't trivially identical in
        # intensity: global gamma + scale
        gamma = jnp.exp(jax.random.normal(k_gamma, ()) * 0.1)
        scale = 1.0 + 0.05 * jax.random.normal(k_scale, ())
        v = jnp.clip(v, 0.0, 1.0) ** gamma * scale
        if args.downsample > 1:
            # same PRNG keys as the full-res set -> identical anatomy, so a
            # half-res model is scored on the same registration problems
            f = 1.0 / args.downsample
            v = resize(v[..., None], f)[..., 0]
            s = resize(s[..., None], f, interp_method="nearest")[..., 0]
        return v, s

    base = jax.random.PRNGKey(args.seed)
    lists = {"train": [], "test": []}
    for split_idx, (split, count) in enumerate(
            (("train", args.num_train), ("test", args.num_test))):
        if split not in args.splits:
            continue
        # fold in the split INDEX — folding a shared first character would
        # alias the splits and leak training variants into the test set
        split_key = jax.random.fold_in(base, split_idx)
        for i in range(count):
            key = jax.random.fold_in(split_key, i)
            v, s = make_variant(key)
            path = os.path.join(args.out, f"{split}_{i:03d}.npz")
            # uncompressed: the training host decompresses two volumes per
            # step, which would bottleneck a small-CPU host
            np.savez(path, vol=np.asarray(v, np.float32),
                     seg=np.asarray(s, np.int32))
            lists[split].append(os.path.abspath(path))
            print(f"wrote {path}")
        with open(os.path.join(args.out, f"{split}_list.txt"), "w") as f:
            f.write("\n".join(lists[split]) + "\n")

    if "test" in args.splits:
        # eval pair list: register test_i -> test_j for consecutive pairs
        pairs = [(lists["test"][i], lists["test"][(i + 1) % len(lists["test"])])
                 for i in range(len(lists["test"]))]
        with open(os.path.join(args.out, "test_pairs.txt"), "w") as f:
            f.write("\n".join(f"{a} {b}" for a, b in pairs) + "\n")
    print("done")


if __name__ == "__main__":
    main()
