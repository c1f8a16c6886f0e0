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
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    for path in sorted(glob.glob(os.path.join(args.src, "train_*.npz"))):
        seg = np.load(path)["seg"][::2, ::2, ::2].astype(np.int32)
        name = "lab_" + os.path.basename(path).split("_")[1]
        np.savez(os.path.join(args.out, name), vol=seg)

    tests = []
    for path in sorted(glob.glob(os.path.join(args.src, "test_*.npz"))):
        data = np.load(path)
        vol = data["vol"].astype(np.float32)
        # 2x2x2 mean pooling (shapes are even at 160x192x224)
        vol = vol.reshape(vol.shape[0] // 2, 2, vol.shape[1] // 2, 2,
                          vol.shape[2] // 2, 2).mean(axis=(1, 3, 5))
        seg = data["seg"][::2, ::2, ::2].astype(np.int32)
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
