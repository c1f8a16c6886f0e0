#!/usr/bin/env python
"""Dice evaluation over registered image pairs (reference: scripts/tf/test.py).

For each pair: predict the warp (timed), transport the moving segmentation
with nearest-neighbor interpolation via the SAME fused jitted call, and
compute hard-label Dice against the fixed segmentation. The first prediction
(compile) is excluded from timing, like the reference.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--gpu', help='ignored (TPU devices are auto-detected)')
    parser.add_argument('--model', required=True, help='trained registration checkpoint (.npz)')
    parser.add_argument('--pairs', required=True, help='text file listing moving/fixed pairs, one pair per line')
    parser.add_argument('--img-suffix', help='string appended to every image path in the list')
    parser.add_argument('--seg-suffix', help='string appended to every seg path in the list')
    parser.add_argument('--img-prefix', help='string prepended to every image path in the list')
    parser.add_argument('--seg-prefix', help='string prepended to every seg path in the list')
    parser.add_argument('--labels', help='optional label list to compute dice for (npy format)')
    parser.add_argument('--multichannel', action='store_true',
                        help='volumes already carry a trailing channel axis')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import load_model
    from voxelmorph_tpu.registration import build_register_seg_fn

    if args.img_prefix == args.seg_prefix and args.img_suffix == args.seg_suffix:
        print('Error: Must provide a differing file suffix and/or prefix for images and segs.')
        sys.exit(1)
    img_pairs = vxm.py.utils.read_pair_list(args.pairs, prefix=args.img_prefix,
                                            suffix=args.img_suffix)
    seg_pairs = vxm.py.utils.read_pair_list(args.pairs, prefix=args.seg_prefix,
                                            suffix=args.seg_suffix)

    labels = np.load(args.labels) if args.labels else None
    add_feat_axis = not args.multichannel

    model, params = load_model(args.model)
    register = build_register_seg_fn(model)

    reg_times = []
    dice_means = []

    for i in range(len(img_pairs)):
        moving_vol = vxm.py.utils.load_volfile(
            img_pairs[i][0], np_var='vol', add_batch_axis=True, add_feat_axis=add_feat_axis)
        moving_seg = vxm.py.utils.load_volfile(
            seg_pairs[i][0], np_var='seg', add_batch_axis=True, add_feat_axis=add_feat_axis)
        fixed_vol = vxm.py.utils.load_volfile(
            img_pairs[i][1], np_var='vol', add_batch_axis=True, add_feat_axis=add_feat_axis)
        fixed_seg = vxm.py.utils.load_volfile(seg_pairs[i][1], np_var='seg')

        mv = jnp.asarray(moving_vol, jnp.float32)
        fx = jnp.asarray(fixed_vol, jnp.float32)
        ms = jnp.asarray(moving_seg, jnp.float32)

        start = time.time()
        moved, warp, warped_seg = register(params, mv, fx, ms)
        warped_seg = np.asarray(jax.block_until_ready(warped_seg)).squeeze()
        reg_time = time.time() - start
        if i != 0:
            reg_times.append(reg_time)

        overlap = vxm.py.utils.dice(warped_seg, fixed_seg, labels=labels)
        dice_means.append(np.mean(overlap))
        print('Pair %d    Reg Time: %.4f    Dice: %.4f +/- %.4f' % (
            i + 1, reg_time, np.mean(overlap), np.std(overlap)))

    print()
    print('Avg Reg Time: %.4f +/- %.4f  (skipping first prediction)' % (
        np.mean(reg_times), np.std(reg_times)))
    print('Avg Dice: %.4f +/- %.4f' % (np.mean(dice_means), np.std(dice_means)))


if __name__ == '__main__':
    main()
