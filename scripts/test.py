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
    parser.add_argument('--hyper', type=float, default=0.5,
                        help='hyperparameter for HyperMorph models (HyperVxmDense/'
                             'HyperVxmJoint; ignored by others)')
    parser.add_argument('--multichannel', action='store_true',
                        help='volumes already carry a trailing channel axis')
    parser.add_argument('--fast-warp', action='store_true',
                        help='time the phase-warp inference path (bounded Pallas '
                             'warps by the integration root; Dice is computed on '
                             'the seg transport by pos_flow and is unaffected)')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import load_model
    from voxelmorph_tpu.registration import (build_eval_register_fn,
                                             resolve_registration_model)

    if (args.img_prefix, args.img_suffix) == (args.seg_prefix, args.seg_suffix):
        sys.exit('Error: image and seg paths need a differing prefix or suffix.')
    img_pairs = vxm.py.utils.read_pair_list(args.pairs, prefix=args.img_prefix,
                                            suffix=args.img_suffix)
    seg_pairs = vxm.py.utils.read_pair_list(args.pairs, prefix=args.seg_prefix,
                                            suffix=args.seg_suffix)

    labels = np.load(args.labels) if args.labels else None
    feat_axis = not args.multichannel
    load = lambda path, var: vxm.py.utils.load_volfile(
        path, np_var=var, add_batch_axis=True, add_feat_axis=feat_axis)

    model, params = resolve_registration_model(*load_model(args.model))
    if args.fast_warp:
        from voxelmorph_tpu.registration import enable_fast_warp
        model = enable_fast_warp(model)
    register = build_eval_register_fn(model, hyper=args.hyper)

    timings, scores = [], []
    for i, ((mov_img, fix_img), (mov_seg, fix_seg)) in enumerate(
            zip(img_pairs, seg_pairs)):
        mv = jnp.asarray(load(mov_img, 'vol'), jnp.float32)
        fx = jnp.asarray(load(fix_img, 'vol'), jnp.float32)
        ms = jnp.asarray(load(mov_seg, 'seg'), jnp.float32)
        true_seg = vxm.py.utils.load_volfile(fix_seg, np_var='seg')

        start = time.time()
        moved, warp, warped_seg = register(params, mv, fx, ms)
        warped_seg = np.asarray(jax.block_until_ready(warped_seg)).squeeze()
        elapsed = time.time() - start
        if i:  # the first call pays compilation; exclude it like the reference
            timings.append(elapsed)

        overlap = vxm.py.utils.dice(warped_seg, true_seg, labels=labels)
        scores.append(np.mean(overlap))
        print('Pair %d    Reg Time: %.4f    Dice: %.4f +/- %.4f' % (
            i + 1, elapsed, np.mean(overlap), np.std(overlap)))

    print()
    print('Avg Reg Time: %.4f +/- %.4f  (skipping first prediction)' % (
        np.mean(timings), np.std(timings)))
    print('Avg Dice: %.4f +/- %.4f' % (np.mean(scores), np.std(scores)))


if __name__ == '__main__':
    main()
