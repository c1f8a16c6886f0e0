#!/usr/bin/env python
"""Apply a saved dense warp to an image (reference: scripts/tf/warp.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--moving', required=True, help='source (moving) volume')
    parser.add_argument('--warp', required=True, help='dense displacement field to apply')
    parser.add_argument('--moved', required=True, help='where to write the warped volume')
    parser.add_argument('--interp', default='linear',
                        help="resampling mode, 'linear' or 'nearest' (default: linear)")
    parser.add_argument('--gpu', help='ignored (TPU devices are auto-detected)')
    parser.add_argument('--multichannel', action='store_true',
                        help='volumes already carry a trailing channel axis')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.ops import warp as warp_ops

    add_feat_axis = not args.multichannel
    moving = vxm.py.utils.load_volfile(args.moving, add_batch_axis=True,
                                       add_feat_axis=add_feat_axis)
    deform, deform_affine = vxm.py.utils.load_volfile(
        args.warp, add_batch_axis=True, ret_affine=True)

    warp_fn = jax.jit(jax.vmap(
        lambda i, t: warp_ops.transform(i, t, interp_method=args.interp)))
    moved = warp_fn(jnp.asarray(moving, jnp.float32), jnp.asarray(deform, jnp.float32))

    vxm.py.utils.save_volfile(np.asarray(moved).squeeze(), args.moved, deform_affine)


if __name__ == '__main__':
    main()
