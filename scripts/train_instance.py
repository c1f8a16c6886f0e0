#!/usr/bin/env python
"""Instance-specific registration: optimize a flow field for ONE image pair.

CLI-compatible with /root/reference/scripts/tf/train_instance.py: optionally
warm-started from a trained VxmDense model's predicted warp.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--moving', required=True, help='source (moving) volume to be warped')
    parser.add_argument('--fixed', required=True, help='target (fixed) volume to register to')
    parser.add_argument('--moved', required=True, help='where to write the warped (registered) volume')
    parser.add_argument('--model', help='warm-start the flow from a trained model checkpoint')
    parser.add_argument('--warp', help='where to write the dense displacement field')
    parser.add_argument('--multichannel', action='store_true')
    parser.add_argument('-g', '--gpu', help='ignored (TPU auto-detected)')
    parser.add_argument('--steps', type=int, default=200, help='num training steps')
    parser.add_argument('--lr', type=float, default=0.001)
    parser.add_argument('--int-steps', type=int, default=7)
    parser.add_argument('--int-downsize', type=int, default=2)
    parser.add_argument('--multiplier', type=float, default=1000)
    parser.add_argument('--image-loss', default='mse', help='mse or ncc')
    parser.add_argument('--lambda', type=float, dest='lambda_weight', default=0.01)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import InstanceDense, load_model
    from voxelmorph_tpu.training import LossTerm, Trainer

    add_feat_axis = not args.multichannel
    moving = vxm.py.utils.load_volfile(args.moving, add_batch_axis=True,
                                       add_feat_axis=add_feat_axis)
    fixed, fixed_affine = vxm.py.utils.load_volfile(
        args.fixed, add_batch_axis=True, add_feat_axis=add_feat_axis, ret_affine=True)

    inshape = moving.shape[1:-1]
    nb_feats = moving.shape[-1]
    model = InstanceDense(
        inshape=tuple(inshape),
        feats=nb_feats,
        mult=args.multiplier,
        int_steps=args.int_steps,
        int_resolution=args.int_downsize,
    )

    if args.image_loss == 'ncc':
        image_loss_func = vxm.losses.NCC().loss
    elif args.image_loss == 'mse':
        image_loss_func = vxm.losses.MSE().loss
    else:
        raise ValueError(f'Image loss should be "mse" or "ncc", but found "{args.image_loss}"')

    terms = [
        LossTerm('y_source', image_loss_func, weight=1.0, target_index=0),
        LossTerm('reg', vxm.losses.Grad('l2', loss_mult=args.int_downsize).loss,
                 weight=args.lambda_weight, target_index=1, name='grad'),
    ]
    trainer = Trainer(model, terms, lr=args.lr)
    trainer.init((moving,))

    # warm start from a trained model's preintegrated flow prediction
    if args.model is not None:
        vxm_model, vxm_params = load_model(args.model)
        out = vxm_model.apply({'params': vxm_params},
                              jnp.asarray(moving, jnp.float32),
                              jnp.asarray(fixed, jnp.float32), train=False)
        init_flow = np.asarray(out['preint_flow'])
        params = dict(trainer.params)
        params['flow'] = jnp.asarray(
            InstanceDense.flow_from_warp(init_flow, args.multiplier))
        trainer.init(None, params=params)

    zeros = np.zeros((1, *inshape, len(inshape)), dtype='float32')
    for step in range(args.steps):
        metrics = trainer.train_step((moving,), (fixed, zeros))
        if (step + 1) % 50 == 0:
            print(f"step {step + 1}/{args.steps} loss "
                  f"{float(metrics['loss']):.6f}")

    out = model.apply({'params': trainer.params}, jnp.asarray(moving, jnp.float32))
    moved = np.asarray(out['y_source'])
    warp = np.asarray(out['pos_flow'])

    if args.warp:
        vxm.py.utils.save_volfile(warp.squeeze(), args.warp, fixed_affine)
    vxm.py.utils.save_volfile(moved.squeeze(), args.moved, fixed_affine)


if __name__ == '__main__':
    main()
