#!/usr/bin/env python
"""Train a VxmDense registration model (TPU-native).

CLI-compatible with the reference trainer (/root/reference/scripts/tf/train.py):
scan-to-atlas when --atlas is given, else scan-to-scan; mse/ncc image loss +
Grad-l2 or (with --use-probs) KL regularization; bidir halves image weights.

TPU specifics: one jitted sharded train step over a ('data','space') device
mesh — batch size should be a multiple of the device count for pure DP.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()

    # data organization parameters
    parser.add_argument('--img-list', required=True, help='line-seperated list of training files')
    parser.add_argument('--img-prefix', help='optional input image file prefix')
    parser.add_argument('--img-suffix', help='optional input image file suffix')
    parser.add_argument('--atlas', help='optional atlas filename')
    parser.add_argument('--model-dir', default='models',
                        help='model output directory (default: models)')
    parser.add_argument('--multichannel', action='store_true',
                        help='specify that data has multiple channels')

    # training parameters
    parser.add_argument('--gpu', default='0', help='ignored (TPU devices are auto-detected)')
    parser.add_argument('--batch-size', type=int, default=1, help='batch size (default: 1)')
    parser.add_argument('--epochs', type=int, default=1500,
                        help='number of training epochs (default: 1500)')
    parser.add_argument('--steps-per-epoch', type=int, default=100,
                        help='steps per epoch (default: 100)')
    parser.add_argument('--load-weights', help='optional weights file to initialize with')
    parser.add_argument('--initial-epoch', type=int, default=0,
                        help='initial epoch number (default: 0)')
    parser.add_argument('--lr', type=float, default=1e-4, help='learning rate (default: 1e-4)')
    parser.add_argument('--spatial-shard', action='store_true',
                        help='also shard the first spatial axis across the mesh space axis')

    # network architecture parameters
    parser.add_argument('--enc', type=int, nargs='+',
                        help='list of unet encoder filters (default: 16 32 32 32)')
    parser.add_argument('--dec', type=int, nargs='+',
                        help='list of unet decorder filters (default: 32 32 32 32 32 16 16)')
    parser.add_argument('--int-steps', type=int, default=7,
                        help='number of integration steps (default: 7)')
    parser.add_argument('--int-downsize', type=int, default=2,
                        help='flow downsample factor for integration (default: 2)')
    parser.add_argument('--use-probs', action='store_true', help='enable probabilities')
    parser.add_argument('--bidir', action='store_true', help='enable bidirectional cost function')

    # loss hyperparameters
    parser.add_argument('--image-loss', default='mse',
                        help='image reconstruction loss - can be mse or ncc (default: mse)')
    parser.add_argument('--lambda', type=float, dest='lambda_weight', default=0.01,
                        help='weight of gradient or KL loss (default: 0.01)')
    parser.add_argument('--kl-lambda', type=float, default=10,
                        help='prior lambda regularization for KL loss (default: 10)')
    parser.add_argument('--legacy-image-sigma', dest='image_sigma', type=float, default=1.0,
                        help='image noise parameter for miccai 2018 network '
                             '(recommended value is 0.02 when --use-probs is enabled)')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import VxmDense
    from voxelmorph_tpu.training import LossTerm, Trainer

    train_files = vxm.py.utils.read_file_list(args.img_list, prefix=args.img_prefix,
                                              suffix=args.img_suffix)
    assert len(train_files) > 0, 'Could not find any training data.'

    add_feat_axis = not args.multichannel

    if args.atlas:
        atlas = vxm.py.utils.load_volfile(args.atlas, np_var='vol',
                                          add_batch_axis=True, add_feat_axis=add_feat_axis)
        generator = vxm.generators.scan_to_atlas(train_files, atlas,
                                                 batch_size=args.batch_size,
                                                 bidir=args.bidir,
                                                 add_feat_axis=add_feat_axis)
    else:
        generator = vxm.generators.scan_to_scan(
            train_files, batch_size=args.batch_size, bidir=args.bidir,
            add_feat_axis=add_feat_axis)

    sample = next(generator)
    inshape = sample[0][0].shape[1:-1]
    nfeats = sample[0][0].shape[-1]

    enc_nf = args.enc if args.enc else [16, 32, 32, 32]
    dec_nf = args.dec if args.dec else [32, 32, 32, 32, 32, 16, 16]

    model = VxmDense(
        inshape=tuple(inshape),
        nb_unet_features=[enc_nf, dec_nf],
        bidir=args.bidir,
        use_probs=args.use_probs,
        int_steps=args.int_steps,
        int_resolution=args.int_downsize,
        src_feats=nfeats,
        trg_feats=nfeats,
    )

    # image loss
    if args.image_loss == 'ncc':
        image_loss_func = vxm.losses.NCC().loss
    elif args.image_loss == 'mse':
        image_loss_func = vxm.losses.MSE(args.image_sigma).loss
    else:
        raise ValueError(f'Image loss should be "mse" or "ncc", but found "{args.image_loss}"')

    terms = [LossTerm('y_source', image_loss_func,
                      weight=0.5 if args.bidir else 1.0, target_index=0)]
    if args.bidir:
        terms.append(LossTerm('y_target', image_loss_func, weight=0.5, target_index=1))

    reg_target = len(terms)
    if args.use_probs:
        # KL needs the flow_params grid shape (svf resolution = full res here)
        flow_shape = tuple(inshape)
        terms.append(LossTerm('reg', vxm.losses.KL(args.kl_lambda, flow_shape).loss,
                              weight=args.lambda_weight, target_index=reg_target, name='kl'))
    else:
        terms.append(LossTerm('reg', vxm.losses.Grad('l2', loss_mult=args.int_downsize).loss,
                              weight=args.lambda_weight, target_index=reg_target, name='grad'))

    trainer = Trainer(model, terms, lr=args.lr, needs_sample_rng=args.use_probs)

    if args.load_weights == 'latest':
        # preemption recovery: resume from the newest checkpoint in model-dir
        from voxelmorph_tpu.training import find_latest_checkpoint
        path, epoch = find_latest_checkpoint(args.model_dir)
        if path:
            print(f'resuming from {path} (epoch {epoch})')
            trainer.load(path)
            args.initial_epoch = max(args.initial_epoch, epoch)
        else:
            trainer.init(tuple(sample[0]))
    elif args.load_weights:
        trainer.load(args.load_weights)
    else:
        trainer.init(tuple(sample[0]))

    trainer.fit(generator,
                epochs=args.epochs,
                steps_per_epoch=args.steps_per_epoch,
                initial_epoch=args.initial_epoch,
                model_dir=args.model_dir,
                save_freq_epochs=20)


if __name__ == '__main__':
    main()
