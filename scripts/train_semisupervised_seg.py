#!/usr/bin/env python
"""Semi-supervised training with auxiliary segmentation warping + Dice loss.

CLI-compatible with /root/reference/scripts/tf/train_semisupervised_seg.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--img-list', required=True, help='text file with one training volume path per line')
    parser.add_argument('--img-suffix', help='string appended to every image path in the list')
    parser.add_argument('--seg-suffix', help='string appended to every seg path in the list')
    parser.add_argument('--img-prefix', help='string prepended to every image path in the list')
    parser.add_argument('--seg-prefix', help='string prepended to every seg path in the list')
    parser.add_argument('--labels', required=True, help='label list (npy) for dice loss')
    parser.add_argument('--model-dir', default='models', help='directory for checkpoints and logs')
    parser.add_argument('--atlas', help='optional atlas for scan-to-atlas training')
    parser.add_argument('--gpu', default='0', help='ignored (TPU auto-detected)')
    parser.add_argument('--epochs', type=int, default=1500)
    parser.add_argument('--steps-per-epoch', type=int, default=100)
    parser.add_argument('--load-weights', help="checkpoint to start from; 'latest' resumes from model-dir")
    parser.add_argument('--initial-epoch', type=int, default=0)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--enc', type=int, nargs='+')
    parser.add_argument('--dec', type=int, nargs='+')
    parser.add_argument('--int-steps', type=int, default=7)
    parser.add_argument('--int-downsize', type=int, default=2)
    parser.add_argument('--image-loss', default='mse', help='mse or ncc')
    parser.add_argument('--dtype', default='float32', choices=['float32', 'bfloat16'],
                        help='U-Net compute dtype (bfloat16 halves activation HBM)')
    parser.add_argument('--grad-loss-weight', type=float, default=0.01)
    parser.add_argument('--dice-loss-weight', type=float, default=0.01)
    parser.add_argument('--cache-device', action='store_true',
                        help='keep volumes + integer segs resident in device '
                             'HBM; one-hot encoding runs on device per step')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import VxmDenseSemiSupervisedSeg
    from voxelmorph_tpu.training import resolve_dtype, LossTerm, Trainer

    train_imgs = vxm.py.utils.read_file_list(args.img_list, prefix=args.img_prefix,
                                             suffix=args.img_suffix)
    assert len(train_imgs) > 0, 'Could not find any training data.'
    if args.img_prefix == args.seg_prefix and args.img_suffix == args.seg_suffix:
        # same path for image and seg is only meaningful for multi-variable
        # npz files carrying both 'vol' and 'seg'; anything else would
        # silently train against the image as its own segmentation
        if not train_imgs[0].endswith('.npz'):
            print('Error: Must provide a differing file suffix and/or prefix '
                  'for images and segs (unless files are npz with vol+seg).')
            sys.exit(1)
    train_segs = vxm.py.utils.read_file_list(args.img_list, prefix=args.seg_prefix,
                                             suffix=args.seg_suffix)

    train_labels = np.load(args.labels)
    if args.cache_device:
        if args.atlas or train_segs != train_imgs:
            print('Error: --cache-device currently requires scan-to-scan '
                  'training with vol+seg npz files.')
            sys.exit(1)
        from voxelmorph_tpu.training import (
            device_cached_semisupervised_generator)
        generator = device_cached_semisupervised_generator(
            train_imgs, labels=train_labels)
    else:
        generator = vxm.generators.semisupervised(
            train_imgs, train_segs, labels=train_labels, atlas_file=args.atlas)
    sample = next(generator)
    inshape = sample[0][0].shape[1:-1]

    enc_nf = args.enc if args.enc else [16, 32, 32, 32]
    dec_nf = args.dec if args.dec else [32, 32, 32, 32, 32, 16, 16]

    model = VxmDenseSemiSupervisedSeg(
        inshape=tuple(inshape),
        nb_unet_features=[enc_nf, dec_nf],
        nb_labels=len(train_labels),
        int_steps=args.int_steps,
        int_resolution=args.int_downsize,
        dtype=resolve_dtype(args.dtype),
    )

    if args.image_loss == 'ncc':
        image_loss_func = vxm.losses.NCC().loss
    elif args.image_loss == 'mse':
        image_loss_func = vxm.losses.MSE().loss
    else:
        raise ValueError(f'Image loss should be "mse" or "ncc", but found "{args.image_loss}"')

    # generator targets: [trg_vol, zero_warp, trg_seg]
    terms = [
        LossTerm('y_source', image_loss_func, weight=1.0, target_index=0),
        LossTerm('reg', vxm.losses.Grad('l2', loss_mult=args.int_downsize).loss,
                 weight=args.grad_loss_weight, target_index=1, name='grad'),
        LossTerm('y_seg_source', vxm.losses.Dice().loss,
                 weight=args.dice_loss_weight, target_index=2, name='dice'),
    ]

    trainer = Trainer(model, terms, lr=args.lr)
    from voxelmorph_tpu.training import init_or_resume
    args.initial_epoch = init_or_resume(trainer, args.load_weights, args.model_dir,
                                        tuple(sample[0]), args.initial_epoch)

    if args.cache_device and args.initial_epoch:
        # restart the stateless stream just past the shape-probing sample
        # (see scripts/train.py) so resumes replay the uninterrupted sequence
        generator = device_cached_semisupervised_generator(
            train_imgs, labels=train_labels,
            start_step=args.initial_epoch * args.steps_per_epoch + 1)

    trainer.fit(generator, epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
                initial_epoch=args.initial_epoch, model_dir=args.model_dir,
                save_freq_epochs=10)


if __name__ == '__main__':
    main()
