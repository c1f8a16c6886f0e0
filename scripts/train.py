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
    parser.add_argument('--img-list', required=True, help='text file with one training volume path per line')
    parser.add_argument('--img-prefix', help='string prepended to every image path in the list')
    parser.add_argument('--img-suffix', help='string appended to every image path in the list')
    parser.add_argument('--atlas', help='register every scan to this atlas instead of scan-to-scan')
    parser.add_argument('--model-dir', default='models',
                        help='directory for checkpoints and logs (default: models)')
    parser.add_argument('--multichannel', action='store_true',
                        help='volumes already carry a trailing channel axis')

    # training parameters
    parser.add_argument('--gpu', default='0', help='ignored (TPU devices are auto-detected)')
    parser.add_argument('--batch-size', type=int, default=1, help='number of volume pairs per training step (default: 1)')
    parser.add_argument('--epochs', type=int, default=1500,
                        help='total epochs to train (default: 1500)')
    parser.add_argument('--steps-per-epoch', type=int, default=100,
                        help='training steps per epoch (default: 100)')
    parser.add_argument('--load-weights', help="checkpoint to start from; 'latest' resumes from model-dir")
    parser.add_argument('--initial-epoch', type=int, default=0,
                        help='epoch to start counting from, e.g. when resuming (default: 0)')
    parser.add_argument('--lr', type=float, default=1e-4, help='Adam learning rate (default: 1e-4)')
    parser.add_argument('--clip-grad', type=float,
                        help='optional global-norm gradient clip (stabilizes '
                             'learning rates above the reference default)')
    parser.add_argument('--spatial-shard', action='store_true',
                        help='also shard the first spatial axis across the mesh space axis')
    parser.add_argument('--steps-per-dispatch', type=int, default=None,
                        help='with --cache-device: run this many train steps '
                             'per device dispatch via lax.scan (0 = whole '
                             'epoch); amortizes the per-dispatch host round '
                             'trip on tunneled/remote TPUs')
    parser.add_argument('--cache-device', action='store_true',
                        help='preload the whole training set into device HBM and '
                             'sample pairs on-device (removes per-step host transfers)')

    # multi-host: run one process per host of a TPU pod slice; the mesh then
    # spans every host's chips (DP gradients psum over ICI, DCN across slices)
    parser.add_argument('--coordinator',
                        help='address of process 0, e.g. host0:8476 (multi-host only)')
    parser.add_argument('--num-processes', type=int, default=1,
                        help='total number of host processes in the job')
    parser.add_argument('--process-id', type=int, default=0,
                        help='index of this host process (0-based)')

    # network architecture parameters
    parser.add_argument('--enc', type=int, nargs='+',
                        help='encoder feature counts for the U-Net (default: 16 32 32 32)')
    parser.add_argument('--dec', type=int, nargs='+',
                        help='decoder feature counts for the U-Net (default: 32 32 32 32 32 16 16)')
    parser.add_argument('--int-steps', type=int, default=7,
                        help='scaling-and-squaring steps for the SVF (default: 7)')
    parser.add_argument('--int-downsize', type=int, default=2,
                        help='integrate the flow at 1/N resolution to save memory (default: 2)')
    parser.add_argument('--dtype', default='float32', choices=['float32', 'bfloat16'],
                        help='U-Net compute dtype; bfloat16 doubles MXU throughput '
                             '(params/losses/flow integration stay float32)')
    parser.add_argument('--use-probs', action='store_true', help='use the probabilistic (MICCAI-2018) flow head')
    parser.add_argument('--save-freq', type=int, default=20,
                        help='checkpoint every N epochs (default: 20)')
    parser.add_argument('--bidir', action='store_true', help='train with symmetric (forward + inverse) image losses')

    # loss hyperparameters
    parser.add_argument('--image-loss', default='mse',
                        help="similarity loss, 'mse' or 'ncc' (default: mse)")
    parser.add_argument('--lambda', type=float, dest='lambda_weight', default=0.01,
                        help='weight of gradient or KL loss (default: 0.01)')
    parser.add_argument('--kl-lambda', type=float, default=10,
                        help='precision of the flow prior in the KL term (default: 10)')
    parser.add_argument('--legacy-image-sigma', dest='image_sigma', type=float, default=1.0,
                        help='image noise parameter for miccai 2018 network '
                             '(recommended value is 0.02 when --use-probs is enabled)')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    if args.num_processes > 1:
        # must run before anything else touches the jax backend
        from voxelmorph_tpu.parallel.mesh import initialize_distributed
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import VxmDense
    from voxelmorph_tpu.training import resolve_dtype, LossTerm, Trainer

    train_files = vxm.py.utils.read_file_list(args.img_list, prefix=args.img_prefix,
                                              suffix=args.img_suffix)
    assert len(train_files) > 0, 'Could not find any training data.'

    add_feat_axis = not args.multichannel

    if args.cache_device:
        from voxelmorph_tpu.training import device_cached_pair_generator
        atlas = None
        if args.atlas:
            atlas = vxm.py.utils.load_volfile(args.atlas, np_var='vol',
                                              add_batch_axis=True,
                                              add_feat_axis=add_feat_axis)[0]
        generator = device_cached_pair_generator(
            train_files, batch_size=args.batch_size, bidir=args.bidir,
            atlas=atlas, add_feat_axis=add_feat_axis)
    elif args.atlas:
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
        dtype=resolve_dtype(args.dtype),
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

    trainer = Trainer(model, terms, lr=args.lr, needs_sample_rng=args.use_probs,
                      spatial_shard=args.spatial_shard, clip_norm=args.clip_grad)

    from voxelmorph_tpu.training import init_or_resume
    args.initial_epoch = init_or_resume(trainer, args.load_weights, args.model_dir,
                                        tuple(sample[0]), args.initial_epoch)

    if args.steps_per_dispatch is not None:
        if not args.cache_device:
            raise SystemExit('--steps-per-dispatch requires --cache-device')
        from voxelmorph_tpu.training import load_volume_stack
        data = load_volume_stack(train_files, add_feat_axis=add_feat_axis)
        # +1: the shape-probing `sample = next(generator)` consumed stream
        # step 0, matching the per-step path's sequence exactly
        trainer.fit_cached_pairs(
            data, epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
            steps_per_dispatch=args.steps_per_dispatch,
            batch_size=args.batch_size, bidir=args.bidir, atlas=atlas,
            start_step=args.initial_epoch * args.steps_per_epoch + 1,
            initial_epoch=args.initial_epoch, model_dir=args.model_dir,
            save_freq_epochs=args.save_freq)
        return

    if args.cache_device and args.initial_epoch:
        # rebuild the device-cached stream at the resumed position so a
        # resumed run sees the batch sequence the uninterrupted run would
        # +1: the shape-probing `sample = next(generator)` of the fresh run
        # consumed stream step 0, so epoch e trains on steps
        # e*S+1 .. (e+1)*S; resuming at epoch k must continue from k*S+1
        generator = device_cached_pair_generator(
            train_files, batch_size=args.batch_size, bidir=args.bidir,
            atlas=atlas, add_feat_axis=add_feat_axis,
            start_step=args.initial_epoch * args.steps_per_epoch + 1)

    trainer.fit(generator,
                epochs=args.epochs,
                steps_per_epoch=args.steps_per_epoch,
                initial_epoch=args.initial_epoch,
                model_dir=args.model_dir,
                save_freq_epochs=args.save_freq)


if __name__ == '__main__':
    main()
