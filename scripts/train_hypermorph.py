#!/usr/bin/env python
"""Train a HyperMorph model: amortized hyperparameter (lambda) learning.

CLI-compatible with /root/reference/scripts/tf/train_hypermorph.py: each
sample draws a random lambda (endpoints oversampled), the image loss is
weighted by (1 - lambda) and the gradient loss by lambda, per sample.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--img-list', required=True, help='text file with one training volume path per line')
    parser.add_argument('--img-prefix', help='string prepended to every image path in the list')
    parser.add_argument('--img-suffix', help='string appended to every image path in the list')
    parser.add_argument('--atlas', help='path to the atlas volume')
    parser.add_argument('--model-dir', default='models', help='directory for checkpoints and logs')
    parser.add_argument('--multichannel', action='store_true')
    parser.add_argument('--test-reg', nargs=3,
                        help='example registration pair and output prefix for lambda sweep')
    parser.add_argument('--gpu', default='0', help='ignored (TPU auto-detected)')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--epochs', type=int, default=6000)
    parser.add_argument('--steps-per-epoch', type=int, default=100)
    parser.add_argument('--load-weights', help="checkpoint to start from; 'latest' resumes from model-dir")
    parser.add_argument('--initial-epoch', type=int, default=0)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--dtype', default='float32', choices=['float32', 'bfloat16'],
                        help='U-Net compute dtype (bfloat16 halves activation HBM)')
    parser.add_argument('--enc', type=int, nargs='+')
    parser.add_argument('--dec', type=int, nargs='+')
    parser.add_argument('--int-steps', type=int, default=7)
    parser.add_argument('--int-downsize', type=int, default=2)
    parser.add_argument('--image-loss', default='mse', help='mse or ncc')
    parser.add_argument('--image-sigma', type=float, default=0.05)
    parser.add_argument('--oversample-rate', type=float, default=0.2,
                        help='hyperparameter end-point over-sample rate')
    parser.add_argument('--save-freq', type=int, default=100,
                        help='checkpoint every this many epochs')
    parser.add_argument('--cache-device', action='store_true',
                        help='cache all training volumes in device HBM; the host '
                             'streams only sample indices and the per-sample '
                             'lambda array (recommended on tunneled TPUs)')
    parser.add_argument('--steps-per-dispatch', type=int, default=None,
                        help='with --cache-device: run this many train steps '
                             'per device dispatch via lax.scan (0 = whole '
                             'epoch); amortizes the per-dispatch host round '
                             'trip on tunneled/remote TPUs')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import HyperVxmDense
    from voxelmorph_tpu.training import resolve_dtype, LossTerm, Trainer

    train_files = vxm.py.utils.read_file_list(args.img_list, prefix=args.img_prefix,
                                              suffix=args.img_suffix)
    assert len(train_files) > 0, 'Could not find any training data.'
    add_feat_axis = not args.multichannel

    atlas = None
    if args.atlas:
        atlas = vxm.py.utils.load_volfile(args.atlas, np_var='vol',
                                          add_batch_axis=True,
                                          add_feat_axis=add_feat_axis)

    def make_base_generator(start_step=0):
        if args.cache_device:
            from voxelmorph_tpu.training import device_cached_pair_generator
            return device_cached_pair_generator(
                train_files, batch_size=args.batch_size,
                atlas=atlas[0] if atlas is not None else None,
                add_feat_axis=add_feat_axis, start_step=start_step)
        if atlas is not None:
            return vxm.generators.scan_to_atlas(
                train_files, atlas, batch_size=args.batch_size,
                add_feat_axis=add_feat_axis)
        return vxm.generators.scan_to_scan(
            train_files, batch_size=args.batch_size, add_feat_axis=add_feat_axis)

    def random_hyperparam(rng):
        if rng.random() < args.oversample_rate:
            return float(rng.choice([0, 1]))
        return float(rng.random())

    def hyp_stream(start_step=0):
        # lambda draws are STATELESS per step (rng keyed by (seed, step)) so a
        # resumed run replays the exact hyperparameter sequence, matching the
        # device_cached_pair_generator resume contract; yields 1-tuples per
        # the fit_cached_pairs extra_stream contract
        step = start_step
        while True:
            rng = np.random.default_rng((2027, step))
            yield (np.expand_dims(
                [random_hyperparam(rng) for _ in range(args.batch_size)], -1
            ).astype('float32'),)
            step += 1

    def hyp_generator(start_step=0):
        base_generator = make_base_generator(start_step)
        hyps = hyp_stream(start_step)
        while True:
            (hyp,) = next(hyps)
            inputs, outputs = next(base_generator)
            yield (*inputs, hyp), outputs

    generator = hyp_generator()
    sample = next(generator)
    inshape = sample[0][0].shape[1:-1]
    nfeats = sample[0][0].shape[-1]

    enc_nf = args.enc if args.enc else [16, 32, 32, 32]
    dec_nf = args.dec if args.dec else [32, 32, 32, 32, 32, 16, 16]

    model = HyperVxmDense(
        dtype=resolve_dtype(args.dtype),
        inshape=tuple(inshape),
        nb_unet_features=[enc_nf, dec_nf],
        int_steps=args.int_steps,
        int_resolution=args.int_downsize,
        svf_resolution=2,
        src_feats=nfeats,
        trg_feats=nfeats,
    )

    if args.image_loss == 'ncc':
        image_loss_func = vxm.losses.NCC().loss
    elif args.image_loss == 'mse':
        scaling = 1.0 / (args.image_sigma ** 2)
        image_loss_func = lambda yt, yp: scaling * jnp.mean(
            jnp.square(yt - yp).reshape(yp.shape[0], -1), axis=-1)
    else:
        raise ValueError(f'Image loss should be "mse" or "ncc", but found "{args.image_loss}"')

    # per-sample weights derived from the hyp input (last input)
    hyp_of = lambda inputs: jnp.squeeze(inputs[-1], axis=-1)
    terms = [
        LossTerm('y_source', image_loss_func,
                 weight=lambda inputs, out: 1.0 - hyp_of(inputs),
                 target_index=0),
        LossTerm('reg', vxm.losses.Grad('l2', loss_mult=args.int_downsize).loss,
                 weight=lambda inputs, out: hyp_of(inputs),
                 target_index=1, name='grad'),
    ]

    trainer = Trainer(model, terms, lr=args.lr)
    from voxelmorph_tpu.training import init_or_resume
    args.initial_epoch = init_or_resume(trainer, args.load_weights, args.model_dir,
                                        tuple(sample[0]), args.initial_epoch)

    if args.steps_per_dispatch is not None:
        if not args.cache_device:
            raise SystemExit('--steps-per-dispatch requires --cache-device')
        from voxelmorph_tpu.training import load_volume_stack
        data = load_volume_stack(train_files, add_feat_axis=add_feat_axis)
        # +1: the shape-probing `next(generator)` above consumed stream step 0
        start = args.initial_epoch * args.steps_per_epoch + 1
        trainer.fit_cached_pairs(
            data, epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
            steps_per_dispatch=args.steps_per_dispatch,
            batch_size=args.batch_size,
            atlas=atlas[0] if atlas is not None else None,
            start_step=start, extra_stream=hyp_stream(start),
            initial_epoch=args.initial_epoch, model_dir=args.model_dir,
            save_freq_epochs=args.save_freq)
    else:
        if args.initial_epoch:
            # +1: the shape probe above consumed stream step 0
            generator = hyp_generator(
                start_step=args.initial_epoch * args.steps_per_epoch + 1)
        trainer.fit(generator, epochs=args.epochs,
                    steps_per_epoch=args.steps_per_epoch,
                    initial_epoch=args.initial_epoch, model_dir=args.model_dir,
                    save_freq_epochs=args.save_freq)

    # sweep across 20 values of lambda on an example pair
    if args.test_reg:
        moving = vxm.py.utils.load_volfile(args.test_reg[0], add_batch_axis=True,
                                           add_feat_axis=add_feat_axis)
        fixed = vxm.py.utils.load_volfile(args.test_reg[1], add_batch_axis=True,
                                          add_feat_axis=add_feat_axis)
        moved = []
        for hyp in np.linspace(0, 1, 20):
            h = np.array([[hyp]], dtype='float32')
            out = model.apply({'params': trainer.params},
                              jnp.asarray(moving), jnp.asarray(fixed),
                              jnp.asarray(h), train=False)
            moved.append(np.asarray(out['y_source']).squeeze())
        moved = np.stack(moved, axis=-1)
        if moved.ndim == 3:
            moved = np.expand_dims(moved, axis=-2)
        vxm.py.utils.save_volfile(moved, args.test_reg[2])


if __name__ == '__main__':
    main()
