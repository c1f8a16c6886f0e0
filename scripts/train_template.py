#!/usr/bin/env python
"""Build an unconditional deformable template (atlas) from a scan population.

CLI-compatible with /root/reference/scripts/tf/train_template.py.
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
    parser.add_argument('--init-template', help='volume used to seed the learnable template')
    parser.add_argument('--model-dir', default='models', help='directory for checkpoints and logs')
    parser.add_argument('--multichannel', action='store_true')
    parser.add_argument('--gpu', default='0', help='ignored (TPU auto-detected)')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--epochs', type=int, default=1500)
    parser.add_argument('--steps-per-epoch', type=int, default=100)
    parser.add_argument('--load-weights', help="checkpoint to start from; 'latest' resumes from model-dir")
    parser.add_argument('--initial-epoch', type=int, default=0)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--enc', type=int, nargs='+')
    parser.add_argument('--dec', type=int, nargs='+')
    parser.add_argument('--image-loss', default='ncc', help='mse or ncc')
    parser.add_argument('--dtype', default='float32', choices=['float32', 'bfloat16'],
                        help='U-Net compute dtype (bfloat16 halves activation HBM)')
    parser.add_argument('--image-loss-weight', type=float, default=1.0)
    parser.add_argument('--mean-loss-weight', type=float, default=1.0)
    parser.add_argument('--grad-loss-weight', type=float, default=1.0)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import TemplateCreation
    from voxelmorph_tpu.training import resolve_dtype, LossTerm, Trainer

    train_files = vxm.py.utils.read_file_list(args.img_list, prefix=args.img_prefix,
                                              suffix=args.img_suffix)
    assert len(train_files) > 0, 'Could not find any training data.'
    add_feat_axis = not args.multichannel

    generator = vxm.generators.template_creation(
        train_files, bidir=True, batch_size=args.batch_size,
        add_feat_axis=add_feat_axis)
    sample = next(generator)
    inshape = sample[0][0].shape[1:-1]
    nfeats = sample[0][0].shape[-1]

    enc_nf = args.enc if args.enc else [16, 32, 32, 32]
    dec_nf = args.dec if args.dec else [32, 32, 32, 32, 32, 16, 16]

    model = TemplateCreation(
        inshape=tuple(inshape),
        nb_unet_features=[enc_nf, dec_nf],
        atlas_feats=nfeats,
        src_feats=nfeats,
        dtype=resolve_dtype(args.dtype),
    )

    if args.image_loss == 'ncc':
        image_loss_func = vxm.losses.NCC().loss
    elif args.image_loss == 'mse':
        image_loss_func = vxm.losses.MSE().loss
    else:
        raise ValueError(f'Image loss should be "mse" or "ncc", but found "{args.image_loss}"')

    # targets: [scan, zeros, zeros, zeros]; y_target compares to the
    # *generated* atlas output, not a fixed input
    terms = [
        LossTerm('y_source', image_loss_func,
                 weight=args.image_loss_weight, target_index=0),
        LossTerm('y_target', image_loss_func,
                 weight=1 - args.image_loss_weight,
                 target_output_key='atlas_tensor', name='neg_img'),
        LossTerm('mean_stream', vxm.losses.MSE().loss,
                 weight=args.mean_loss_weight, target_index=1, name='mean_stream'),
        LossTerm('pos_flow', vxm.losses.Grad('l2', loss_mult=2).loss,
                 weight=args.grad_loss_weight, target_index=2, name='grad'),
    ]

    trainer = Trainer(model, terms, lr=args.lr)

    from voxelmorph_tpu.training import init_or_resume
    args.initial_epoch = init_or_resume(trainer, args.load_weights, args.model_dir,
                                        tuple(sample[0]), args.initial_epoch)

    if args.init_template and trainer.loaded_from is None:
        # seed the learnable atlas only on a FRESH start: re-seeding after a
        # checkpoint resume would discard the trained atlas and reset the
        # optimizer state
        template = vxm.py.utils.load_volfile(args.init_template,
                                             add_batch_axis=True,
                                             add_feat_axis=add_feat_axis)
        import jax.numpy as jnp
        params = dict(trainer.params)
        params = TemplateCreation.set_atlas(params, jnp.asarray(template))
        trainer.init(None, params=params)

    trainer.fit(generator, epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
                initial_epoch=args.initial_epoch, model_dir=args.model_dir,
                save_freq_epochs=20)


if __name__ == '__main__':
    main()
