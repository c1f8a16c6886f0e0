#!/usr/bin/env python
"""Train atlas-based Bayesian segmentation (ProbAtlasSegmentation).

CLI-compatible with /root/reference/scripts/tf/train_unsupervised_seg.py:
the data loss is the negative masked mean of the log-marginal 'loss volume',
masked by nonzero image voxels.
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
    parser.add_argument('--atlas', required=True, help='probabilistic atlas npz (vol)')
    parser.add_argument('--mapping', help='npz mapping full labels to tissue classes')
    parser.add_argument('--model-dir', default='models', help='directory for checkpoints and logs')
    parser.add_argument('--gpu', default='0', help='ignored (TPU auto-detected)')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--epochs', type=int, default=1500)
    parser.add_argument('--steps-per-epoch', type=int, default=100)
    parser.add_argument('--load-weights', help="checkpoint to start from; 'latest' resumes from model-dir")
    parser.add_argument('--initial-epoch', type=int, default=0)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--dtype', default='float32', choices=['float32', 'bfloat16'],
                        help='U-Net compute dtype (bfloat16 halves activation HBM)')
    parser.add_argument('--enc', type=int, nargs='+')
    parser.add_argument('--dec', type=int, nargs='+')
    parser.add_argument('--no-warp-atlas', action='store_true')
    parser.add_argument('--stat-pre-warp', action='store_true')
    parser.add_argument('--init-stat', help='npz with init_mu / init_sigma')
    parser.add_argument('--grad-loss-weight', type=float, default=10.0)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import ProbAtlasSegmentation
    from voxelmorph_tpu.training import resolve_dtype, LossTerm, Trainer

    # load prob atlas: (1, *shape, nb_labels)
    atlas = vxm.py.utils.load_volfile(args.atlas, np_var='vol', add_batch_axis=True)
    if atlas.ndim == 4:
        atlas = atlas[..., np.newaxis] if atlas.shape[-1] == 1 else atlas
    nb_labels = atlas.shape[-1]
    inshape = atlas.shape[1:-1]

    init_mu = np.load(args.init_stat)['init_mu'] if args.init_stat else None
    init_sigma = np.load(args.init_stat)['init_sigma'] if args.init_stat else None

    train_files = vxm.py.utils.read_file_list(args.img_list, prefix=args.img_prefix,
                                              suffix=args.img_suffix)
    assert len(train_files) > 0, 'Could not find any training data.'

    generator = vxm.generators.scan_to_atlas(train_files, atlas,
                                             batch_size=args.batch_size)
    sample = next(generator)

    enc_nf = args.enc if args.enc else [16, 32, 32, 32]
    dec_nf = args.dec if args.dec else [32, 32, 32, 32, 32, 16, 16]

    warp_atlas = not args.no_warp_atlas
    import jax.numpy as jnp
    model = ProbAtlasSegmentation(
        dtype=resolve_dtype(args.dtype),
        inshape=tuple(inshape),
        nb_unet_features=[enc_nf, dec_nf],
        nb_labels=nb_labels,
        stat_post_warp=(not args.stat_pre_warp),
        warp_atlas=warp_atlas,
        init_mu=None if init_mu is None else init_mu.tolist(),
        init_sigma=None if init_sigma is None else init_sigma.tolist(),
    )

    # data loss: negative mean log-marginal over nonzero image voxels. The
    # mask comes from the scan (inputs[0]), accessed via a callable weight:
    # mean(w * loss_vol) == -sum(mask * loss_vol) / sum(mask).
    def neg_masked_mean_weight(inputs, out):
        m = (inputs[0] > 0).astype(jnp.float32)
        # normalize so the weighted mean over the volume equals sum(l*m)/sum(m)
        return -m / jnp.maximum(jnp.mean(m), 1e-8)

    terms = [
        LossTerm('loss_vol', lambda _, yp: jnp.mean(yp, axis=-1, keepdims=True),
                 weight=neg_masked_mean_weight, target_index=0, name='nll'),
        LossTerm('flow', vxm.losses.Grad('l2', loss_mult=2).loss,
                 weight=args.grad_loss_weight if warp_atlas else 0.0,
                 target_index=1, name='grad'),
    ]

    # generator yields inputs [scan, atlas]; the model expects (image, atlas)
    trainer = Trainer(model, terms, lr=args.lr)
    from voxelmorph_tpu.training import init_or_resume
    args.initial_epoch = init_or_resume(trainer, args.load_weights, args.model_dir,
                                        tuple(sample[0]), args.initial_epoch)

    trainer.fit(generator, epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
                initial_epoch=args.initial_epoch, model_dir=args.model_dir,
                save_freq_epochs=20)


if __name__ == '__main__':
    main()
