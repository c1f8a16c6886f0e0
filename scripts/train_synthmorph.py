#!/usr/bin/env python
"""Train a SynthMorph model on images synthesized from label maps.

CLI-compatible with /root/reference/scripts/tf/train_synthmorph.py. The
synthesis pipeline runs ON DEVICE inside the jitted train step (rng stream
'synth'), so the host only streams integer label maps.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument('--label-dir', nargs='+', required=True,
                   help='directory/glob of integer label maps to synthesize from')
    p.add_argument('--model-dir', default='models', help='directory for checkpoints and logs')
    p.add_argument('--sub-dir', help='optional subfolder for model saves')

    p.add_argument('--same-subj', action='store_true',
                   help='synthesize both images of a pair from one label map')
    p.add_argument('--blur-std', type=float, default=1, help='upper bound on the random smoothing sigma')
    p.add_argument('--gamma', type=float, default=0.25, help='standard deviation of the random contrast (gamma) jitter')
    p.add_argument('--vel-std', type=float, default=0.5, help='standard deviation of the random velocity fields')
    p.add_argument('--vel-res', type=float, nargs='+', default=[16], help='spatial scale(s) of the random velocity fields')
    p.add_argument('--bias-std', type=float, default=0.3, help='standard deviation of the random bias fields')
    p.add_argument('--bias-res', type=float, nargs='+', default=[40], help='spatial scale(s) of the random bias fields')
    p.add_argument('--out-shape', type=int, nargs='+', help='pad synthesized volumes to this spatial shape')
    p.add_argument('--out-labels', default='fs_labels.npy', help='labels to optimize')

    p.add_argument('--gpu', type=str, default='0', help='ignored (TPU auto-detected)')
    p.add_argument('--epochs', type=int, default=1500, help='total epochs to train')
    p.add_argument('--steps-per-epoch', type=int, default=100, help='steps per epoch')
    p.add_argument('--batch-size', type=int, default=1, help='number of samples per training step')
    p.add_argument('--init-weights', help="checkpoint to start from; 'latest' resumes from model-dir")
    p.add_argument('--save-freq', type=int, default=20, help='checkpoint-writing period, in epochs')
    p.add_argument('--reg-param', type=float, default=1., help='weight of the flow-gradient smoothness term')
    p.add_argument('--sup-flow-weight', type=float, default=0.,
                   help='weight of a supervised MSE term between pos_flow and '
                        'the exact synthesis ground-truth flow (same-subject '
                        'pairs only — use with --same-subj). Bootstrap phase: '
                        'train with this > 0 first, then resume without it; '
                        'the dense supervision escapes the zero-flow attractor '
                        'that the boundary-local Dice gradient cannot.')
    p.add_argument('--image-loss-weight', type=float, default=0.,
                   help='weight of a windowed-NCC term between the warped '
                        'source image and the target image. Only meaningful '
                        'while --shared-contrast is high (same-modality '
                        'pairs); anneal to 0 for the contrast-agnostic '
                        'endgame. 0 = reference loss set (Dice+Grad).')
    p.add_argument('--shared-contrast', type=float, default=0.,
                   help='probability that both images of a pair share one '
                        'per-label GMM intensity draw. Sharing contrasts '
                        'early makes local intensity cues informative from '
                        'step one; anneal toward 0 (the contrast-agnostic '
                        'SynthMorph endgame) across phases.')
    p.add_argument('--lr', type=float, default=1e-4, help='Adam learning rate')
    p.add_argument('--dtype', default='float32', choices=['float32', 'bfloat16'],
                   help='U-Net compute dtype (bfloat16 halves activation HBM)')
    p.add_argument('--clip-grad', type=float,
                   help='optional global-norm gradient clip (stabilizes '
                        'learning rates above the reference default)')
    p.add_argument('--init-epoch', type=int, default=0, help='epoch to start counting from, e.g. when resuming')
    p.add_argument('--cache-device', action='store_true',
                   help='keep the label-map population resident in device HBM '
                        'and sample pairs by index (recommended on TPU)')
    p.add_argument('--steps-per-dispatch', type=int, default=1,
                   help='with --cache-device: run this many train steps per '
                        'device dispatch (lax.scan) — amortizes the host '
                        'round-trip that dominates small steps on remote '
                        'TPUs; 0 = one dispatch per epoch. The sample '
                        'sequence is identical to per-step dispatch.')

    p.add_argument('--int-steps', type=int, default=5, help='scaling-and-squaring steps for the SVF')
    p.add_argument('--enc', type=int, nargs='+', default=[64] * 4, help='encoder feature counts for the registration U-Net')
    p.add_argument('--dec', type=int, nargs='+', default=[64] * 6, help='U-Net decoder filters')
    args = p.parse_args(argv)
    if not 0.0 <= args.shared_contrast <= 1.0:
        p.error(f'--shared-contrast must be in [0, 1], got {args.shared_contrast}')
    return args


def main(argv=None):
    arg = parse_args(argv)

    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import LabelsToImageConfig, SynthMorphDense
    from voxelmorph_tpu.training import resolve_dtype, LossTerm, Trainer

    if arg.sub_dir:
        arg.model_dir = os.path.join(arg.model_dir, arg.sub_dir)
    os.makedirs(arg.model_dir, exist_ok=True)

    labels_in, label_maps = vxm.py.utils.load_labels(arg.label_dir)
    if arg.cache_device:
        from voxelmorph_tpu.training import device_cached_label_generator
        gen = device_cached_label_generator(
            label_maps, batch_size=arg.batch_size, same_subj=arg.same_subj)
    else:
        gen = vxm.generators.synthmorph(
            label_maps, batch_size=arg.batch_size, same_subj=arg.same_subj, flip=True)
    in_shape = label_maps[0].shape

    if arg.out_labels.endswith('.npy') and os.path.isfile(arg.out_labels):
        labels_out = sorted(x for x in np.load(arg.out_labels) if x in labels_in)
    else:
        labels_out = labels_in

    cfg = LabelsToImageConfig(
        in_shape=in_shape,
        out_shape=arg.out_shape,
        in_label_list=labels_in,
        out_label_list=labels_out,
        warp_std=arg.vel_std,
        warp_res=arg.vel_res,
        blur_std=arg.blur_std,
        bias_std=arg.bias_std,
        bias_res=arg.bias_res,
        gamma_std=arg.gamma,
    )

    model = SynthMorphDense(
        cfg=cfg,
        nb_unet_features=(arg.enc, arg.dec),
        int_steps=arg.int_steps,
        int_resolution=2,
        svf_resolution=2,
        dtype=resolve_dtype(arg.dtype),
        sup_flow=arg.sup_flow_weight > 0,
        shared_contrast=arg.shared_contrast,
    )

    dice = vxm.losses.Dice()
    grad = vxm.losses.Grad('l2', loss_mult=arg.reg_param)
    terms = [
        LossTerm('pred_map', lambda t, p: dice.loss(t, p) + 1.0,
                 weight=1.0, target_output_key='map_2', name='dice'),
        LossTerm('pos_flow', grad.loss, weight=1.0,
                 target_output_key='pos_flow', name='grad'),
    ]
    if arg.image_loss_weight > 0:
        # Curriculum term beyond the reference loss set (Dice+Grad only,
        # ref scripts/tf/train_synthmorph.py:156-158): with --shared-contrast
        # near 1 and the bias/gamma nuisance off, the two synthesized images
        # are the SAME modality, so windowed NCC between the warped source
        # image (y_source) and the target image is a dense, informative
        # registration gradient from step one — the boundary-thin Dice
        # gradient alone needs ~100k batch-1 steps to escape zero flow.
        # Anneal to 0 in the final phase to recover the contrast-agnostic
        # SynthMorph objective.
        ncc = vxm.losses.NCC()
        terms.append(LossTerm('y_source', ncc.loss,
                              weight=arg.image_loss_weight,
                              target_output_key='image_2', name='ncc'))
    if arg.sup_flow_weight > 0:
        if not arg.same_subj:
            raise SystemExit('--sup-flow-weight requires --same-subj: the '
                             'ground-truth flow only exists when both images '
                             'of a pair derive from one label map')
        import jax.numpy as jnp

        def flow_mse(t, p):
            return jnp.mean(jnp.square(p - t),
                            axis=tuple(range(1, p.ndim)))

        terms.append(LossTerm('pos_flow', flow_mse,
                              weight=arg.sup_flow_weight,
                              target_output_key='gt_flow', name='supflow'))

    trainer = Trainer(model, terms, lr=arg.lr, rng_names=('synth',),
                      clip_norm=arg.clip_grad)

    if arg.cache_device and arg.steps_per_dispatch != 1:
        # scanned multi-step path: K steps per device round trip. The index
        # stream starts at +1 because the per-step path burns stream step 0
        # on its shape probe — keeps the two paths' sample sequences (and
        # resumed checkpoints) interchangeable.
        from voxelmorph_tpu.training import init_or_resume
        probe = np.zeros((arg.batch_size, *in_shape, 1), np.float32)
        arg.init_epoch = init_or_resume(
            trainer, arg.init_weights, arg.model_dir, (probe, probe),
            arg.init_epoch)
        trainer.fit_cached_labels(
            label_maps, epochs=arg.epochs, steps_per_epoch=arg.steps_per_epoch,
            steps_per_dispatch=arg.steps_per_dispatch,
            batch_size=arg.batch_size, same_subj=arg.same_subj,
            start_step=arg.init_epoch * arg.steps_per_epoch + 1,
            initial_epoch=arg.init_epoch, model_dir=arg.model_dir,
            save_freq_epochs=arg.save_freq, save_filename='{epoch:05d}.npz')
        return

    sample = next(gen)
    from voxelmorph_tpu.training import init_or_resume
    arg.init_epoch = init_or_resume(trainer, arg.init_weights, arg.model_dir,
                                    tuple(sample[0]), arg.init_epoch)

    if arg.cache_device and arg.init_epoch:
        # rebuild the device-cached stream at the resumed position so a
        # resumed run sees the batch sequence the uninterrupted run would
        from voxelmorph_tpu.training import device_cached_label_generator
        # +1 skips the stream step the fresh run's shape-probing
        # `sample = next(gen)` consumed (see scripts/train.py)
        gen = device_cached_label_generator(
            label_maps, batch_size=arg.batch_size, same_subj=arg.same_subj,
            start_step=arg.init_epoch * arg.steps_per_epoch + 1)

    def synth_inputs():
        while True:
            (src, trg), _ = next(gen)
            # targets are unused (all losses reference model outputs)
            yield (src, trg), (np.zeros(1, np.float32),)

    trainer.fit(synth_inputs(),
                epochs=arg.epochs,
                steps_per_epoch=arg.steps_per_epoch,
                initial_epoch=arg.init_epoch,
                model_dir=arg.model_dir,
                save_freq_epochs=arg.save_freq,
                save_filename='{epoch:05d}.npz')


if __name__ == '__main__':
    main()
