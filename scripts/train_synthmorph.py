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
                   help='path or glob pattern pointing to input label maps')
    p.add_argument('--model-dir', default='models', help='model output directory')
    p.add_argument('--sub-dir', help='optional subfolder for model saves')

    p.add_argument('--same-subj', action='store_true',
                   help='generate image pairs from same label map')
    p.add_argument('--blur-std', type=float, default=1, help='maximum blurring std. dev.')
    p.add_argument('--gamma', type=float, default=0.25, help='std. dev. of gamma')
    p.add_argument('--vel-std', type=float, default=0.5, help='std. dev. of SVF')
    p.add_argument('--vel-res', type=float, nargs='+', default=[16], help='SVF scale')
    p.add_argument('--bias-std', type=float, default=0.3, help='std. dev. of bias field')
    p.add_argument('--bias-res', type=float, nargs='+', default=[40], help='bias scale')
    p.add_argument('--out-shape', type=int, nargs='+', help='output shape to pad to')
    p.add_argument('--out-labels', default='fs_labels.npy', help='labels to optimize')

    p.add_argument('--gpu', type=str, default='0', help='ignored (TPU auto-detected)')
    p.add_argument('--epochs', type=int, default=1500, help='training epochs')
    p.add_argument('--steps-per-epoch', type=int, default=100, help='steps per epoch')
    p.add_argument('--batch-size', type=int, default=1, help='batch size')
    p.add_argument('--init-weights', help='optional weights file to initialize with')
    p.add_argument('--save-freq', type=int, default=20, help='epochs between model saves')
    p.add_argument('--reg-param', type=float, default=1., help='regularization weight')
    p.add_argument('--lr', type=float, default=1e-4, help='learning rate')
    p.add_argument('--init-epoch', type=int, default=0, help='initial epoch number')

    p.add_argument('--int-steps', type=int, default=5, help='number of integration steps')
    p.add_argument('--enc', type=int, nargs='+', default=[64] * 4, help='U-Net encoder filters')
    p.add_argument('--dec', type=int, nargs='+', default=[64] * 6, help='U-Net decoder filters')
    return p.parse_args(argv)


def main(argv=None):
    arg = parse_args(argv)

    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import LabelsToImageConfig, SynthMorphDense
    from voxelmorph_tpu.training import LossTerm, Trainer

    if arg.sub_dir:
        arg.model_dir = os.path.join(arg.model_dir, arg.sub_dir)
    os.makedirs(arg.model_dir, exist_ok=True)

    labels_in, label_maps = vxm.py.utils.load_labels(arg.label_dir)
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
    )

    dice = vxm.losses.Dice()
    grad = vxm.losses.Grad('l2', loss_mult=arg.reg_param)
    terms = [
        LossTerm('pred_map', lambda t, p: dice.loss(t, p) + 1.0,
                 weight=1.0, target_output_key='map_2', name='dice'),
        LossTerm('pos_flow', grad.loss, weight=1.0,
                 target_output_key='pos_flow', name='grad'),
    ]

    trainer = Trainer(model, terms, lr=arg.lr, rng_names=('synth',))

    sample = next(gen)
    if arg.init_weights:
        trainer.load(arg.init_weights)
    else:
        trainer.init(tuple(sample[0]))

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
