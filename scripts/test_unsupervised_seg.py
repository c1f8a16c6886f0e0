#!/usr/bin/env python
"""Atlas-based Bayesian segmentation inference with chunked posteriors.

CLI-compatible with /root/reference/scripts/tf/test_unsupervised_seg.py:
predicts the per-label Gaussian log-likelihoods + warp, then computes
posteriors for the FULL atlas label set in chunks of --max-feats labels
(bounding device memory), mapped through the atlas label mapping.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('image', help='volume to segment')
    parser.add_argument('seg', help='where to write the predicted segmentation')
    parser.add_argument('--model', required=True, help='model file')
    parser.add_argument('--atlas', required=True, help='probabilistic atlas volume (npz)')
    parser.add_argument('--atlas-full', help='full atlas npz file (defaults to --atlas)')
    parser.add_argument('--mapping', required=True, help='atlas mapping filename (npz/npy)')
    parser.add_argument('--gpu', help='ignored (TPU auto-detected)')
    parser.add_argument('--max-feats', type=int, default=21,
                        help='max label channels warped at once')
    parser.add_argument('--warped-atlas', help='where to write the warped atlas volume')
    parser.add_argument('--posteriors', help='where to write the label posterior volume')
    parser.add_argument('--warp', help='where to write the dense displacement field')
    parser.add_argument('--stats', help='where to write the estimated Gaussian stats (npz)')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import load_model
    from voxelmorph_tpu.ops import warp as warp_ops

    atlas = vxm.py.utils.load_volfile(args.atlas, np_var='vol', add_batch_axis=True)
    full_path = args.atlas_full or args.atlas
    atlas_full = vxm.py.utils.load_volfile(full_path, np_var='vol', add_batch_axis=True)

    mapping = vxm.py.utils.load_volfile(args.mapping).astype(int).reshape(-1)

    image, affine = vxm.py.utils.load_volfile(
        args.image, add_batch_axis=True, add_feat_axis=True, ret_affine=True)

    model, params = load_model(args.model)
    out = model.apply({'params': params}, jnp.asarray(image, jnp.float32),
                      jnp.asarray(atlas, jnp.float32), train=False)
    ull_pred = np.asarray(out['uloglhood'])[0]
    mus = np.asarray(out['stat_mu'])[0]
    sigmas = np.asarray(out['stat_logssq'])[0]
    flow = np.asarray(out['flow'])[0]

    # chunked posterior computation over the full label set
    @jax.jit
    def chunk_posterior(atlas_chunk, ul_chunk, flow):
        warped = warp_ops.transform(atlas_chunk, flow, interp_method='linear')
        return jnp.exp(ul_chunk) * warped, warped

    total_labels = atlas_full.shape[-1]
    posteriors = []
    warped_atlas = []
    for i in range(0, total_labels, args.max_feats):
        slc = slice(i, min(i + args.max_feats, total_labels))
        this_mapping = mapping[slc]
        ul_chunk = jnp.asarray(ull_pred[..., this_mapping])
        po, wa = chunk_posterior(jnp.asarray(atlas_full[0, ..., slc]), ul_chunk,
                                 jnp.asarray(flow))
        posteriors.append(np.asarray(po))
        warped_atlas.append(np.asarray(wa))
    posteriors = np.concatenate(posteriors, -1)
    warped_atlas = np.concatenate(warped_atlas, -1)

    segmentation = posteriors.argmax(-1)

    vxm.py.utils.save_volfile(segmentation.astype('int32'), args.seg, affine)
    if args.warped_atlas:
        vxm.py.utils.save_volfile(warped_atlas, args.warped_atlas, affine)
    if args.posteriors:
        normalized = posteriors / (1e-12 + np.sum(posteriors, -1, keepdims=True))
        vxm.py.utils.save_volfile(normalized, args.posteriors, affine)
    if args.warp:
        vxm.py.utils.save_volfile(flow, args.warp, affine)
    if args.stats:
        np.savez_compressed(args.stats, means=mus, log_variances=sigmas)


if __name__ == '__main__':
    main()
