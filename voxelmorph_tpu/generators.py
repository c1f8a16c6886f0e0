"""Host-side data generators feeding the training loops.

Same tuple contracts as the reference (/root/reference/voxelmorph/generators.py)
— each yields ``(inputs, outputs)`` lists of numpy arrays — so existing data
layouts and scripts port over unchanged. These run on host CPU by design;
``voxelmorph_tpu.training.prefetch`` overlaps host loading with device steps.

All randomness goes through a module-level numpy Generator that can be seeded
via ``seed_rng`` for reproducible pipelines.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from . import py

_rng = np.random.default_rng()


def seed_rng(seed):
    """Seed the generator module's RNG (for reproducible data streams)."""
    global _rng
    _rng = np.random.default_rng(seed)


def volgen(
    vol_names,
    batch_size=1,
    segs=None,
    np_var="vol",
    pad_shape=None,
    resize_factor=1,
    add_feat_axis=True,
):
    """Base generator: random volumes (with replacement), optionally + segs.

    vol_names may be a directory, a glob pattern, a list of paths, or a list
    of preloaded arrays. segs=True loads the 'seg' variable from npz files;
    a list loads corresponding seg files.
    """
    if isinstance(vol_names, str):
        if os.path.isdir(vol_names):
            vol_names = os.path.join(vol_names, "*")
        vol_names = glob.glob(vol_names)

    if isinstance(segs, list) and len(segs) != len(vol_names):
        raise ValueError("Number of image files must match number of seg files.")

    while True:
        indices = _rng.integers(len(vol_names), size=batch_size)

        load_params = dict(np_var=np_var, add_batch_axis=True, add_feat_axis=add_feat_axis,
                           pad_shape=pad_shape, resize_factor=resize_factor)
        imgs = [py.utils.load_volfile(vol_names[i], **load_params) for i in indices]
        vols = [np.concatenate(imgs, axis=0)]

        if segs is True:
            load_params["np_var"] = "seg"
            s = [py.utils.load_volfile(vol_names[i], **load_params) for i in indices]
            vols.append(np.concatenate(s, axis=0))
        elif isinstance(segs, list):
            s = [py.utils.load_volfile(segs[i], **load_params) for i in indices]
            vols.append(np.concatenate(s, axis=0))

        yield tuple(vols)


def scan_to_scan(vol_names, bidir=False, batch_size=1, prob_same=0, no_warp=False, **kwargs):
    """Random scan pairs: inputs [src, trg], outputs [trg(, src)](, zero-warp)."""
    zeros = None
    gen = volgen(vol_names, batch_size=batch_size, **kwargs)
    while True:
        scan1 = next(gen)[0]
        scan2 = next(gen)[0]

        if prob_same > 0 and _rng.random() < prob_same:
            if _rng.random() > 0.5:
                scan1 = scan2
            else:
                scan2 = scan1

        if not no_warp and zeros is None:
            shape = scan1.shape[1:-1]
            zeros = np.zeros((batch_size, *shape, len(shape)), dtype="float32")

        invols = [scan1, scan2]
        outvols = [scan2, scan1] if bidir else [scan2]
        if not no_warp:
            outvols.append(zeros)

        yield (invols, outvols)


def scan_to_atlas(vol_names, atlas, bidir=False, batch_size=1, no_warp=False,
                  segs=None, **kwargs):
    """Random scans registered to a fixed atlas."""
    shape = atlas.shape[1:-1]
    zeros = np.zeros((batch_size, *shape, len(shape)), dtype="float32")
    atlas = np.repeat(atlas, batch_size, axis=0)
    gen = volgen(vol_names, batch_size=batch_size, segs=segs, **kwargs)
    while True:
        res = next(gen)
        scan = res[0]
        invols = [scan, atlas]
        if not segs:
            outvols = [atlas, scan] if bidir else [atlas]
        else:
            seg = res[1]
            outvols = [seg, scan] if bidir else [seg]
        if not no_warp:
            outvols.append(zeros)
        yield (invols, outvols)


def semisupervised(vol_names, seg_names, labels, atlas_file=None, downsize=2):
    """Semi-supervised training: adds downsampled one-hot prob segs.

    inputs [src, trg, src_seg], outputs [trg, zero-warp, trg_seg].
    """
    gen = volgen(vol_names, segs=seg_names, np_var="vol")
    zeros = None

    def split_seg(seg):
        prob_seg = np.zeros((*seg.shape[:4], len(labels)), dtype="float32")
        for i, label in enumerate(labels):
            prob_seg[0, ..., i] = seg[0, ..., 0] == label
        return prob_seg[:, ::downsize, ::downsize, ::downsize, :]

    if atlas_file:
        trg_vol = py.utils.load_volfile(atlas_file, np_var="vol",
                                        add_batch_axis=True, add_feat_axis=True)
        trg_seg = py.utils.load_volfile(atlas_file, np_var="seg",
                                        add_batch_axis=True, add_feat_axis=True)
        trg_seg = split_seg(trg_seg)

    while True:
        src_vol, src_seg = next(gen)
        src_seg = split_seg(src_seg)

        if not atlas_file:
            trg_vol, trg_seg = next(gen)
            trg_seg = split_seg(trg_seg)

        if zeros is None:
            shape = src_vol.shape[1:-1]
            zeros = np.zeros((1, *shape, len(shape)), dtype="float32")

        invols = [src_vol, trg_vol, src_seg]
        outvols = [trg_vol, zeros, trg_seg]
        yield (invols, outvols)


def template_creation(vol_names, bidir=False, batch_size=1, **kwargs):
    """Unconditional template creation: inputs [scan], outputs [scan, zeros...]."""
    zeros = None
    gen = volgen(vol_names, batch_size=batch_size, **kwargs)
    while True:
        scan = next(gen)[0]
        if zeros is None:
            shape = scan.shape[1:-1]
            zeros = np.zeros((1, *shape, len(shape)), dtype="float32")
        invols = [scan]
        outvols = [scan, zeros, zeros, zeros] if bidir else [scan, zeros, zeros]
        yield (invols, outvols)


def conditional_template_creation(vol_names, atlas, attributes, batch_size=1,
                                  np_var="vol", pad_shape=None, add_feat_axis=True):
    """Conditional template creation keyed by a phenotype attribute dict."""
    shape = atlas.shape[1:-1]
    zeros = np.zeros((batch_size, *shape, len(shape)), dtype="float32")
    atlas = np.repeat(atlas, batch_size, axis=0)
    while True:
        indices = _rng.integers(len(vol_names), size=batch_size)
        pheno = np.stack([attributes[vol_names[i]] for i in indices], axis=0)

        load_params = dict(np_var=np_var, add_batch_axis=True,
                           add_feat_axis=add_feat_axis, pad_shape=pad_shape)
        vols = [py.utils.load_volfile(vol_names[i], **load_params) for i in indices]
        vols = np.concatenate(vols, axis=0)

        invols = [pheno, atlas, vols]
        outvols = [vols, zeros, zeros, zeros]
        yield (invols, outvols)


def surf_semisupervised(
    vol_names,
    atlas_vol,
    atlas_seg,
    nb_surface_pts,
    labels=None,
    batch_size=1,
    surf_bidir=True,
    surface_pts_upsample_factor=2,
    smooth_seg_std=1,
    nb_labels_sample=None,
    sdt_vol_resize=1,
    align_segs=False,
    add_feat_axis=True,
):
    """Scan-to-atlas semi-supervised learning with surface point clouds.

    Precomputes per-label atlas SDTs and surface points, then per step builds
    subject SDTs + sampled surface points (reference generators.py:256-418).
    """
    assert nb_surface_pts > 0, "number of surface point should be greater than 0"

    vol_shape = atlas_seg.shape
    sdt_shape = [int(f * sdt_vol_resize) for f in vol_shape]

    if labels is not None:
        atlas_seg = py.utils.filter_labels(atlas_seg, labels)
    else:
        labels = np.sort(np.unique(atlas_seg))[1:]

    if nb_labels_sample is None:
        nb_labels_sample = len(labels)

    atlas_vol_bs = np.repeat(atlas_vol[np.newaxis, ..., np.newaxis], batch_size, axis=0)
    atlas_seg_bs = np.repeat(atlas_seg[np.newaxis, ..., np.newaxis], batch_size, axis=0)

    std_to_surf = lambda x, y: py.utils.sdt_to_surface_pts(
        x, y,
        surface_pts_upsample_factor=surface_pts_upsample_factor,
        thr=(1 / surface_pts_upsample_factor + 1e-5),
        rng=_rng)

    zero_flow = np.zeros((batch_size, *vol_shape, len(vol_shape)), dtype="float32")
    zero_surface_values = np.zeros((batch_size, nb_surface_pts, 1), dtype="float32")

    # precompute per-label atlas SDTs and edge ratios
    atlas_sdt = [None] * len(labels)
    atlas_label_vols = [None] * len(labels)
    nb_edges = np.zeros(len(labels))
    for li, label in enumerate(labels):
        atlas_label_vols[li] = atlas_seg == label
        atlas_label_vols[li] = py.utils.clean_seg(atlas_label_vols[li], smooth_seg_std)
        atlas_sdt[li] = py.utils.vol_to_sdt(
            atlas_label_vols[li], sdt=True, sdt_vol_resize=sdt_vol_resize)
        nb_edges[li] = np.sum(np.abs(atlas_sdt[li]) < 1.01)
    layer_edge_ratios = nb_edges / np.sum(nb_edges)

    atlas_surface_pts = np.zeros((batch_size, nb_surface_pts, len(vol_shape) + 1),
                                 dtype="float32")
    if nb_labels_sample == len(labels):
        nb_surface_pts_sel = py.utils.get_surface_pts_per_label(
            nb_surface_pts, layer_edge_ratios)
        for li, label in enumerate(labels):
            pts = std_to_surf(atlas_sdt[li], nb_surface_pts_sel[li])[np.newaxis, ...]
            srf_idx = slice(int(np.sum(nb_surface_pts_sel[:li])),
                            int(np.sum(nb_surface_pts_sel[:li + 1])))
            atlas_surface_pts[:, srf_idx, :-1] = np.repeat(pts, batch_size, 0)
            atlas_surface_pts[:, srf_idx, -1] = li

    gen = volgen(vol_names, segs=True, batch_size=batch_size, add_feat_axis=add_feat_axis)
    assert batch_size == 1, "only batch size 1 supported for now"

    while True:
        X = next(gen)
        X_img = X[0]
        X_seg = py.utils.filter_labels(X[1], labels)

        sel_label_idxs = range(len(labels))
        if nb_labels_sample != len(labels):
            sel_label_idxs = np.sort(_rng.choice(
                range(len(labels)), size=nb_labels_sample, replace=False))
            sel_layer_edge_ratios = [layer_edge_ratios[li] for li in sel_label_idxs]
            nb_surface_pts_sel = py.utils.get_surface_pts_per_label(
                nb_surface_pts, sel_layer_edge_ratios)

        X_sdt_k = np.zeros((batch_size, *sdt_shape, nb_labels_sample), dtype="float32")
        atl_dt_k = np.zeros((batch_size, *sdt_shape, nb_labels_sample), dtype="float32")
        subj_surface_pts = np.zeros((batch_size, nb_surface_pts, len(vol_shape) + 1),
                                    dtype="float32")
        if nb_labels_sample != len(labels):
            atlas_surface_pts = np.zeros((batch_size, nb_surface_pts, len(vol_shape) + 1),
                                         dtype="float32")

        for li, sli in enumerate(sel_label_idxs):
            srf_idx = slice(int(np.sum(nb_surface_pts_sel[:li])),
                            int(np.sum(nb_surface_pts_sel[:li + 1])))

            if nb_labels_sample != len(labels):
                pts = std_to_surf(atlas_sdt[sli], nb_surface_pts_sel[li])[np.newaxis, ...]
                atlas_surface_pts[:, srf_idx, :-1] = np.repeat(pts, batch_size, 0)
                atlas_surface_pts[:, srf_idx, -1] = sli

            X_label = X_seg == labels[sli]
            X_label = py.utils.clean_seg_batch(X_label, smooth_seg_std)
            X_sdt_k[..., li] = py.utils.vol_to_sdt_batch(
                X_label, sdt=True, sdt_vol_resize=sdt_vol_resize)[..., 0]

            if surf_bidir:
                atl_dt = atlas_sdt[li][np.newaxis, ...]
                atl_dt_k[..., li] = np.repeat(atl_dt, batch_size, 0)
                ssp_lst = [std_to_surf(f, nb_surface_pts_sel[li]) for f in X_sdt_k[..., li]]
                subj_surface_pts[:, srf_idx, :-1] = np.stack(ssp_lst, 0)
                subj_surface_pts[:, srf_idx, -1] = li

        X_ret = X_img
        atlas_ret = atlas_vol_bs

        if align_segs:
            assert len(labels) == 1, "align_seg generator is only implemented for single label"
            X_ret = X_seg == labels[0]
            atlas_ret = atlas_seg_bs == labels[0]

        if surf_bidir:
            inputs = [X_ret, atlas_ret, X_sdt_k, atl_dt_k, subj_surface_pts, atlas_surface_pts]
            outputs = [atlas_ret, X_ret, zero_flow, zero_surface_values, zero_surface_values]
        else:
            inputs = [X_ret, atlas_ret, X_sdt_k, atlas_surface_pts]
            outputs = [atlas_ret, X_ret, zero_flow, zero_surface_values]

        yield (inputs, outputs)


def synthmorph(label_maps, batch_size=1, same_subj=False, flip=True):
    """SynthMorph generator: random label-map pairs with optional axis flips.

    Yields [src, trg] int label maps; outputs are void placeholders since
    SynthMorph losses are built from on-device synthesized tensors.
    """
    in_shape = label_maps[0].shape
    num_dim = len(in_shape)
    void = np.zeros((batch_size, *in_shape, num_dim), dtype="float32")

    while True:
        ind = _rng.integers(len(label_maps), size=2 * batch_size)
        x = [label_maps[i] for i in ind]
        if same_subj:
            x = x[:batch_size] * 2
        x = np.stack(x)[..., None]

        if flip:
            axes = _rng.choice(num_dim, size=_rng.integers(num_dim + 1),
                               replace=False, shuffle=False)
            x = np.flip(x, axis=tuple(axes + 1))

        src = x[:batch_size, ...]
        trg = x[batch_size:, ...]
        yield [src, trg], [void] * 2
