"""Host-side data generators feeding the training loops.

Same tuple contracts as the reference (/root/reference/voxelmorph/generators.py)
— each yields ``(inputs, outputs)`` lists of numpy arrays, so existing data
layouts and scripts port over unchanged — but the mechanics are this
framework's own: vectorized one-hot encoding, precomputed surface-sampling
state, and a module-level seedable RNG. Generators run on host CPU by design;
``voxelmorph_tpu.training.prefetch`` overlaps host loading with device steps.
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


def _expand_names(vol_names):
    """Normalize a directory / glob / list spec into a list of items."""
    if isinstance(vol_names, str):
        pattern = os.path.join(vol_names, "*") if os.path.isdir(vol_names) else vol_names
        return glob.glob(pattern)
    return list(vol_names)


def _stack_load(names, picks, **load_kwargs):
    """Load the picked entries of ``names`` and stack them on the batch axis."""
    vols = [py.utils.load_volfile(names[i], **load_kwargs) for i in picks]
    return np.concatenate(vols, axis=0)


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
    of preloaded arrays. segs=True loads the 'seg' variable from the same
    files; a list loads corresponding seg files.
    """
    names = _expand_names(vol_names)
    if isinstance(segs, list) and len(segs) != len(names):
        raise ValueError("Number of image files must match number of seg files.")

    opts = dict(np_var=np_var, add_batch_axis=True, add_feat_axis=add_feat_axis,
                pad_shape=pad_shape, resize_factor=resize_factor)
    while True:
        picks = _rng.integers(len(names), size=batch_size)
        batch = [_stack_load(names, picks, **opts)]
        if segs is True:
            batch.append(_stack_load(names, picks, **{**opts, "np_var": "seg"}))
        elif isinstance(segs, list):
            batch.append(_stack_load(segs, picks, **opts))
        yield tuple(batch)


def _zero_flow(batch_size, spatial_shape):
    """The zero-displacement placeholder target for regularization losses."""
    return np.zeros((batch_size, *spatial_shape, len(spatial_shape)), "float32")


def scan_to_scan(vol_names, bidir=False, batch_size=1, prob_same=0, no_warp=False, **kwargs):
    """Random scan pairs: inputs [src, trg], outputs [trg(, src)](, zero-warp)."""
    gen = volgen(vol_names, batch_size=batch_size, **kwargs)
    flow = None
    while True:
        moving = next(gen)[0]
        fixed = next(gen)[0]

        # occasionally duplicate one side so the model sees identity pairs
        if prob_same > 0 and _rng.random() < prob_same:
            if _rng.random() > 0.5:
                moving = fixed
            else:
                fixed = moving

        outputs = [fixed, moving] if bidir else [fixed]
        if not no_warp:
            if flow is None:
                flow = _zero_flow(batch_size, moving.shape[1:-1])
            outputs = outputs + [flow]
        yield ([moving, fixed], outputs)


def scan_to_atlas(vol_names, atlas, bidir=False, batch_size=1, no_warp=False,
                  segs=None, **kwargs):
    """Random scans registered to a fixed atlas."""
    flow = _zero_flow(batch_size, atlas.shape[1:-1])
    atlas = np.repeat(atlas, batch_size, axis=0)
    gen = volgen(vol_names, batch_size=batch_size, segs=segs, **kwargs)
    while True:
        loaded = next(gen)
        scan = loaded[0]
        first = loaded[1] if segs else atlas
        outputs = [first, scan] if bidir else [first]
        if not no_warp:
            outputs = outputs + [flow]
        yield ([scan, atlas], outputs)


def _one_hot_seg(seg, labels, downsize=1):
    """Vectorized one-hot probability map of an integer seg (B, *S, 1),
    optionally strided down — replaces the reference's per-label python loop
    (generators.py:163-167)."""
    labels = np.asarray(labels)
    onehot = (seg[..., 0, None] == labels).astype("float32")
    if downsize > 1:
        nd = onehot.ndim - 2
        sl = (slice(None),) + (slice(None, None, downsize),) * nd
        onehot = onehot[sl]
    return onehot


def semisupervised(vol_names, seg_names, labels, atlas_file=None, downsize=2):
    """Semi-supervised training: adds downsampled one-hot prob segs.

    inputs [src, trg, src_seg], outputs [trg, zero-warp, trg_seg].
    """
    # seg paths identical to the volume paths means multi-variable files
    # (npz with 'vol' + 'seg'), like the atlas handling below; only applies
    # to path lists (volgen also accepts preloaded arrays)
    def _is_paths(v):
        return isinstance(v, list) and all(isinstance(x, (str, os.PathLike))
                                           for x in v)
    if (_is_paths(seg_names) and _is_paths(vol_names)
            and list(seg_names) == list(vol_names)):
        # only npz files can carry both 'vol' and 'seg'; for any other
        # format load_volfile ignores np_var, so identical lists would
        # silently train against the image as its own segmentation
        if not all(str(x).endswith(".npz") for x in vol_names):
            raise ValueError(
                "identical vol/seg path lists require .npz files with "
                "'vol' + 'seg' variables; pass distinct seg paths otherwise")
        seg_names = True
    gen = volgen(vol_names, segs=seg_names, np_var="vol")
    flow = None

    trg_vol = trg_seg = None
    if atlas_file:
        trg_vol = py.utils.load_volfile(atlas_file, np_var="vol",
                                        add_batch_axis=True, add_feat_axis=True)
        trg_seg = py.utils.load_volfile(atlas_file, np_var="seg",
                                        add_batch_axis=True, add_feat_axis=True)
        trg_seg = _one_hot_seg(trg_seg, labels, downsize)

    while True:
        src_vol, src_seg = next(gen)
        src_seg = _one_hot_seg(src_seg, labels, downsize)

        if not atlas_file:
            trg_vol, raw = next(gen)
            trg_seg = _one_hot_seg(raw, labels, downsize)

        if flow is None:
            flow = _zero_flow(1, src_vol.shape[1:-1])

        yield ([src_vol, trg_vol, src_seg], [trg_vol, flow, trg_seg])


def template_creation(vol_names, bidir=False, batch_size=1, **kwargs):
    """Unconditional template creation: inputs [scan], outputs [scan, zeros...]."""
    gen = volgen(vol_names, batch_size=batch_size, **kwargs)
    flow = None
    while True:
        scan = next(gen)[0]
        if flow is None:
            flow = _zero_flow(1, scan.shape[1:-1])
        nb_zero_targets = 3 if bidir else 2
        yield ([scan], [scan] + [flow] * nb_zero_targets)


def conditional_template_creation(vol_names, atlas, attributes, batch_size=1,
                                  np_var="vol", pad_shape=None, add_feat_axis=True):
    """Conditional template creation keyed by a phenotype attribute dict."""
    flow = _zero_flow(batch_size, atlas.shape[1:-1])
    atlas = np.repeat(atlas, batch_size, axis=0)
    names = list(vol_names)
    opts = dict(np_var=np_var, add_batch_axis=True, add_feat_axis=add_feat_axis,
                pad_shape=pad_shape)
    while True:
        picks = _rng.integers(len(names), size=batch_size)
        pheno = np.stack([attributes[names[i]] for i in picks], axis=0)
        scans = _stack_load(names, picks, **opts)
        yield ([pheno, atlas, scans], [scans, flow, flow, flow])


class _SurfaceSampler:
    """Per-label SDT + surface-point machinery for surf_semisupervised.

    Precomputes each atlas label's cleaned mask, signed distance transform,
    and share of the surface-point budget (proportional to its boundary
    size); at call time it cleans a subject seg, computes its SDTs, and
    samples point clouds from both sides.
    """

    def __init__(self, atlas_seg, labels, total_pts, smooth_std, upsample, resize):
        self.labels = labels
        self.total_pts = total_pts
        self.smooth_std = smooth_std
        self.upsample = upsample
        self.resize = resize
        self.threshold = 1.0 / upsample + 1e-5

        self.atlas_sdts = []
        boundary_sizes = []
        for label in labels:
            mask = py.utils.clean_seg(atlas_seg == label, smooth_std)
            sdt = py.utils.vol_to_sdt(mask, sdt=True, sdt_vol_resize=resize)
            self.atlas_sdts.append(sdt)
            boundary_sizes.append(np.count_nonzero(np.abs(sdt) < 1.01))
        self.edge_ratios = np.asarray(boundary_sizes, float) / sum(boundary_sizes)

    def budget(self, label_idxs):
        """Surface-point counts per selected label, summing to total_pts."""
        ratios = self.edge_ratios[np.asarray(label_idxs)]
        return py.utils.get_surface_pts_per_label(self.total_pts, ratios)

    def sample_points(self, sdt, count):
        return py.utils.sdt_to_surface_pts(
            sdt, count, surface_pts_upsample_factor=self.upsample,
            thr=self.threshold, rng=_rng)

    def point_cloud(self, sdts, counts):
        """Assemble an (total_pts, ndims+1) cloud: coords + the slot index of
        the label's channel in the stacked SDT volume (what
        value_at_location indexes when sampling distances at warped points).
        """
        nd = sdts[0].ndim
        cloud = np.zeros((self.total_pts, nd + 1), "float32")
        stops = np.concatenate([[0], np.cumsum(counts)]).astype(int)
        for slot, sdt in enumerate(sdts):
            rows = slice(stops[slot], stops[slot + 1])
            cloud[rows, :-1] = self.sample_points(sdt, counts[slot])
            cloud[rows, -1] = slot
        return cloud

    def subject_sdts(self, seg, label_idxs):
        """Cleaned per-label SDTs of a subject seg (*S,) for chosen labels."""
        out = []
        for li in label_idxs:
            mask = py.utils.clean_seg(seg == self.labels[li], self.smooth_std)
            out.append(py.utils.vol_to_sdt(mask, sdt=True, sdt_vol_resize=self.resize))
        return out


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

    Same contract as the reference (generators.py:256-418): per step, yields
    images, per-label SDT stacks, and sampled surface point clouds (atlas
    side precomputed when every label is used each step).
    """
    assert nb_surface_pts > 0, "number of surface points must be positive"
    assert batch_size == 1, "only batch size 1 supported for now"

    if labels is not None:
        atlas_seg = py.utils.filter_labels(atlas_seg, labels)
    else:
        labels = np.sort(np.unique(atlas_seg))[1:]
    nb_sample = nb_labels_sample or len(labels)
    use_all = nb_sample == len(labels)

    sampler = _SurfaceSampler(atlas_seg, labels, nb_surface_pts, smooth_seg_std,
                              surface_pts_upsample_factor, sdt_vol_resize)

    vol_shape = atlas_seg.shape
    sdt_shape = tuple(int(s * sdt_vol_resize) for s in vol_shape)
    batched = lambda v: np.repeat(v[None, ..., None], batch_size, axis=0)
    atlas_img_b = batched(atlas_vol)
    atlas_seg_b = batched(atlas_seg)
    flow = _zero_flow(batch_size, vol_shape)
    zero_pt_values = np.zeros((batch_size, nb_surface_pts, 1), "float32")

    # with the full label set, the atlas-side point cloud is drawn once
    fixed_atlas_cloud = None
    if use_all:
        counts = sampler.budget(range(len(labels)))
        fixed_atlas_cloud = sampler.point_cloud(sampler.atlas_sdts, counts)

    gen = volgen(vol_names, segs=True, batch_size=batch_size,
                 add_feat_axis=add_feat_axis)

    while True:
        img, seg = next(gen)
        seg = py.utils.filter_labels(seg, labels)

        if use_all:
            label_idxs = list(range(len(labels)))
            counts = sampler.budget(label_idxs)
            atlas_cloud = fixed_atlas_cloud
        else:
            label_idxs = np.sort(_rng.choice(len(labels), size=nb_sample,
                                             replace=False))
            counts = sampler.budget(label_idxs)
            atlas_cloud = sampler.point_cloud(
                [sampler.atlas_sdts[li] for li in label_idxs], counts)

        subj_sdts = sampler.subject_sdts(seg[0, ..., 0], label_idxs)
        subj_sdt_stack = np.stack(subj_sdts, axis=-1)[None].astype("float32")
        assert subj_sdt_stack.shape == (batch_size, *sdt_shape, nb_sample)

        if align_segs:
            assert len(labels) == 1, "align_segs supports a single label only"
            moving = (seg == labels[0]).astype(img.dtype)
            fixed = (atlas_seg_b == labels[0]).astype(img.dtype)
        else:
            moving, fixed = img, atlas_img_b

        atlas_cloud_b = np.repeat(atlas_cloud[None], batch_size, axis=0)
        if surf_bidir:
            atlas_sdt_stack = np.stack(
                [sampler.atlas_sdts[li] for li in label_idxs], axis=-1
            )[None].astype("float32")
            subj_cloud = sampler.point_cloud(subj_sdts, counts)
            subj_cloud_b = np.repeat(subj_cloud[None], batch_size, axis=0)
            inputs = [moving, fixed, subj_sdt_stack, atlas_sdt_stack,
                      subj_cloud_b, atlas_cloud_b]
            outputs = [fixed, moving, flow, zero_pt_values, zero_pt_values]
        else:
            inputs = [moving, fixed, subj_sdt_stack, atlas_cloud_b]
            outputs = [fixed, moving, flow, zero_pt_values]

        yield (inputs, outputs)


def synthmorph(label_maps, batch_size=1, same_subj=False, flip=True):
    """SynthMorph generator: random label-map pairs with optional axis flips.

    Yields [src, trg] int label maps; outputs are void placeholders since
    SynthMorph losses are built from on-device synthesized tensors.
    """
    spatial = label_maps[0].shape
    nd = len(spatial)
    void = np.zeros((batch_size, *spatial, nd), "float32")

    while True:
        picks = _rng.integers(len(label_maps), size=2 * batch_size)
        if same_subj:
            picks[batch_size:] = picks[:batch_size]
        pair = np.stack([label_maps[i] for i in picks])[..., None]

        if flip:
            nb_axes = _rng.integers(nd + 1)
            axes = _rng.choice(nd, size=nb_axes, replace=False, shuffle=False)
            pair = np.flip(pair, axis=tuple(axes + 1))

        yield [pair[:batch_size], pair[batch_size:]], [void] * 2
