"""Backend-neutral python utilities: file IO, lists, metrics, seg tools.

API-compatible rebuild of /root/reference/voxelmorph/py/utils.py on pure
numpy (file formats, EDT, component labeling and Gaussian blur are owned by
this package — see py.io and py.ndimage).
"""

from __future__ import annotations

import csv
import glob
import os
import pathlib

import numpy as np

from . import io as _io
from . import ndimage as _ndi

__all__ = [
    "default_unet_features", "get_backend", "read_file_list", "read_pair_list",
    "load_volfile", "save_volfile", "load_labels", "load_pheno_csv", "pad",
    "resize", "dice", "affine_shift_to_matrix", "extract_largest_vol",
    "clean_seg", "clean_seg_batch", "filter_labels", "dist_trf",
    "signed_dist_trf", "vol_to_sdt", "vol_to_sdt_batch",
    "get_surface_pts_per_label", "edge_to_surface_pts", "sdt_to_surface_pts",
    "jacobian_determinant",
]


def default_unet_features():
    return [
        [16, 32, 32, 32],              # encoder
        [32, 32, 32, 32, 32, 16, 16],  # decoder
    ]


def get_backend():
    """This framework has a single backend: JAX on TPU/CPU."""
    return "jax"


def _decorate(name, prefix, suffix):
    return (prefix or "") + name + (suffix or "")


def read_file_list(filename, prefix=None, suffix=None):
    """Read a newline-separated list of files, with optional prefix/suffix."""
    with open(filename) as f:
        entries = (line.strip() for line in f)
        return [_decorate(e, prefix, suffix) for e in entries if e]


def read_pair_list(filename, delim=None, prefix=None, suffix=None):
    """Read a list of registration file pairs (one delimited pair per line)."""
    return [[_decorate(name, prefix, suffix) for name in line.split(delim)]
            for line in read_file_list(filename)]


def load_volfile(
    filename,
    np_var="vol",
    add_batch_axis=False,
    add_feat_axis=False,
    pad_shape=None,
    resize_factor=1,
    ret_affine=False,
):
    """Load a volume from nii, nii.gz, mgz/mgh, npz, or npy.

    Non-string inputs are passed through (preloaded arrays, or (vol, affine)
    tuples when ret_affine). Axis/pad/resize options match the reference
    (py/utils.py:69-129).
    """
    if isinstance(filename, pathlib.PurePath):
        filename = str(filename)
    if isinstance(filename, str) and not os.path.isfile(filename):
        raise ValueError(f"'{filename}' is not a file.")

    if not isinstance(filename, str):
        if ret_affine:
            vol, affine = filename
        else:
            vol = filename
    elif filename.endswith((".nii", ".nii.gz")):
        vol, affine = _io.read_nifti(filename)
        vol = np.squeeze(vol)
    elif filename.endswith((".mgz", ".mgh")):
        vol, affine = _io.read_mgh(filename)
        vol = np.squeeze(vol)
    elif filename.endswith(".npy"):
        vol = np.load(filename)
        affine = None
    elif filename.endswith(".npz"):
        npz = np.load(filename)
        vol = next(iter(npz.values())) if len(npz.keys()) == 1 else npz[np_var]
        affine = None
    else:
        raise ValueError(f"unknown filetype for {filename}")

    if pad_shape:
        vol = pad(vol, pad_shape)[0]
    if add_feat_axis:
        vol = vol[..., None]
    if resize_factor != 1:
        vol = resize(vol, resize_factor)
    if add_batch_axis:
        vol = vol[None]
    return (vol, affine) if ret_affine else vol


def save_volfile(array, filename, affine=None):
    """Save to nii, nii.gz, mgz/mgh, or npz. Default affine is FreeSurfer LIA
    centered on the volume (reference py/utils.py:144-154)."""
    if isinstance(filename, pathlib.PurePath):
        filename = str(filename)
    if filename.endswith((".nii", ".nii.gz", ".mgz", ".mgh")):
        if affine is None and array.ndim >= 3:
            affine = np.array(
                [[-1, 0, 0, 0],
                 [0, 0, 1, 0],
                 [0, -1, 0, 0],
                 [0, 0, 0, 1]], dtype=float)
            pcrs = np.append(np.array(array.shape[:3]) / 2, 1)
            affine[:3, 3] = -np.matmul(affine, pcrs)[:3]
        if filename.endswith((".nii", ".nii.gz")):
            _io.write_nifti(filename, array, affine)
        else:
            _io.write_mgh(filename, array, affine)
    elif filename.endswith(".npz"):
        np.savez_compressed(filename, vol=array)
    else:
        raise ValueError(f"unknown filetype for {filename}")


def load_labels(arg, ext=(".nii.gz", ".nii", ".mgz", ".npy", ".npz")):
    """Load integer label maps; returns (unique labels, list of maps)."""
    specs = [arg] if isinstance(arg, (str, os.PathLike)) else list(arg)
    patterns = [os.path.join(s, "*") if os.path.isdir(s) else str(s)
                for s in map(str, specs)]
    files = [f for pat in patterns for f in glob.glob(pat) if f.endswith(ext)]
    if not files:
        raise ValueError(f'no labels found for argument "{files}"')

    label_maps = []
    shape = None
    for f in files:
        lab = np.squeeze(load_volfile(f))
        shape = shape or np.shape(lab)
        if not np.issubdtype(lab.dtype, np.integer):
            raise ValueError(f'file "{f}" has non-integral data type')
        if tuple(lab.shape) != tuple(shape):
            raise ValueError(f'shape {lab.shape} of file "{f}" is not {shape}')
        label_maps.append(lab)

    return np.unique(label_maps), label_maps


def load_pheno_csv(filename, training_files=None):
    """Load a filename -> attribute-vector mapping from a headered csv
    (same contract as reference py/utils.py:202-232)."""
    with open(filename) as fh:
        rows = list(csv.reader(fh))[1:]  # skip header
    pheno = {name: np.asarray(vals, float) for name, *vals in rows if name}

    if training_files is None:
        return pheno, sorted(pheno)
    keep = [path for path in training_files if os.path.basename(path) in pheno]
    pheno.update({path: pheno[os.path.basename(path)] for path in keep})
    return pheno, keep


def pad(array, shape):
    """Zero-pad to a shape (centered). Returns (padded, crop slices)."""
    if array.shape == tuple(shape):
        return array, ...
    lo = [(want - have) // 2 for want, have in zip(shape, array.shape)]
    window = tuple(slice(o, o + have) for o, have in zip(lo, array.shape))
    padded = np.zeros(shape, dtype=array.dtype)
    padded[window] = array
    return padded, window


def resize(array, factor, batch_axis=False):
    """Nearest-neighbor resize by a factor; last axis is features (and the
    first is left alone when batch_axis)."""
    if factor == 1:
        return array
    spatial = array.ndim - 1 - int(batch_axis)
    factors = [1] * int(batch_axis) + [factor] * spatial + [1]
    return _ndi.zoom(array, factors, order=0)


def dice(array1, array2, labels=None, include_zero=False):
    """Hard-label Dice overlap per label (semantics of reference
    py/utils.py:265-287): 2|A∩B| / (|A|+|B|), zero-safe."""
    if labels is None:
        labels = np.union1d(np.unique(array1), np.unique(array2))
    labels = np.asarray(labels)
    if not include_zero:
        labels = labels[labels != 0]

    scores = np.zeros(len(labels))
    for i, lab in enumerate(labels):
        in_a = array1 == lab
        in_b = array2 == lab
        denom = np.count_nonzero(in_a) + np.count_nonzero(in_b)
        scores[i] = 2.0 * np.count_nonzero(in_a & in_b) / max(
            denom, np.finfo(float).eps)
    return scores


def affine_shift_to_matrix(trf, resize=None, unshift_shape=None):
    """Flat 3-D affine shift params -> 4x4 matrix over identity."""
    matrix = np.eye(4)
    matrix[:3] += np.reshape(trf, (3, 4))
    if resize is not None:
        matrix[:3, -1] *= resize
    if unshift_shape is not None:
        # conjugate by the center-shift so the affine acts about the volume center
        center = (np.asarray(unshift_shape) - 1) / 2
        to_center = np.eye(4)
        to_center[:3, 3] = center
        from_center = np.eye(4)
        from_center[:3, 3] = -center
        matrix = to_center @ matrix @ from_center
    return matrix


def extract_largest_vol(bw, connectivity=1):
    """Keep only the largest connected component of a binary image."""
    lab = _ndi.label_components(bw.astype(bool), connectivity=connectivity)
    if lab.max() == 0:
        raise ValueError("no foreground component found")
    counts = np.bincount(lab.reshape(-1))[1:]
    return lab == (int(np.argmax(counts)) + 1)


def clean_seg(x, std=1):
    """Clean a binary segmentation: largest island, fill holes, smooth.

    Hole filling = complement of the background's largest component; the
    smoothed mask is re-thresholded at the value that preserves (about) the
    original foreground size.
    """
    island = extract_largest_vol(x)
    filled = np.logical_not(extract_largest_vol(np.logical_not(island)))
    smooth = _ndi.gaussian_filter(filled.astype(float), std)

    # pick the threshold whose superlevel set has ~the original voxel count
    # (kth largest smoothed value, k = foreground size)
    size = int(np.ceil(filled.sum()))
    thr = np.partition(smooth.ravel(), -(size + 1))[-(size + 1)]
    mask = smooth > thr

    assert abs(int(filled.sum()) - int(mask.sum())) <= 5, \
        "cleaning segmentation failed"
    return mask.astype(float)


def clean_seg_batch(X_label, std=1):
    """clean_seg over a batch shaped [B, *vol_shape, 1]."""
    cleaned = (clean_seg(item[..., 0].astype(float), std) for item in X_label)
    return np.stack(list(cleaned), 0)[..., None]


def filter_labels(atlas_vol, labels):
    """Zero out all voxels not in the given label set."""
    return np.where(np.isin(atlas_vol, labels), atlas_vol, 0)


def dist_trf(bwvol):
    """Distance transform from positive entries (distance outside the island)."""
    return _ndi.distance_transform_edt(np.logical_not(bwvol))


def signed_dist_trf(bwvol):
    """Signed distance from the island surface: positive outside, negative inside."""
    inside = np.asarray(bwvol, bool)
    return np.where(inside, -dist_trf(~inside), dist_trf(inside))


def vol_to_sdt(X_label, sdt=True, sdt_vol_resize=1):
    """Signed distance transform of a binary volume, optionally resized."""
    dt = signed_dist_trf(X_label)
    factors = (sdt_vol_resize if isinstance(sdt_vol_resize, (list, tuple))
               else [sdt_vol_resize] * dt.ndim)
    if any(f != 1 for f in factors):
        dt = _ndi.zoom(dt, factors, order=1)
    return dt if sdt else np.abs(dt)


def vol_to_sdt_batch(X_label, sdt=True, sdt_vol_resize=1):
    """vol_to_sdt over a batch shaped [B, *vol_shape, 1]."""
    assert X_label.shape[-1] == 1, "expects [batch_size, *vol_shape, 1]"
    per_item = (vol_to_sdt(item[..., 0], sdt=sdt, sdt_vol_resize=sdt_vol_resize)
                for item in X_label)
    return np.stack(list(per_item), 0)[..., None]


def get_surface_pts_per_label(total_nb_surface_pts, layer_edge_ratios):
    """Distribute a surface-point budget across labels by edge ratio (the
    last label absorbs rounding so counts sum exactly to the budget)."""
    counts = np.rint(np.asarray(layer_edge_ratios) * total_nb_surface_pts).astype(int)
    counts[-1] = total_nb_surface_pts - counts[:-1].sum()
    return counts


def edge_to_surface_pts(X_edges, nb_surface_pts=None, rng=None):
    """Sample (with replacement) surface point coordinates from an edge mask."""
    coords = np.argwhere(X_edges)
    if nb_surface_pts is None:
        return coords
    rng = rng or np.random.default_rng()
    return coords[rng.choice(len(coords), size=nb_surface_pts)]


def sdt_to_surface_pts(X_sdt, nb_surface_pts, surface_pts_upsample_factor=2,
                       thr=0.50001, resize_fn=None, rng=None):
    """Sample surface points from an SDT: upsample, take the near-zero band,
    draw points there, and map them back to the original index space."""
    if resize_fn is None:
        fine = _ndi.zoom(X_sdt, [surface_pts_upsample_factor] * X_sdt.ndim, order=1)
    else:
        fine = resize_fn(X_sdt)
        want = tuple(np.asarray(X_sdt.shape) * surface_pts_upsample_factor)
        assert tuple(fine.shape) == want, "resizing failed"

    pts = edge_to_surface_pts(np.abs(fine) < thr, nb_surface_pts=nb_surface_pts,
                              rng=rng)
    # endpoint-aligned rescale from the fine grid to the original one
    scale = (np.asarray(X_sdt.shape) - 1) / (np.asarray(fine.shape) - 1)
    return pts * scale


def jacobian_determinant(disp):
    """Jacobian determinant of a displacement field [*vol_shape, N] (numpy).

    Central differences of phi = id + disp, with the full per-voxel Jacobian
    assembled as J[..., i, j] = d(phi_i)/d(x_j) and reduced by np.linalg.det
    (same convention as the jnp version in ops/warp.py).
    """
    volshape = disp.shape[:-1]
    nd = len(volshape)
    assert nd in (2, 3), "flow has to be 2D or 3D"

    grid = np.stack(np.meshgrid(*map(np.arange, volshape), indexing="ij"), axis=-1)
    phi = grid + disp
    J = np.stack(np.gradient(phi, axis=tuple(range(nd))), axis=-1)
    return np.linalg.det(J)
