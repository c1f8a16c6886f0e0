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


def read_file_list(filename, prefix=None, suffix=None):
    """Read a line-separated list of files, with optional prefix/suffix."""
    with open(filename, "r") as f:
        content = f.readlines()
    filelist = [x.strip() for x in content if x.strip()]
    if prefix is not None:
        filelist = [prefix + f for f in filelist]
    if suffix is not None:
        filelist = [f + suffix for f in filelist]
    return filelist


def read_pair_list(filename, delim=None, prefix=None, suffix=None):
    """Read a line-separated list of registration file pairs."""
    pairlist = [f.split(delim) for f in read_file_list(filename)]
    if prefix is not None:
        pairlist = [[prefix + f for f in pair] for pair in pairlist]
    if suffix is not None:
        pairlist = [[f + suffix for f in pair] for pair in pairlist]
    return pairlist


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
        vol, _ = pad(vol, pad_shape)

    if add_feat_axis:
        vol = vol[..., np.newaxis]

    if resize_factor != 1:
        vol = resize(vol, resize_factor)

    if add_batch_axis:
        vol = vol[np.newaxis, ...]

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
    if not isinstance(arg, (tuple, list)):
        arg = [arg]
    files = [os.path.join(f, "*") if os.path.isdir(f) else f for f in map(str, arg)]
    files = sum((glob.glob(f) for f in files), [])
    files = [f for f in files if f.endswith(ext)]
    if len(files) == 0:
        raise ValueError(f'no labels found for argument "{files}"')

    label_maps = []
    shape = None
    for f in files:
        x = np.squeeze(load_volfile(f))
        if shape is None:
            shape = np.shape(x)
        if not np.issubdtype(x.dtype, np.integer):
            raise ValueError(f'file "{f}" has non-integral data type')
        if not np.all(x.shape == shape):
            raise ValueError(f'shape {x.shape} of file "{f}" is not {shape}')
        label_maps.append(x)

    return np.unique(label_maps), label_maps


def load_pheno_csv(filename, training_files=None):
    """Load a filename->attribute-vector csv; see reference py/utils.py:202-232."""
    pheno = {}
    with open(filename) as csv_file:
        reader = csv.reader(csv_file, delimiter=",")
        next(reader)  # header
        for row in reader:
            pheno[row[0]] = np.array([float(f) for f in row[1:]])

    if training_files is None:
        training_files = list(pheno.keys())
    else:
        training_files = [f for f in training_files if os.path.basename(f) in pheno.keys()]
        for f in training_files:
            pheno[f] = pheno[os.path.basename(f)]

    return pheno, training_files


def pad(array, shape):
    """Zero-pad to a shape (centered). Returns (padded, crop slices)."""
    if array.shape == tuple(shape):
        return array, ...
    padded = np.zeros(shape, dtype=array.dtype)
    offsets = [int((p - v) / 2) for p, v in zip(shape, array.shape)]
    slices = tuple(slice(offset, l + offset) for offset, l in zip(offsets, array.shape))
    padded[slices] = array
    return padded, slices


def resize(array, factor, batch_axis=False):
    """Nearest-neighbor resize by a factor; last axis is features."""
    if factor == 1:
        return array
    if not batch_axis:
        dim_factors = [factor for _ in array.shape[:-1]] + [1]
    else:
        dim_factors = [1] + [factor for _ in array.shape[1:-1]] + [1]
    return _ndi.zoom(array, dim_factors, order=0)


def dice(array1, array2, labels=None, include_zero=False):
    """Hard-label Dice overlap per label (reference py/utils.py:265-287)."""
    if labels is None:
        labels = np.concatenate([np.unique(a) for a in [array1, array2]])
        labels = np.sort(np.unique(labels))
    if not include_zero:
        labels = np.delete(labels, np.argwhere(labels == 0))

    dicem = np.zeros(len(labels))
    for idx, label in enumerate(labels):
        top = 2 * np.sum(np.logical_and(array1 == label, array2 == label))
        bottom = np.sum(array1 == label) + np.sum(array2 == label)
        bottom = np.maximum(bottom, np.finfo(float).eps)
        dicem[idx] = top / bottom
    return dicem


def affine_shift_to_matrix(trf, resize=None, unshift_shape=None):
    """Flat 3-D affine shift params -> 4x4 matrix over identity."""
    matrix = np.concatenate([trf.reshape((3, 4)), np.zeros((1, 4))], 0) + np.eye(4)
    if resize is not None:
        matrix[:3, -1] *= resize
    if unshift_shape is not None:
        T = np.zeros((4, 4))
        T[:3, 3] = (np.array(unshift_shape) - 1) / 2
        matrix = (np.eye(4) + T) @ matrix @ (np.eye(4) - T)
    return matrix


def extract_largest_vol(bw, connectivity=1):
    """Keep only the largest connected component of a binary image."""
    lab = _ndi.label_components(bw.astype(bool), connectivity=connectivity)
    if lab.max() == 0:
        raise ValueError("no foreground component found")
    counts = np.bincount(lab.reshape(-1))[1:]
    return lab == (int(np.argmax(counts)) + 1)


def clean_seg(x, std=1):
    """Clean a binary segmentation: largest island, fill holes, smooth."""
    bw = extract_largest_vol(x)
    bw = 1 - extract_largest_vol(1 - bw)
    gadt = _ndi.gaussian_filter(bw.astype("float"), std)

    sgadt = np.sort(gadt.flatten())[::-1]
    thr = sgadt[np.ceil(bw.sum()).astype(int)]
    clean_bw = gadt > thr

    assert np.isclose(bw.sum(), clean_bw.sum(), atol=5), "cleaning segmentation failed"
    return clean_bw.astype(float)


def clean_seg_batch(X_label, std=1):
    """clean_seg over a batch shaped [B, *vol_shape, 1]."""
    if not X_label.dtype == "float":
        X_label = X_label.astype("float")
    data = np.zeros(X_label.shape)
    for xi, x in enumerate(X_label):
        data[xi, ..., 0] = clean_seg(x[..., 0], std)
    return data


def filter_labels(atlas_vol, labels):
    """Zero out all voxels not in the given label set."""
    mask = np.zeros(atlas_vol.shape, "bool")
    for label in labels:
        mask = np.logical_or(mask, atlas_vol == label)
    return atlas_vol * mask


def dist_trf(bwvol):
    """Distance transform from positive entries (distance outside the island)."""
    revbwvol = np.logical_not(bwvol)
    return _ndi.distance_transform_edt(revbwvol)


def signed_dist_trf(bwvol):
    """Signed distance from the island surface: positive outside, negative inside."""
    posdst = dist_trf(bwvol)
    notbwvol = np.logical_not(bwvol)
    negdst = dist_trf(notbwvol)
    return posdst * notbwvol - negdst * bwvol


def vol_to_sdt(X_label, sdt=True, sdt_vol_resize=1):
    """Signed distance transform of a binary volume, optionally resized."""
    X_dt = signed_dist_trf(X_label)
    if not (sdt_vol_resize == 1):
        if not isinstance(sdt_vol_resize, (list, tuple)):
            sdt_vol_resize = [sdt_vol_resize] * X_dt.ndim
        if any(f != 1 for f in sdt_vol_resize):
            X_dt = _ndi.zoom(X_dt, sdt_vol_resize, order=1)
    if not sdt:
        X_dt = np.abs(X_dt)
    return X_dt


def vol_to_sdt_batch(X_label, sdt=True, sdt_vol_resize=1):
    """vol_to_sdt over a batch shaped [B, *vol_shape, 1]."""
    assert X_label.shape[-1] == 1, "implemented assuming size is [batch_size, *vol_shape, 1]"
    X_lst = [f[..., 0] for f in X_label]
    X_dt_lst = [vol_to_sdt(f, sdt=sdt, sdt_vol_resize=sdt_vol_resize) for f in X_lst]
    return np.stack(X_dt_lst, 0)[..., np.newaxis]


def get_surface_pts_per_label(total_nb_surface_pts, layer_edge_ratios):
    """Distribute a surface-point budget across labels by edge ratio."""
    nb_surface_pts_sel = np.round(
        np.array(layer_edge_ratios) * total_nb_surface_pts).astype("int")
    nb_surface_pts_sel[-1] = total_nb_surface_pts - int(np.sum(nb_surface_pts_sel[:-1]))
    return nb_surface_pts_sel


def edge_to_surface_pts(X_edges, nb_surface_pts=None, rng=None):
    """Sample (with replacement) surface point coordinates from an edge mask."""
    surface_pts = np.stack(np.where(X_edges), 0).transpose()
    if nb_surface_pts is not None:
        rng = np.random.default_rng() if rng is None else rng
        chi = rng.choice(surface_pts.shape[0], size=nb_surface_pts)
        surface_pts = surface_pts[chi, :]
    return surface_pts


def sdt_to_surface_pts(X_sdt, nb_surface_pts, surface_pts_upsample_factor=2,
                       thr=0.50001, resize_fn=None, rng=None):
    """Sample surface points from an SDT by upsampling + thresholding."""
    us = [surface_pts_upsample_factor] * X_sdt.ndim
    if resize_fn is None:
        resized_vol = _ndi.zoom(X_sdt, us, order=1)
    else:
        resized_vol = resize_fn(X_sdt)
        pred_shape = np.array(X_sdt.shape) * surface_pts_upsample_factor
        assert np.array_equal(pred_shape, resized_vol.shape), "resizing failed"

    X_edges = np.abs(resized_vol) < thr
    sf_pts = edge_to_surface_pts(X_edges, nb_surface_pts=nb_surface_pts, rng=rng)

    # rescale to original index space (accounting for interpolation endpoints)
    pt = [sf_pts[..., f] * (X_sdt.shape[f] - 1) / (X_edges.shape[f] - 1)
          for f in range(X_sdt.ndim)]
    return np.stack(pt, -1)


def jacobian_determinant(disp):
    """Jacobian determinant of a displacement field [*vol_shape, N] (numpy)."""
    volshape = disp.shape[:-1]
    nb_dims = len(volshape)
    assert nb_dims in (2, 3), "flow has to be 2D or 3D"

    grid = np.stack(np.meshgrid(*[np.arange(s) for s in volshape], indexing="ij"), nb_dims)
    J = np.gradient(disp + grid)

    if nb_dims == 3:
        dx, dy, dz = J[0], J[1], J[2]
        Jdet0 = dx[..., 0] * (dy[..., 1] * dz[..., 2] - dy[..., 2] * dz[..., 1])
        Jdet1 = dx[..., 1] * (dy[..., 0] * dz[..., 2] - dy[..., 2] * dz[..., 0])
        Jdet2 = dx[..., 2] * (dy[..., 0] * dz[..., 1] - dy[..., 1] * dz[..., 0])
        return Jdet0 - Jdet1 + Jdet2
    dfdx, dfdy = J[0], J[1]
    return dfdx[..., 0] * dfdy[..., 1] - dfdy[..., 0] * dfdx[..., 1]
