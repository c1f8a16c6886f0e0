"""Affine-matrix algebra for N-D (N in {2, 3}) registration, in pure jnp.

Re-designed from the behavior of /root/reference/voxelmorph/tf/utils/utils.py
(:525-1090): same conventions — (N, N+1) or (N+1, N+1) matrices, ij indexing,
intrinsic right-handed rotations composed ``R = X @ Y @ Z``, affine built as
``T @ R @ S @ E`` (translate, rotate, scale, shear). Everything is batchable
over leading axes and differentiable.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "is_affine_shape",
    "validate_affine_shape",
    "make_square_affine",
    "affine_add_identity",
    "affine_remove_identity",
    "invert_affine",
    "rescale_affine",
    "affine_to_dense_shift",
    "angles_to_rotation_matrix",
    "params_to_affine_matrix",
    "rotation_matrix_to_angles",
    "affine_matrix_to_params",
    "fit_affine",
]


def is_affine_shape(shape) -> bool:
    """True if a (batch-free) shape is (M, N+1) with N in (2,3), M in (N, N+1).

    A trailing dim of 1 is never an affine (it is a 1-D dense field).
    """
    if len(shape) == 2 and shape[-1] != 1:
        validate_affine_shape(shape)
        return True
    return False


def validate_affine_shape(shape):
    ndim = shape[-1] - 1
    rows = shape[-2]
    if ndim not in (2, 3):
        raise ValueError(f"Affine matrix must be 2D or 3D, got {ndim}D")
    if rows not in (ndim, ndim + 1):
        raise ValueError(f"{ndim}D affine matrix must have {ndim} or {ndim + 1} rows, got {rows}.")


def make_square_affine(mat: jnp.ndarray) -> jnp.ndarray:
    """(..., N, N+1) -> (..., N+1, N+1) by appending the (0,...,0,1) row."""
    validate_affine_shape(mat.shape)
    if mat.shape[-2] == mat.shape[-1]:
        return mat
    n1 = mat.shape[-1]
    row = jnp.zeros((*mat.shape[:-2], 1, n1), dtype=mat.dtype).at[..., 0, -1].set(1.0)
    return jnp.concatenate([mat, row], axis=-2)


def affine_add_identity(mat: jnp.ndarray) -> jnp.ndarray:
    rows, ndp1 = mat.shape[-2:]
    return mat + jnp.eye(ndp1, dtype=mat.dtype)[:rows]


def affine_remove_identity(mat: jnp.ndarray) -> jnp.ndarray:
    rows, ndp1 = mat.shape[-2:]
    return mat - jnp.eye(ndp1, dtype=mat.dtype)[:rows]


def invert_affine(mat: jnp.ndarray) -> jnp.ndarray:
    rows = mat.shape[-2]
    return jnp.linalg.inv(make_square_affine(mat))[..., :rows, :]


def rescale_affine(mat: jnp.ndarray, factor) -> jnp.ndarray:
    """Scale the translation column by ``factor`` (zoom of the target grid)."""
    translation = mat[..., -1:] * factor
    return jnp.concatenate([mat[..., :-1], translation], axis=-1)


def affine_to_dense_shift(
    matrix: jnp.ndarray,
    shape: Sequence[int],
    shift_center: bool = True,
    warp_right: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Convert an affine matrix to a dense displacement field.

    Matches /root/reference/voxelmorph/tf/utils/utils.py:638-699: build the ij
    grid (optionally centered), optionally right-compose with a dense warp,
    apply the matrix, subtract the grid.

    Args:
      matrix: (..., M, N+1) affine, M in (N, N+1); any batch dims.
      shape: N spatial dims of the output space.
      shift_center: center the grid at the image center before the matmul.
      warp_right: optional dense warp (..., *shape, N) composed on the right.

    Returns:
      Dense shift of shape (..., *shape, N).
    """
    shape = tuple(int(s) for s in shape)
    ndims = len(shape)
    if not jnp.issubdtype(matrix.dtype, jnp.floating):
        matrix = matrix.astype(jnp.float32)
    if matrix.shape[-1] != ndims + 1:
        raise ValueError(
            f"Affine ({matrix.shape[-1] - 1}D) does not match target shape ({ndims}D)."
        )
    validate_affine_shape(matrix.shape)

    axes = [jnp.arange(s, dtype=matrix.dtype) for s in shape]
    if shift_center:
        axes = [ax - 0.5 * (s - 1) for ax, s in zip(axes, shape)]
    mesh = jnp.stack([m.reshape(-1) for m in jnp.meshgrid(*axes, indexing="ij")])  # (N, V)

    out = mesh
    if warp_right is not None:
        warp_right = warp_right.astype(matrix.dtype)
        flat = warp_right.reshape(*warp_right.shape[: -1 - ndims], -1, ndims)
        out = out + jnp.swapaxes(flat, -1, -2)  # (..., N, V)

    out = matrix[..., :ndims, :-1] @ out + matrix[..., :ndims, -1:]
    out = jnp.swapaxes(out - mesh, -1, -2)  # (..., V, N)
    return out.reshape(*matrix.shape[:-2], *shape, ndims)


def angles_to_rotation_matrix(ang, deg: bool = True, ndims: int = 3) -> jnp.ndarray:
    """Euler angles -> rotation matrix, intrinsic right-handed, R = X @ Y @ Z.

    ``ang`` has shape (..., M) with M <= (1 if 2-D else 3); missing angles are
    zero. Scalars and python lists are accepted.
    """
    if ndims not in (2, 3):
        raise ValueError(f"Affine matrix must be 2D or 3D, but got ndims of {ndims}.")
    if isinstance(ang, (list, tuple)):
        ang = jnp.stack([jnp.asarray(a, dtype=jnp.float32) for a in ang], axis=-1)
    ang = jnp.asarray(ang)
    if not jnp.issubdtype(ang.dtype, jnp.floating):
        ang = ang.astype(jnp.float32)
    scalar_input = ang.ndim == 0
    if scalar_input:
        ang = ang.reshape(1)

    num_ang = 1 if ndims == 2 else 3
    if ang.shape[-1] > num_ang:
        raise ValueError(f"Number of angles exceeds value {num_ang} expected for dimensionality.")
    pad = num_ang - ang.shape[-1]
    if pad > 0:
        ang = jnp.concatenate([ang, jnp.zeros((*ang.shape[:-1], pad), ang.dtype)], axis=-1)

    if deg:
        ang = ang * (math.pi / 180.0)
    c = jnp.cos(ang)
    s = jnp.sin(ang)

    if ndims == 2:
        out = jnp.stack(
            [
                jnp.stack([c[..., 0], -s[..., 0]], axis=-1),
                jnp.stack([s[..., 0], c[..., 0]], axis=-1),
            ],
            axis=-2,
        )
    else:
        one = jnp.ones_like(c[..., 0])
        zero = jnp.zeros_like(c[..., 0])
        rx = jnp.stack(
            [
                jnp.stack([one, zero, zero], axis=-1),
                jnp.stack([zero, c[..., 0], -s[..., 0]], axis=-1),
                jnp.stack([zero, s[..., 0], c[..., 0]], axis=-1),
            ],
            axis=-2,
        )
        ry = jnp.stack(
            [
                jnp.stack([c[..., 1], zero, s[..., 1]], axis=-1),
                jnp.stack([zero, one, zero], axis=-1),
                jnp.stack([-s[..., 1], zero, c[..., 1]], axis=-1),
            ],
            axis=-2,
        )
        rz = jnp.stack(
            [
                jnp.stack([c[..., 2], -s[..., 2], zero], axis=-1),
                jnp.stack([s[..., 2], c[..., 2], zero], axis=-1),
                jnp.stack([zero, zero, one], axis=-1),
            ],
            axis=-2,
        )
        out = rx @ ry @ rz

    return out[0] if scalar_input else out


def params_to_affine_matrix(
    par,
    deg: bool = True,
    shift_scale: bool = False,
    last_row: bool = False,
    ndims: int = 3,
) -> jnp.ndarray:
    """(shift, rot, scale, shear) params -> affine matrix, T @ R @ S @ E order.

    ``par`` has shape (..., M) with M <= N*(N+1); missing params default to
    identity (scale defaults to 1 unless ``shift_scale``).
    """
    if ndims not in (2, 3):
        raise ValueError(f"Affine matrix must be 2D or 3D, but got ndims of {ndims}.")
    if isinstance(par, (list, tuple)):
        par = jnp.stack([jnp.asarray(p, dtype=jnp.float32) for p in par], axis=-1)
    par = jnp.asarray(par)
    if not jnp.issubdtype(par.dtype, jnp.floating):
        par = par.astype(jnp.float32)
    scalar_input = par.ndim == 0
    if scalar_input:
        par = par.reshape(1)

    num_par = 6 if ndims == 2 else 12
    if par.shape[-1] > num_par:
        raise ValueError(f"Number of params exceeds value {num_par} expected for dimensionality.")

    splits = (2, 1, 2, 1) if ndims == 2 else (3, 3, 3, 3)
    # Pad progressively so scale params (3rd group) default to 1, others to 0.
    m = par.shape[-1]
    n_shift, n_rot, n_scale, n_shear = splits
    bounds = [n_shift, n_shift + n_rot, n_shift + n_rot + n_scale, num_par]
    scale_default = 0.0 if shift_scale else 1.0
    defaults = jnp.concatenate(
        [
            jnp.zeros(bounds[1], par.dtype),
            jnp.full((n_scale,), scale_default, par.dtype),
            jnp.zeros((n_shear,), par.dtype),
        ]
    )
    if m < num_par:
        fill = jnp.broadcast_to(defaults[m:], (*par.shape[:-1], num_par - m))
        par = jnp.concatenate([par, fill], axis=-1)

    shift = par[..., :bounds[0]]
    rot = par[..., bounds[0]:bounds[1]]
    scale = par[..., bounds[1]:bounds[2]]
    shear = par[..., bounds[2]:]

    one = jnp.ones_like(shear[..., 0])
    zero = jnp.zeros_like(shear[..., 0])
    if ndims == 2:
        mat_shear = jnp.stack(
            [
                jnp.stack([one, shear[..., 0]], axis=-1),
                jnp.stack([zero, one], axis=-1),
            ],
            axis=-2,
        )
    else:
        mat_shear = jnp.stack(
            [
                jnp.stack([one, shear[..., 0], shear[..., 1]], axis=-1),
                jnp.stack([zero, one, shear[..., 2]], axis=-1),
                jnp.stack([zero, zero, one], axis=-1),
            ],
            axis=-2,
        )

    diag = scale + 1.0 if shift_scale else scale
    mat_scale = jnp.zeros((*diag.shape, ndims), diag.dtype)
    idx = jnp.arange(ndims)
    mat_scale = mat_scale.at[..., idx, idx].set(diag)
    mat_rot = angles_to_rotation_matrix(rot, deg=deg, ndims=ndims)
    out = mat_rot @ (mat_scale @ mat_shear)
    out = jnp.concatenate([out, shift[..., None]], axis=-1)

    if last_row:
        row = jnp.zeros((*out.shape[:-2], 1, ndims + 1), out.dtype).at[..., 0, -1].set(1.0)
        out = jnp.concatenate([out, row], axis=-2)

    return out[0] if scalar_input else out


def rotation_matrix_to_angles(mat: jnp.ndarray, deg: bool = True) -> jnp.ndarray:
    """Rotation matrix -> Euler angles (inverse of angles_to_rotation_matrix).

    Handles the +/-90deg gimbal-lock about y by fixing ang[0] = 0. See the
    matrix decomposition documented at the reference's
    rotation_matrix_to_angles (tf/utils/utils.py:902-980).
    """
    mat = jnp.asarray(mat, dtype=jnp.float32)
    num_dim = mat.shape[-1]
    assert num_dim in (2, 3), "only 2D and 3D supported"

    clip = lambda x: jnp.clip(x, -1.0, 1.0)
    if num_dim == 2:
        ang = jnp.arctan2(clip(mat[..., 1, 0]), clip(mat[..., 0, 0]))[..., None]
    else:
        ang2 = jnp.arcsin(clip(mat[..., 0, 2]))
        ang1_a = jnp.zeros_like(ang2)
        ang3_a = jnp.arctan2(clip(mat[..., 1, 0]), clip(mat[..., 1, 1]))
        c2 = jnp.cos(ang2)
        safe_div = lambda a, b: jnp.where(b == 0, 0.0, a / jnp.where(b == 0, 1.0, b))
        ang1_b = jnp.arctan2(clip(safe_div(-mat[..., 1, 2], c2)), clip(safe_div(mat[..., 2, 2], c2)))
        ang3_b = jnp.arctan2(clip(safe_div(-mat[..., 0, 1], c2)), clip(safe_div(mat[..., 0, 0], c2)))
        is_lock = jnp.abs(jnp.abs(ang2) - 0.5 * math.pi) < 1e-6
        ang1 = jnp.where(is_lock, ang1_a, ang1_b)
        ang3 = jnp.where(is_lock, ang3_a, ang3_b)
        ang = jnp.stack([ang1, ang2, ang3], axis=-1)

    if deg:
        ang = ang * (180.0 / math.pi)
    return ang


def affine_matrix_to_params(mat: jnp.ndarray, deg: bool = True) -> jnp.ndarray:
    """Affine matrix -> (shift, rot, scale, shear) params via Cholesky.

    Inverse of params_to_affine_matrix; fixes negative determinants by
    negating the first scale.
    """
    mat = jnp.asarray(mat, dtype=jnp.float32)
    num_dim = mat.shape[-1] - 1
    assert num_dim in (2, 3), f"invalid dimensionality {num_dim}"
    assert mat.shape[-2] - num_dim in (0, 1), f"invalid shape {mat.shape}"

    shift = mat[..., :num_dim, -1]
    lin = mat[..., :num_dim, :num_dim]
    lower = jnp.linalg.cholesky(jnp.swapaxes(lin, -1, -2) @ lin)
    scale = jnp.diagonal(lower, axis1=-2, axis2=-1)
    scale0 = scale[..., 0] * jnp.sign(jnp.linalg.det(lin))
    scale = jnp.concatenate([scale0[..., None], scale[..., 1:]], axis=-1)

    idx = jnp.arange(num_dim)
    strip = jnp.zeros_like(lower).at[..., idx, idx].set(scale)
    upper = jnp.linalg.inv(strip) @ jnp.swapaxes(lower, -1, -2)
    upper_flat = upper.reshape(*scale0.shape, num_dim * num_dim)
    ind = (1,) if num_dim == 2 else (1, 2, 5)
    shear = upper_flat[..., jnp.asarray(ind)]

    zeros = jnp.zeros((*scale0.shape, (num_dim - 1) * 3), mat.dtype)
    par = jnp.concatenate([zeros, scale, shear], axis=-1)
    strip_mat = params_to_affine_matrix(par, ndims=num_dim)[..., :-1]
    rotmat = lin @ jnp.linalg.inv(strip_mat)
    rot = rotation_matrix_to_angles(rotmat, deg=deg)

    return jnp.concatenate([shift, rot, scale, shear], axis=-1)


def fit_affine(
    x_source: jnp.ndarray,
    x_target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(Weighted) least-squares affine fit between corresponding point sets.

    Solves for ``mat`` of shape (..., N, N+1) such that
    ``x_source ~ mat[..., :-1] @ x_target^T + mat[..., -1:]`` — note the
    source/target direction convention of the reference (tf/utils/utils.py:
    1049-1090), where source coordinates live in the target image space.
    """
    ones = jnp.ones((*x_target.shape[:-1], 1), dtype=x_target.dtype)
    x = jnp.concatenate([x_target, ones], axis=-1)  # (..., M, N+1)
    x_t = jnp.swapaxes(x, -1, -2)
    if weights is not None:
        if weights.ndim == x.ndim:
            weights = weights[..., 0]
        x_t = x_t * weights[..., None, :]
    beta = jnp.linalg.inv(x_t @ x) @ x_t @ x_source
    return jnp.swapaxes(beta, -1, -2)
