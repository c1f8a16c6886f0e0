import numpy as np
import jax.numpy as jnp
import pytest

from voxelmorph_tpu.ops import affine as A


RNG = np.random.default_rng(1)


def test_is_affine_shape():
    assert A.is_affine_shape((3, 4))
    assert A.is_affine_shape((4, 4))
    assert A.is_affine_shape((2, 3))
    assert not A.is_affine_shape((5, 1))      # 1-D dense field
    assert not A.is_affine_shape((8, 8, 3))   # dense volume
    with pytest.raises(ValueError):
        A.is_affine_shape((5, 4))             # bad row count


def test_make_square_and_invert():
    mat = jnp.asarray(RNG.normal(size=(3, 4)).astype(np.float32))
    mat = mat + jnp.eye(3, 4) * 3  # well-conditioned
    sq = A.make_square_affine(mat)
    assert sq.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(sq[-1]), [0, 0, 0, 1])
    inv = A.invert_affine(mat)
    ident = np.asarray(A.make_square_affine(mat) @ A.make_square_affine(inv))
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)


def test_angles_to_rotation_matrix_properties():
    ang = jnp.asarray([20.0, -35.0, 50.0])
    R = np.asarray(A.angles_to_rotation_matrix(ang))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # order X @ Y @ Z
    Rx = np.asarray(A.angles_to_rotation_matrix(jnp.asarray([20.0])))
    Ry = np.asarray(A.angles_to_rotation_matrix(jnp.asarray([0.0, -35.0])))
    Rz = np.asarray(A.angles_to_rotation_matrix(jnp.asarray([0.0, 0.0, 50.0])))
    np.testing.assert_allclose(R, Rx @ Ry @ Rz, atol=1e-5)


def test_rotation_angles_round_trip():
    ang = jnp.asarray([[10.0, 25.0, -40.0], [-80.0, 45.0, 170.0]])
    R = A.angles_to_rotation_matrix(ang)
    back = np.asarray(A.rotation_matrix_to_angles(R))
    np.testing.assert_allclose(back, np.asarray(ang), atol=1e-3)


def test_params_matrix_round_trip():
    par = jnp.asarray([1.5, -2.0, 0.5,      # shift
                       10.0, -20.0, 30.0,   # rot deg
                       1.1, 0.9, 1.05,      # scale
                       0.05, -0.1, 0.02])   # shear
    mat = A.params_to_affine_matrix(par)
    assert mat.shape == (3, 4)
    back = np.asarray(A.affine_matrix_to_params(mat))
    np.testing.assert_allclose(back, np.asarray(par), atol=1e-3)


def test_params_defaults_identity():
    mat = np.asarray(A.params_to_affine_matrix(jnp.zeros((3,))))
    np.testing.assert_allclose(mat, np.eye(3, 4), atol=1e-6)


def test_params_matrix_2d():
    par = jnp.asarray([2.0, -1.0, 30.0, 1.2, 0.8, 0.1])
    mat = A.params_to_affine_matrix(par, ndims=2)
    assert mat.shape == (2, 3)
    back = np.asarray(A.affine_matrix_to_params(mat))
    np.testing.assert_allclose(back, np.asarray(par), atol=1e-3)


def test_affine_to_dense_shift_identity():
    shift = A.affine_to_dense_shift(jnp.eye(3, 4), (4, 5, 6), shift_center=True)
    np.testing.assert_allclose(np.asarray(shift), 0.0, atol=1e-6)


def test_affine_to_dense_shift_translation():
    mat = jnp.eye(3, 4).at[:, -1].set(jnp.asarray([1.0, -2.0, 0.5]))
    shift = np.asarray(A.affine_to_dense_shift(mat, (4, 4, 4)))
    np.testing.assert_allclose(shift[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(shift[..., 1], -2.0, atol=1e-6)
    np.testing.assert_allclose(shift[..., 2], 0.5, atol=1e-6)


def test_affine_to_dense_shift_center_semantics():
    # pure scaling about the center leaves the center voxel fixed
    mat = jnp.asarray([[2.0, 0, 0, 0], [0, 2.0, 0, 0], [0, 0, 2.0, 0]])
    shift = np.asarray(A.affine_to_dense_shift(mat, (5, 5, 5), shift_center=True))
    np.testing.assert_allclose(shift[2, 2, 2], 0.0, atol=1e-6)
    # without centering, voxel 0 is fixed
    shift0 = np.asarray(A.affine_to_dense_shift(mat, (5, 5, 5), shift_center=False))
    np.testing.assert_allclose(shift0[0, 0, 0], 0.0, atol=1e-6)


def test_affine_to_dense_shift_batched():
    mats = jnp.stack([jnp.eye(3, 4), jnp.eye(3, 4).at[0, -1].set(2.0)])
    shift = A.affine_to_dense_shift(mats, (3, 3, 3))
    assert shift.shape == (2, 3, 3, 3, 3)
    np.testing.assert_allclose(np.asarray(shift[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(shift[1, ..., 0]), 2.0, atol=1e-6)


def test_fit_affine_recovers_exact():
    mat = np.asarray(A.params_to_affine_matrix(
        jnp.asarray([1.0, 2.0, -1.0, 5.0, -10.0, 15.0, 1.1, 0.95, 1.0])))
    x_target = RNG.normal(size=(20, 3)).astype(np.float32) * 10
    x_source = (mat[:, :3] @ x_target.T + mat[:, 3:]).T
    fit = np.asarray(A.fit_affine(jnp.asarray(x_source), jnp.asarray(x_target)))
    np.testing.assert_allclose(fit, mat, atol=1e-3)


def test_fit_affine_weighted():
    mat = np.eye(3, 4, dtype=np.float32)
    mat[0, 3] = 4.0
    x_target = RNG.normal(size=(30, 3)).astype(np.float32) * 5
    x_source = (mat[:3, :3] @ x_target.T + mat[:, 3:]).T
    # corrupt half the points but zero their weights
    x_source_bad = x_source.copy()
    x_source_bad[15:] += 100
    w = np.ones(30, np.float32)
    w[15:] = 0
    fit = np.asarray(A.fit_affine(jnp.asarray(x_source_bad), jnp.asarray(x_target),
                                  weights=jnp.asarray(w)))
    np.testing.assert_allclose(fit, mat, atol=1e-3)


def test_rescale_affine():
    mat = jnp.eye(3, 4).at[:, -1].set(jnp.asarray([2.0, 4.0, 6.0]))
    out = np.asarray(A.rescale_affine(mat, 0.5))
    np.testing.assert_allclose(out[:, -1], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(out[:, :-1], np.eye(3))
