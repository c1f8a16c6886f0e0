import numpy as np
import jax
import jax.numpy as jnp

from voxelmorph_tpu.ops import affine as A
from voxelmorph_tpu.ops import warp as W
from voxelmorph_tpu.ops.interp import ndgrid
from np_reference import transform_np


RNG = np.random.default_rng(2)


def smooth_field(shape, scale=2.0, nd=3):
    """Small smooth random displacement field for diffeomorphic tests."""
    low = RNG.normal(size=(*[max(2, s // 8) for s in shape], nd)).astype(np.float32)
    from voxelmorph_tpu.ops.interp import resize
    f = resize(jnp.asarray(low), [s / l for s, l in zip(shape, low.shape[:-1])],
               new_shape=shape)
    return np.asarray(f) * scale


def test_transform_matches_numpy():
    vol = RNG.normal(size=(6, 7, 8, 2)).astype(np.float32)
    shift = RNG.uniform(-2, 2, size=(6, 7, 8, 3)).astype(np.float32)
    got = np.asarray(W.transform(jnp.asarray(vol), jnp.asarray(shift)))
    want = transform_np(vol, shift)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_transform_zero_shift_identity():
    vol = RNG.normal(size=(5, 5, 5, 1)).astype(np.float32)
    out = np.asarray(W.transform(jnp.asarray(vol), jnp.zeros((5, 5, 5, 3))))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_transform_affine_input():
    vol = RNG.normal(size=(8, 8, 1)).astype(np.float32)
    mat = jnp.eye(2, 3).at[0, -1].set(1.0)  # data shifts by -1 along axis 0
    out = np.asarray(W.transform(jnp.asarray(vol), mat, shift_center=False))
    np.testing.assert_allclose(out[:-1], vol[1:], atol=1e-5)


def test_transform_channelwise():
    vol = RNG.normal(size=(6, 6, 2)).astype(np.float32)
    shift = RNG.uniform(-1, 1, size=(6, 6, 2, 2)).astype(np.float32)
    got = np.asarray(W.transform(jnp.asarray(vol), jnp.asarray(shift)))
    for c in range(2):
        want = transform_np(vol[..., c:c + 1], shift[:, :, c, :])[..., 0]
        np.testing.assert_allclose(got[..., c], want, rtol=1e-4, atol=1e-4)


def test_transform_fill_value():
    vol = np.ones((5, 5, 1), np.float32)
    shift = np.full((5, 5, 2), 10.0, np.float32)  # everything out of bounds
    out = np.asarray(W.transform(jnp.asarray(vol), jnp.asarray(shift), fill_value=0.0))
    np.testing.assert_allclose(out, 0.0)


def test_compose_affine_only():
    m1 = A.params_to_affine_matrix(jnp.asarray([1.0, 0, 0]))
    m2 = A.params_to_affine_matrix(jnp.asarray([0.0, 2.0, 0]))
    out = W.compose([m1, m2])
    assert out.shape == (3, 4)
    want = np.asarray(A.make_square_affine(m2) @ A.make_square_affine(m1))[:3]
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_compose_dense_with_translation():
    # compose two constant translations -> sum (interior)
    s1 = np.zeros((8, 8, 2), np.float32)
    s1[..., 0] = 1.0
    s2 = np.zeros((8, 8, 2), np.float32)
    s2[..., 1] = 2.0
    out = np.asarray(W.compose([jnp.asarray(s1), jnp.asarray(s2)]))
    np.testing.assert_allclose(out[:5, :5, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[:5, :5, 1], 2.0, atol=1e-5)


def test_compose_application_order():
    # T = compose([A, B]) should act like applying A then B to an image:
    # warping with T == warping with B then warping with A (pull semantics
    # compose right-to-left on the image).
    # smooth analytic image: double-interpolation error is second order, so
    # the one-pass and two-pass paths should agree closely
    xx, yy = np.meshgrid(np.arange(12.0), np.arange(12.0), indexing="ij")
    vol = (np.sin(xx / 3.0) + np.cos(yy / 2.5))[..., None].astype(np.float32)
    a = smooth_field((12, 12), scale=0.5, nd=2)
    b = smooth_field((12, 12), scale=0.5, nd=2)
    composed = W.compose([jnp.asarray(a), jnp.asarray(b)])
    out1 = np.asarray(W.transform(jnp.asarray(vol), composed))
    step = W.transform(jnp.asarray(vol), jnp.asarray(a))
    out2 = np.asarray(W.transform(step, jnp.asarray(b)))
    interior = (slice(3, -3),) * 2
    np.testing.assert_allclose(out1[interior], out2[interior], atol=0.05)


def test_integrate_vec_zero_steps():
    v = jnp.asarray(RNG.normal(size=(6, 6, 2)).astype(np.float32))
    out = W.integrate_vec(v, nb_steps=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-6)


def test_integrate_vec_inverse_consistency():
    # phi = exp(v), psi = exp(-v) should compose to ~identity
    shape = (16, 16, 16)
    v = jnp.asarray(smooth_field(shape, scale=1.0))
    pos = W.integrate_vec(v, nb_steps=7)
    neg = W.integrate_vec(-v, nb_steps=7)
    comp = np.asarray(W.compose([pos, neg]))
    interior = (slice(3, -3),) * 3
    # residual should be far below the field magnitude (~1 voxel)
    assert np.abs(comp[interior]).max() < 0.2


def test_integrate_vec_remat_matches():
    v = jnp.asarray(smooth_field((10, 10), scale=1.0, nd=2))
    a = np.asarray(W.integrate_vec(v, nb_steps=5, remat=True))
    b = np.asarray(W.integrate_vec(v, nb_steps=5, remat=False))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_integrate_vec_gradient_flows():
    v = jnp.asarray(smooth_field((8, 8), scale=0.5, nd=2))

    def loss(vv):
        return jnp.sum(W.integrate_vec(vv, nb_steps=4) ** 2)

    g = jax.grad(loss)(v)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_rescale_dense_transform():
    trf = jnp.asarray(np.ones((8, 8, 2), np.float32))
    half = W.rescale_dense_transform(trf, 0.5)
    assert half.shape == (4, 4, 2)
    np.testing.assert_allclose(np.asarray(half), 0.5, atol=1e-5)
    twice = W.rescale_dense_transform(half, 2.0)
    assert twice.shape == (8, 8, 2)
    np.testing.assert_allclose(np.asarray(twice), 1.0, atol=1e-5)


def test_point_spatial_transformer():
    trf = np.zeros((10, 10, 2), np.float32)
    trf[..., 0] = 2.0
    pts = jnp.asarray([[1.0, 1.0], [4.0, 5.0]])
    out = np.asarray(W.point_spatial_transformer(pts, jnp.asarray(trf)))
    np.testing.assert_allclose(out, [[3.0, 1.0], [6.0, 5.0]], atol=1e-5)


def test_jacobian_determinant_identity():
    disp = jnp.zeros((6, 6, 6, 3))
    jd = np.asarray(W.jacobian_determinant(disp))
    np.testing.assert_allclose(jd, 1.0, atol=1e-5)


def test_jacobian_determinant_scaling():
    # disp = 0.5 * x -> phi = 1.5 x -> det = 1.5^3 (interior, central diff)
    grid = np.asarray(ndgrid((8, 8, 8)))
    disp = jnp.asarray(0.5 * grid)
    jd = np.asarray(W.jacobian_determinant(disp))
    np.testing.assert_allclose(jd[1:-1, 1:-1, 1:-1], 1.5 ** 3, atol=1e-4)


def test_value_at_location():
    vol = jnp.asarray(RNG.normal(size=(6, 6, 1)).astype(np.float32))
    pts = jnp.asarray([[2.0, 3.0]])
    out = np.asarray(W.value_at_location(vol, pts))
    np.testing.assert_allclose(out[0, 0], abs(float(vol[2, 3, 0])), atol=1e-5)


def test_integrate_vec_ode_matches_ss():
    # for smooth small fields, RK4 ode and scaling-and-squaring agree
    v = jnp.asarray(smooth_field((12, 12), scale=0.8, nd=2))
    ss = np.asarray(W.integrate_vec(v, method="ss", nb_steps=7))
    ode = np.asarray(W.integrate_vec(v, method="ode", nb_steps=8))
    np.testing.assert_allclose(ss, ode, atol=0.05)


def test_integrate_vec_ode_partial_time():
    v = jnp.asarray(smooth_field((10, 10), scale=0.5, nd=2))
    half = np.asarray(W.integrate_vec(v, method="ode", nb_steps=8, out_time_pt=0.5))
    full = np.asarray(W.integrate_vec(v, method="ode", nb_steps=8, out_time_pt=1.0))
    # integrating half as long gives roughly half the displacement
    np.testing.assert_allclose(half * 2, full, atol=0.05)


def test_integrate_vec_time_dependent_ss():
    # constant-in-time field must reduce to the stationary result
    v = jnp.asarray(smooth_field((10, 10), scale=0.8, nd=2))
    vt = jnp.repeat(v[None], 8, axis=0)  # 2**3 time steps
    td = np.asarray(W.integrate_vec(vt, method="ss", nb_steps=3, time_dep=True))
    st = np.asarray(W.integrate_vec(v, method="ss", nb_steps=3))
    np.testing.assert_allclose(td, st, atol=1e-4)


def test_integrate_vec_quadrature_time_dependent():
    v = jnp.asarray(smooth_field((10, 10), scale=0.5, nd=2))
    vt = jnp.repeat(v[None], 4, axis=0)
    td = np.asarray(W.integrate_vec(vt, method="quadrature", nb_steps=4, time_dep=True))
    st = np.asarray(W.integrate_vec(v, method="quadrature", nb_steps=4))
    np.testing.assert_allclose(td, st, atol=1e-4)
