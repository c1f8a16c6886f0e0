import math

import numpy as np
import jax.numpy as jnp

import voxelmorph_tpu.losses as L
from np_reference import window_sum_np


RNG = np.random.default_rng(3)


def ncc_np(I, J, win, eps=1e-5):
    """Direct numpy port of the reference NCC formula (tf/losses.py:41-96)."""
    in_ch = I.shape[-1]
    I_sum = window_sum_np(I.sum(-1, keepdims=True), win)
    J_sum = window_sum_np(J.sum(-1, keepdims=True), win)
    I2_sum = window_sum_np((I * I).sum(-1, keepdims=True), win)
    J2_sum = window_sum_np((J * J).sum(-1, keepdims=True), win)
    IJ_sum = window_sum_np((I * J).sum(-1, keepdims=True), win)
    win_size = math.prod(win) * in_ch
    u_I = I_sum / win_size
    u_J = J_sum / win_size
    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * win_size
    cross = np.maximum(cross, eps)
    I_var = np.maximum(I2_sum - 2 * u_I * I_sum + u_I * u_I * win_size, eps)
    J_var = np.maximum(J2_sum - 2 * u_J * J_sum + u_J * u_J * win_size, eps)
    return (cross / I_var) * (cross / J_var)


def test_window_sum_matches_numpy():
    x = RNG.normal(size=(2, 10, 11, 1)).astype(np.float32)
    got = np.asarray(L._window_sum(jnp.asarray(x), [5, 3]))
    want = window_sum_np(x, [5, 3])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_window_sum_3d():
    x = RNG.normal(size=(1, 6, 7, 8, 1)).astype(np.float32)
    got = np.asarray(L._window_sum(jnp.asarray(x), [3, 3, 3]))
    want = window_sum_np(x, [3, 3, 3])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ncc_matches_reference_formula():
    I = RNG.normal(size=(2, 12, 12, 12, 1)).astype(np.float32)
    J = (I + 0.3 * RNG.normal(size=I.shape)).astype(np.float32)
    got = np.asarray(L.NCC(win=5).ncc(jnp.asarray(I), jnp.asarray(J)))
    want = ncc_np(I, J, [5, 5, 5])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_ncc_perfect_match_is_minus_one():
    I = RNG.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    loss = float(L.NCC().loss(jnp.asarray(I), jnp.asarray(I))[0])
    assert loss < -0.95


def test_ncc_multichannel():
    I = RNG.normal(size=(1, 10, 10, 2)).astype(np.float32)
    J = RNG.normal(size=(1, 10, 10, 2)).astype(np.float32)
    got = np.asarray(L.NCC(win=3).ncc(jnp.asarray(I), jnp.asarray(J)))
    want = ncc_np(I, J, [3, 3])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mse():
    a = jnp.zeros((1, 4, 4, 1))
    b = jnp.full((1, 4, 4, 1), 2.0)
    assert float(L.MSE().loss(a, b)) == 4.0
    assert abs(float(L.MSE(image_sigma=0.5).loss(a, b)) - 16.0) < 1e-5


def test_tukey_biweight():
    a = jnp.zeros((1, 4, 1))
    b = jnp.full((1, 4, 1), 10.0)  # all above threshold
    c = 0.5
    got = float(L.TukeyBiweight(c=c).loss(a, b))
    assert abs(got - c * c / 2) < 1e-6
    # zero error -> zero loss
    assert abs(float(L.TukeyBiweight(c=c).loss(a, a))) < 1e-8


def test_dice_loss():
    y = np.zeros((1, 4, 4, 2), np.float32)
    y[..., 0] = 1.0
    assert abs(float(L.Dice().loss(jnp.asarray(y), jnp.asarray(y))) + 0.5) < 1e-6
    # (label 1 has empty masks -> dice 0 there; mean of (1, 0) = 0.5)


def test_grad_loss_values():
    # linear ramp along axis 0: |diff| = 1 everywhere along that axis
    x = np.arange(5, dtype=np.float32).reshape(1, 5, 1, 1).repeat(5, axis=2)
    g1 = np.asarray(L.Grad("l1").loss(None, jnp.asarray(x)))
    np.testing.assert_allclose(g1, [0.5], atol=1e-5)  # (1 + 0)/2 axes
    g2 = np.asarray(L.Grad("l2").loss(None, jnp.asarray(x)))
    np.testing.assert_allclose(g2, [0.5], atol=1e-5)
    g2m = np.asarray(L.Grad("l2", loss_mult=2.0).loss(None, jnp.asarray(x)))
    np.testing.assert_allclose(g2m, [1.0], atol=1e-5)


def test_degree_matrix():
    D = np.asarray(L._degree_matrix((3, 3)))
    assert D.shape == (1, 3, 3, 2)
    # corner: 1+1, edge mid: 1+2, center: 2+2
    assert D[0, 0, 0, 0] == 2
    assert D[0, 0, 1, 0] == 3
    assert D[0, 1, 1, 0] == 4


def test_kl_loss_finite_and_positive_lambda():
    shape = (6, 6, 6)
    kl = L.KL(prior_lambda=25, flow_vol_shape=shape)
    y_pred = jnp.asarray(RNG.normal(size=(2, *shape, 6)).astype(np.float32) * 0.1)
    val = float(kl.loss(None, y_pred))
    assert np.isfinite(val)


def test_mutual_information_self_vs_noise():
    x = jnp.asarray(RNG.uniform(size=(1, 12, 12, 12, 1)).astype(np.float32))
    y = jnp.asarray(RNG.uniform(size=(1, 12, 12, 12, 1)).astype(np.float32))
    mi = L.MutualInformation()
    self_mi = float(mi.volumes(x, x)[0])
    cross_mi = float(mi.volumes(x, y)[0])
    assert self_mi > cross_mi
    assert float(mi.loss(x, x)[0]) == -self_mi
