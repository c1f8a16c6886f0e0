import numpy as np
import jax.numpy as jnp
import pytest

from voxelmorph_tpu.ops import interp as I
from np_reference import interpn_np


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("nd", [1, 2, 3])
@pytest.mark.parametrize("method", ["linear", "nearest"])
def test_interpn_matches_numpy(nd, method):
    spatial = [7, 6, 5][:nd]
    vol = RNG.normal(size=(*spatial, 2)).astype(np.float32)
    loc = RNG.uniform(-1.5, max(spatial) + 1.5, size=(4, 9, nd)).astype(np.float32)
    # avoid exact .5 rounding-mode mismatches for nearest
    if method == "nearest":
        loc = np.where(np.abs(loc - np.round(loc)) > 0.49, loc + 0.02, loc)
    got = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc), interp_method=method))
    want = interpn_np(vol, loc, method=method)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["linear", "nearest"])
def test_interpn_fill_value(method):
    vol = RNG.normal(size=(5, 5, 1)).astype(np.float32)
    loc = RNG.uniform(-3, 8, size=(50, 2)).astype(np.float32)
    if method == "nearest":
        loc = np.where(np.abs(loc - np.round(loc)) > 0.49, loc + 0.02, loc)
    got = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc),
                               interp_method=method, fill_value=-7.0))
    want = interpn_np(vol, loc, method=method, fill_value=-7.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_interpn_identity_grid():
    vol = RNG.normal(size=(8, 9, 10, 3)).astype(np.float32)
    grid = I.ndgrid((8, 9, 10))
    out = np.asarray(I.interpn(jnp.asarray(vol), grid))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_interpn_no_channel_axis():
    vol = RNG.normal(size=(6, 6)).astype(np.float32)
    loc = RNG.uniform(0, 5, size=(11, 2)).astype(np.float32)
    out = np.asarray(I.interpn(jnp.asarray(vol), jnp.asarray(loc)))
    want = interpn_np(vol[..., None], loc)[..., 0]
    assert out.shape == (11,)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_resize_round_trip_shapes():
    vol = RNG.normal(size=(8, 10, 12, 2)).astype(np.float32)
    down = I.resize(jnp.asarray(vol), 0.5)
    assert down.shape == (4, 5, 6, 2)
    up = I.resize(down, 2.0)
    assert up.shape == (8, 10, 12, 2)


def test_resize_constant_preserved():
    vol = jnp.full((6, 6, 1), 3.25)
    out = I.resize(vol, 2.0)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_resize_linear_against_coords():
    # resize by 2 samples at arange(2n)/2 = 0, .5, 1, ...
    vol = jnp.asarray(RNG.normal(size=(5, 4, 1)).astype(np.float32))
    out = np.asarray(I.resize(vol, 2.0))
    axes = [np.arange(10) / 2.0, np.arange(8) / 2.0]
    mesh = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
    want = interpn_np(np.asarray(vol), mesh)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
