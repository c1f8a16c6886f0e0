import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelmorph_tpu.ops.image import barycenter, draw_multiscale_noise, gaussian_blur, sqrtm
from voxelmorph_tpu.models import (HyperVxmJoint, LabelsToImageConfig,
                                   VxmAffineFeatureDetector, labels_to_image)
from voxelmorph_tpu.ops import affine as A
from voxelmorph_tpu.ops import warp as W


RNG = np.random.default_rng(11)
SHAPE = (16, 16)
SHAPE3 = (16, 16, 16)


# ------------------------------------------------------------- image ops

def test_gaussian_blur_reduces_variance():
    x = jnp.asarray(RNG.normal(size=(12, 12, 1)).astype(np.float32))
    y = gaussian_blur(x, 2.0)
    assert float(jnp.std(y)) < float(jnp.std(x))
    assert abs(float(jnp.mean(y)) - float(jnp.mean(x))) < 0.1


def test_gaussian_blur_zero_sigma_identity():
    x = jnp.asarray(RNG.normal(size=(8, 8, 1)).astype(np.float32))
    y = gaussian_blur(x, 0.0, max_sigma=2.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_draw_multiscale_noise_smoothness():
    key = jax.random.PRNGKey(0)
    field = draw_multiscale_noise(key, (32, 32), scales=[16], max_std=1.0,
                                  nb_channels=2)
    assert field.shape == (32, 32, 2)
    f = np.asarray(field)
    # coarse-scale noise should be smooth: neighbor diffs << value range
    diffs = np.abs(np.diff(f, axis=0)).mean()
    rng_span = f.max() - f.min() + 1e-8
    assert diffs / rng_span < 0.2


def test_barycenter_point_mass():
    feat = np.zeros((1, 9, 9, 2), np.float32)
    feat[0, 2, 3, 0] = 1.0
    feat[0, 6, 8, 1] = 1.0
    bc = np.asarray(barycenter(jnp.asarray(feat)))  # normalized, centered
    # channel 0 at (2,3): centered = (2-4, 3-4) = (-2,-1); /9
    np.testing.assert_allclose(bc[0, 0], [-2 / 9, -1 / 9], atol=1e-5)
    np.testing.assert_allclose(bc[0, 1], [2 / 9, 4 / 9], atol=1e-5)


def test_sqrtm():
    mat = np.asarray(A.params_to_affine_matrix(
        jnp.asarray([2.0, -1.0, 0.5, 10.0, 5.0, -8.0]), last_row=True))
    root = np.asarray(sqrtm(jnp.asarray(mat)))
    np.testing.assert_allclose(root @ root, mat, atol=1e-4)


# ------------------------------------------------------------- synthesis

def _cfg(**kw):
    defaults = dict(in_shape=SHAPE3, in_label_list=[0, 1, 2, 3],
                    warp_std=0.5, warp_res=[8], blur_std=1.0,
                    bias_std=0.3, bias_res=[8], gamma_std=0.25)
    defaults.update(kw)
    return LabelsToImageConfig(**defaults)


def _label_maps(n=2):
    return jnp.asarray(RNG.integers(0, 4, size=(n, *SHAPE3, 1)).astype(np.int32))


def test_labels_to_image_shapes_and_range():
    cfg = _cfg()
    image, one_hot = labels_to_image(jax.random.PRNGKey(0), _label_maps(), cfg)
    assert image.shape == (2, *SHAPE3, 1)
    assert one_hot.shape == (2, *SHAPE3, 4)
    img = np.asarray(image)
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-5
    oh = np.asarray(one_hot)
    np.testing.assert_allclose(oh.sum(-1), 1.0, atol=1e-5)  # valid one-hot


def test_labels_to_image_out_labels_subset():
    cfg = _cfg(out_label_list=[1, 3])
    _, one_hot = labels_to_image(jax.random.PRNGKey(1), _label_maps(), cfg)
    assert one_hot.shape[-1] == 2


def test_labels_to_image_randomness_and_jit():
    cfg = _cfg()
    maps = _label_maps(1)
    f = jax.jit(lambda k: labels_to_image(k, maps, cfg))
    im1, _ = f(jax.random.PRNGKey(0))
    im2, _ = f(jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(im1), np.asarray(im2))
    im1b, _ = f(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(im1), np.asarray(im1b), atol=0)


def test_labels_to_image_out_shape_pad():
    cfg = _cfg(out_shape=(20, 20, 20))
    image, one_hot = labels_to_image(jax.random.PRNGKey(0), _label_maps(1), cfg)
    assert image.shape == (1, 20, 20, 20, 1)
    assert one_hot.shape == (1, 20, 20, 20, 4)


# ------------------------------------------------------------- affine detector

def _detector(**kw):
    args = dict(in_shape=SHAPE, num_feat=4, enc_nf=(4, 4), add_nf=(4,),
                half_res=False, make_dense=False)
    args.update(kw)
    return VxmAffineFeatureDetector(**args)


def test_affine_detector_identity_pair():
    model = _detector()
    im = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), im, im)["params"]
    out = model.apply({"params": params}, im, im)
    aff = np.asarray(out["aff_1"])
    # same image both sides -> symmetric fit must be ~identity
    np.testing.assert_allclose(aff[0], np.eye(2, 3), atol=1e-2)


def test_affine_detector_consistency():
    # aff_1 and aff_2 must be exact inverses
    model = _detector()
    im1 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    im2 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), im1, im2)["params"]
    out = model.apply({"params": params}, im1, im2)
    m1 = np.asarray(A.make_square_affine(out["aff_1"][0]))
    m2 = np.asarray(A.make_square_affine(out["aff_2"][0]))
    np.testing.assert_allclose(m1 @ m2, np.eye(3), atol=1e-3)


def test_affine_detector_dense_and_moved():
    model = _detector(make_dense=True, return_moved=True, half_res=True,
                      in_shape=SHAPE)
    im = jnp.asarray(RNG.random((2, *SHAPE, 1), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), im, im)["params"]
    out = model.apply({"params": params}, im, im)
    assert out["dense_1"].shape == (2, *SHAPE, 2)
    assert out["moved_1"].shape == (2, *SHAPE, 1)


def test_affine_detector_rigid():
    model = _detector(rigid=True)
    im1 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    im2 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), im1, im2)["params"]
    out = model.apply({"params": params}, im1, im2)
    lin = np.asarray(out["aff_1"])[0, :, :2]
    # rigid: linear part orthogonal
    np.testing.assert_allclose(lin.T @ lin, np.eye(2), atol=1e-3)


def test_affine_detector_mid_space():
    model = _detector(return_trans_to_mid_space=True)
    im1 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    im2 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), im1, im2)["params"]
    out = model.apply({"params": params}, im1, im2)
    assert np.isfinite(np.asarray(out["aff_1"])).all()


# ------------------------------------------------------------- joint model

def test_hyper_vxm_joint_smoke():
    model = HyperVxmJoint(in_shape=SHAPE, int_steps=2,
                          hyp_units=(4,), enc_nf=(4, 4), dec_nf=(4, 4),
                          add_nf=(4,), aff_num_feat=4, aff_enc_nf=(4, 4))
    im1 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    im2 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    hyp = jnp.asarray([[0.5]])
    params = model.init(jax.random.PRNGKey(0), hyp, im1, im2)["params"]
    out = model.apply({"params": params}, hyp, im1, im2)
    # full-res total warp by default
    assert out["tot_1"].shape == (1, *SHAPE, 2)
    assert out["svf_1"].shape == (1, 8, 8, 2)
    # symmetrized SVF: svf_2 == -svf_1
    np.testing.assert_allclose(np.asarray(out["svf_2"]),
                               -np.asarray(out["svf_1"]), atol=0)
    assert np.isfinite(np.asarray(out["tot_1"])).all()


def test_hyper_vxm_joint_half_res_output():
    model = HyperVxmJoint(in_shape=SHAPE, int_steps=1,
                          return_trans_to_half_res=True, return_moved=True,
                          hyp_units=(4,), enc_nf=(4,), dec_nf=(4,),
                          add_nf=(4,), aff_num_feat=4, aff_enc_nf=(4,))
    im1 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    im2 = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float32))
    hyp = jnp.asarray([[0.5]])
    params = model.init(jax.random.PRNGKey(0), hyp, im1, im2)["params"]
    out = model.apply({"params": params}, hyp, im1, im2)
    assert out["tot_1"].shape == (1, 8, 8, 2)
    assert out["moved_1"].shape == (1, 8, 8, 1)


def test_labels_to_image_return_warp_inverse():
    # exp(svf) o exp(-svf) ~ id: composing the returned warp with its
    # inverse must nearly cancel
    cfg = _cfg()
    maps = _label_maps(1)
    _, _, warp, inv_warp = labels_to_image(
        jax.random.PRNGKey(3), maps, cfg, return_warp=True)
    assert warp.shape == (1, *SHAPE3, 3) and inv_warp.shape == warp.shape
    comp = warp[0] + W.transform(inv_warp[0], warp[0], window_halo=None)
    # interior only (edge clamping pollutes the boundary shell)
    assert float(jnp.max(jnp.abs(comp[2:-2, 2:-2, 2:-2]))) < 0.05


def test_synthmorph_gt_flow_aligns_same_subject_pair():
    # For a same-subject pair the emitted gt_flow must warp map_1 onto
    # map_2 (up to interpolation softness)
    from voxelmorph_tpu.models import SynthMorphDense

    cfg = _cfg(warp_std=1.0)
    maps = _label_maps(1)
    model = SynthMorphDense(cfg=cfg, nb_unet_features=([4], [4, 4]),
                            int_steps=2, sup_flow=True)
    key = jax.random.PRNGKey(0)
    out = model.init_with_output({'params': key, 'synth': key}, maps, maps)[0]
    assert out['gt_flow'].shape == (1, *SHAPE3, 3)
    aligned = W.transform_batched(out['map_1'], out['gt_flow'],
                                  window_halo=None)
    err_gt = float(jnp.mean(jnp.abs(aligned - out['map_2'])))
    err_id = float(jnp.mean(jnp.abs(out['map_1'] - out['map_2'])))
    assert err_gt < 0.5 * err_id  # gt flow explains most of the misalignment
    assert err_gt < 0.03


def test_shared_contrast_intensity_key():
    # same intensity_key => same per-label GMM draw: the two images agree
    # up to noise/warp; different keys give different contrasts
    cfg = _cfg(warp_std=0.0, blur_std=0.0, bias_std=0.0, gamma_std=0.0,
               std_range=(0.0, 0.0), zero_background=0.0)
    maps = _label_maps(1)
    ik = jax.random.PRNGKey(7)
    im_a, _ = labels_to_image(jax.random.PRNGKey(1), maps, cfg,
                              intensity_key=ik)
    im_b, _ = labels_to_image(jax.random.PRNGKey(2), maps, cfg,
                              intensity_key=ik)
    im_c, _ = labels_to_image(jax.random.PRNGKey(2), maps, cfg,
                              intensity_key=jax.random.PRNGKey(8))
    np.testing.assert_allclose(np.asarray(im_a), np.asarray(im_b), atol=1e-5)
    assert float(jnp.mean(jnp.abs(im_b - im_c))) > 0.01


def test_synthmorph_shared_contrast_smoke():
    from voxelmorph_tpu.models import SynthMorphDense
    cfg = _cfg()
    maps = _label_maps(1)
    model = SynthMorphDense(cfg=cfg, nb_unet_features=([4], [4, 4]),
                            int_steps=1, shared_contrast=1.0)
    key = jax.random.PRNGKey(0)
    out = model.init_with_output({'params': key, 'synth': key}, maps, maps)[0]
    assert out['y_source'].shape == (1, *SHAPE3, 1)


def test_labels_to_image_onehot_fallback_matches_fused():
    """VXM_FUSED_ONEHOT_MAX_VOX gates the fused label/one-hot warp; the
    materialized-pack fallback must produce identical synthesis outputs."""
    import os
    import jax
    from voxelmorph_tpu.models.synthmorph import (LabelsToImageConfig,
                                                  labels_to_image)

    rng = np.random.default_rng(3)
    shape = (10, 12, 14)
    labs = rng.integers(0, 4, size=(1, *shape, 1)).astype(np.int32)
    cfg = LabelsToImageConfig(shape, [0, 1, 2, 3])
    key = jax.random.PRNGKey(7)
    img_f, oh_f = labels_to_image(key, jnp.asarray(labs), cfg)[:2]
    os.environ["VXM_FUSED_ONEHOT_MAX_VOX"] = "1"
    try:
        img_m, oh_m = labels_to_image(key, jnp.asarray(labs), cfg)[:2]
    finally:
        del os.environ["VXM_FUSED_ONEHOT_MAX_VOX"]
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oh_f), np.asarray(oh_m),
                               rtol=1e-5, atol=1e-5)
