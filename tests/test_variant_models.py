import numpy as np
import jax
import jax.numpy as jnp
import pytest

import voxelmorph_tpu as vxm
from voxelmorph_tpu.models import (
    ConditionalTemplateCreation, HyperVxmDense, MeanStream,
    ProbAtlasSegmentation, TemplateCreation,
    VxmDenseSemiSupervisedPointCloud, VxmDenseSemiSupervisedSeg)


RNG = np.random.default_rng(9)
SHAPE = (12, 12, 12)
TINY_UNET = [[4, 4], [4, 4]]


def test_semisupervised_seg():
    model = VxmDenseSemiSupervisedSeg(inshape=SHAPE, nb_labels=3, int_steps=2,
                                      nb_unet_features=TINY_UNET)
    src = jnp.zeros((1, *SHAPE, 1))
    trg = jnp.zeros((1, *SHAPE, 1))
    seg = jnp.zeros((1, 6, 6, 6, 3))
    params = model.init(jax.random.PRNGKey(0), src, trg, seg)["params"]
    out = model.apply({"params": params}, src, trg, seg)
    assert out["y_seg_source"].shape == (1, 6, 6, 6, 3)
    assert out["y_source"].shape == (1, *SHAPE, 1)


def test_semisupervised_seg_bidir_labels():
    model = VxmDenseSemiSupervisedSeg(inshape=SHAPE, nb_labels=2, int_steps=2,
                                      bidir_labels=True, nb_unet_features=TINY_UNET)
    src = jnp.zeros((1, *SHAPE, 1))
    trg = jnp.zeros((1, *SHAPE, 1))
    seg = jnp.zeros((1, 6, 6, 6, 2))
    params = model.init(jax.random.PRNGKey(0), src, trg, seg, seg)["params"]
    out = model.apply({"params": params}, src, trg, seg, seg)
    assert "y_seg_target" in out and "y_target" in out


def test_semisupervised_pointcloud():
    npts, nlabels = 10, 2
    model = VxmDenseSemiSupervisedPointCloud(
        inshape=SHAPE, nb_surface_points=npts, nb_labels_sample=nlabels,
        int_steps=2, nb_unet_features=TINY_UNET)
    src = jnp.zeros((1, *SHAPE, 1))
    trg = jnp.zeros((1, *SHAPE, 1))
    dt = jnp.asarray(RNG.normal(size=(1, *SHAPE, nlabels)).astype(np.float32))
    pts = jnp.asarray(RNG.uniform(1, 10, size=(1, npts, 4)).astype(np.float32))
    pts = pts.at[..., -1].set(0.0)  # label index channel
    params = model.init(jax.random.PRNGKey(0), src, trg, dt, dt, pts, pts)["params"]
    out = model.apply({"params": params}, src, trg, dt, dt, pts, pts)
    assert out["subj_dt_value"].shape == (1, npts, 1)
    assert out["atl_dt_value"].shape == (1, npts, 1)
    # values are |interpolated dt|: with near-zero flow, ~|dt at points|
    assert np.all(np.asarray(out["subj_dt_value"]) >= 0)


def test_mean_stream_updates():
    ms = MeanStream(cap=10)
    x1 = jnp.ones((2, 4, 4, 2))
    vars0 = ms.init(jax.random.PRNGKey(0), x1)
    out, vars1 = ms.apply(vars0, x1, train=True, mutable=["stream"])
    # after first batch: mean = 0 + (2/2)*(1-0) = 1
    np.testing.assert_allclose(np.asarray(vars1["stream"]["mean"]), 1.0, atol=1e-6)
    # output ramps in with min(1, count/cap): count=2, cap=10 -> 0.2 * mean
    np.testing.assert_allclose(np.asarray(out), 0.2, atol=1e-6)
    # feeding zeros moves the mean down by bs/count
    out2, vars2 = ms.apply({**vars1}, jnp.zeros_like(x1), train=True, mutable=["stream"])
    np.testing.assert_allclose(np.asarray(vars2["stream"]["mean"]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2), 0.4 * 0.5, atol=1e-6)
    # eval mode doesn't update
    out3, vars3 = ms.apply(vars2, x1, train=False, mutable=["stream"])
    np.testing.assert_allclose(np.asarray(vars3["stream"]["mean"]), 0.5, atol=1e-6)
    # once count reaches the cap the output equals the raw mean
    full = {"stream": {"mean": vars2["stream"]["mean"],
                       "count": jnp.asarray(10.0)}}
    out4, _ = ms.apply(full, x1, train=False, mutable=["stream"])
    np.testing.assert_allclose(np.asarray(out4), 0.5, atol=1e-6)


def test_template_creation():
    model = TemplateCreation(inshape=SHAPE, int_steps=2, nb_unet_features=TINY_UNET)
    src = jnp.asarray(RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), src)
    params, stream = variables["params"], variables["stream"]
    out, new_state = model.apply({"params": params, "stream": stream}, src,
                                 mutable=["stream"])
    assert out["y_source"].shape == (1, *SHAPE, 1)
    assert out["y_target"].shape == (1, *SHAPE, 1)
    assert out["mean_stream"].shape == (1, *SHAPE, 3)
    assert out["atlas"].shape == (1, *SHAPE, 1)
    # atlas setter/getter round trip
    new_atlas = RNG.normal(size=SHAPE).astype(np.float32)[..., None]
    params2 = TemplateCreation.set_atlas(params, new_atlas)
    np.testing.assert_allclose(TemplateCreation.get_atlas(params2),
                               new_atlas.squeeze(), atol=0)


def test_template_creation_trains_atlas():
    """The atlas param should receive gradients and move toward the scans."""
    import optax
    from voxelmorph_tpu.training import LossTerm, Trainer

    model = TemplateCreation(inshape=SHAPE, int_steps=0, int_resolution=1,
                             nb_unet_features=TINY_UNET)
    terms = [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=0.5, target_index=0),
        LossTerm("y_target", vxm.losses.MSE().loss, weight=0.5, target_index=0),
        LossTerm("mean_stream", vxm.losses.MSE().loss, weight=1.0,
                 target_index=1, name="mean_stream"),
        LossTerm("reg", vxm.losses.Grad("l2").loss, weight=0.01,
                 target_index=1, name="grad"),
    ]
    trainer = Trainer(model, terms, lr=1e-2)
    src = RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32) + 3.0
    zeros = np.zeros((1, *SHAPE, 3), np.float32)
    trainer.init((src,))
    a0 = np.asarray(trainer.params["atlas"]).copy()
    for _ in range(5):
        trainer.train_step((src,), (src, zeros))
    a1 = np.asarray(trainer.params["atlas"])
    assert np.abs(a1 - a0).max() > 1e-4  # atlas is learning
    # mean stream state updated
    assert float(trainer.state["stream"]["mean_stream"]["count"]) > 0


def test_conditional_template_creation():
    model = ConditionalTemplateCreation(
        inshape=SHAPE, pheno_input_shape=(2,), int_steps=2,
        nb_unet_features=TINY_UNET, conv_nb_features=4, extra_conv_layers=1)
    pheno = jnp.asarray([[0.5, 1.0]])
    atlas = jnp.zeros((1, *SHAPE, 1))
    src = jnp.zeros((1, *SHAPE, 1))
    variables = model.init(jax.random.PRNGKey(0), pheno, atlas, src)
    out, _ = model.apply(variables, pheno, atlas, src, mutable=["stream"])
    assert out["atlas_tensor"].shape == (1, *SHAPE, 1)
    assert out["mean_stream"].shape == (1, *SHAPE, 3)


def test_conditional_template_upsampling_decoder():
    # conv_nb_levels > 0: the ne.models.conv_dec branch (reference
    # tf/networks.py:913) — pheno decodes from inshape/2**levels up to inshape
    model = ConditionalTemplateCreation(
        inshape=SHAPE, pheno_input_shape=(2,), int_steps=2,
        nb_unet_features=TINY_UNET, conv_nb_features=4, conv_nb_levels=2,
        extra_conv_layers=1)
    pheno = jnp.asarray([[0.5, 1.0]])
    atlas = jnp.zeros((1, *SHAPE, 1))
    src = jnp.zeros((1, *SHAPE, 1))
    variables = model.init(jax.random.PRNGKey(0), pheno, atlas, src)
    # the pheno dense layer now maps to the SMALL image (3x3x3x4), not inshape
    dense_kernel = variables["params"]["pheno_dense"]["kernel"]
    assert dense_kernel.shape == (2, 3 * 3 * 3 * 4)
    out, _ = model.apply(variables, pheno, atlas, src, mutable=["stream"])
    assert out["atlas_tensor"].shape == (1, *SHAPE, 1)

    import pytest
    with pytest.raises(ValueError, match="upsampled"):
        bad = ConditionalTemplateCreation(
            inshape=(10, 10, 10), pheno_input_shape=(2,),
            conv_image_shape=(3, 3, 3), conv_nb_levels=2)
        bad.init(jax.random.PRNGKey(0), pheno,
                 jnp.zeros((1, 10, 10, 10, 1)), jnp.zeros((1, 10, 10, 10, 1)))


def test_prob_atlas_segmentation():
    nb_labels = 4
    model = ProbAtlasSegmentation(
        inshape=SHAPE, nb_labels=nb_labels, int_steps=2,
        nb_unet_features=TINY_UNET,
        init_mu=[0.1, 0.5, 0.8, 0.3], init_sigma=[0.2, 0.2, 0.3, 0.1])
    image = jnp.asarray(RNG.uniform(size=(1, *SHAPE, 1)).astype(np.float32))
    atlas = jax.nn.softmax(
        jnp.asarray(RNG.normal(size=(1, *SHAPE, nb_labels)).astype(np.float32)), -1)
    params = model.init(jax.random.PRNGKey(0), image, atlas)["params"]
    out = model.apply({"params": params}, image, atlas)
    assert out["loss_vol"].shape == (1, *SHAPE, 1)
    assert out["stat_mu"].shape == (1, 1, 1, 1, nb_labels)
    assert out["flow"].shape == (1, *SHAPE, 3)
    assert np.isfinite(np.asarray(out["loss_vol"])).all()
    # with network_stat_weight=1e-3 and weak init, stats ~ init values
    np.testing.assert_allclose(np.asarray(out["stat_mu"]).squeeze(),
                               [0.1, 0.5, 0.8, 0.3], atol=0.01)


def test_prob_atlas_supervised_softmax():
    model = ProbAtlasSegmentation(inshape=SHAPE, nb_labels=3, int_steps=0,
                                  int_resolution=1, nb_unet_features=TINY_UNET,
                                  supervised_model=True)
    image = jnp.asarray(RNG.uniform(size=(1, *SHAPE, 1)).astype(np.float32))
    atlas = jnp.full((1, *SHAPE, 3), 1 / 3)
    params = model.init(jax.random.PRNGKey(0), image, atlas)["params"]
    out = model.apply({"params": params}, image, atlas)
    assert out["loss_vol"].shape == (1, *SHAPE, 3)
    np.testing.assert_allclose(np.asarray(out["loss_vol"]).sum(-1), 1.0, atol=1e-5)


def test_hyper_vxm_dense():
    model = HyperVxmDense(inshape=SHAPE, int_steps=2, nb_unet_features=TINY_UNET,
                          nb_hyp_layers=2, nb_hyp_units=8)
    src = jnp.asarray(RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32))
    hyp = jnp.asarray([[0.5]])
    params = model.init(jax.random.PRNGKey(0), src, trg, hyp)["params"]
    out1 = model.apply({"params": params}, src, trg, jnp.asarray([[0.0]]))
    out2 = model.apply({"params": params}, src, trg, jnp.asarray([[1.0]]))
    assert out1["y_source"].shape == (1, *SHAPE, 1)
    assert not np.allclose(np.asarray(out1["pos_flow"]), np.asarray(out2["pos_flow"]))


def test_hyper_vxm_dense_inference_fns():
    # regression: HyperVxmDense checkpoints must drop into the inference
    # CLIs — build_register_fn/build_eval_register_fn construct the hyp
    # input themselves (round-1 advisor finding)
    from voxelmorph_tpu.registration import (build_eval_register_fn,
                                             build_register_fn)
    model = HyperVxmDense(inshape=SHAPE, int_steps=2, nb_unet_features=TINY_UNET,
                          nb_hyp_layers=2, nb_hyp_units=8)
    src = jnp.asarray(RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32))
    seg = jnp.asarray(RNG.integers(0, 3, size=(1, *SHAPE, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), src, trg, jnp.asarray([[0.5]]))["params"]

    moved, warp = build_register_fn(model, hyper=0.3)(params, src, trg)
    assert moved.shape == src.shape and warp.shape == (1, *SHAPE, 3)

    moved2, warp2, moved_seg = build_eval_register_fn(model, hyper=0.3)(
        params, src, trg, seg)
    np.testing.assert_allclose(np.asarray(warp), np.asarray(warp2), atol=1e-6)
    assert set(np.unique(np.asarray(moved_seg))) <= set(np.unique(np.asarray(seg)))

    # different hyper values must change the field (the hypernetwork is live)
    _, warp_hi = build_register_fn(model, hyper=1.0)(params, src, trg)
    assert not np.allclose(np.asarray(warp), np.asarray(warp_hi))
