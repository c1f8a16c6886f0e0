"""Trainer-level behaviors: determinism, resume, metrics CSV, prefetch."""

import os

import numpy as np
import jax
import pytest

import voxelmorph_tpu as vxm
from voxelmorph_tpu.models import VxmDense
from voxelmorph_tpu.training import LossTerm, MetricsLogger, Trainer, prefetch


RNG = np.random.default_rng(21)
SHAPE = (8, 8, 8)


def _terms():
    return [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=1.0, target_index=0),
        LossTerm("reg", vxm.losses.Grad("l2").loss, weight=0.01,
                 target_index=1, name="grad"),
    ]


def _batch():
    src = RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32)
    trg = RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32)
    zeros = np.zeros((1, *SHAPE, 3), np.float32)
    return (src, trg), (trg, zeros)


def _model():
    return VxmDense(inshape=SHAPE, int_steps=1, nb_unet_features=[[4], [4, 4]])


def test_training_is_deterministic():
    """Same seed + same data stream -> bitwise identical params."""
    inputs, targets = _batch()
    results = []
    for _ in range(2):
        t = Trainer(_model(), _terms(), lr=1e-3, seed=42)
        t.init(inputs)
        for _ in range(3):
            t.train_step(inputs, targets)
        results.append(jax.device_get(t.params))
    for a, b in zip(jax.tree_util.tree_leaves(results[0]),
                    jax.tree_util.tree_leaves(results[1])):
        np.testing.assert_array_equal(a, b)


def test_probabilistic_rng_varies_per_step():
    model = VxmDense(inshape=SHAPE, int_steps=1, use_probs=True,
                     nb_unet_features=[[4], [4, 4]])
    inputs, targets = _batch()
    t = Trainer(model, _terms(), lr=0.0, needs_sample_rng=True)  # lr 0: params frozen
    t.init(inputs)
    m1 = float(t.train_step(inputs, targets)["loss"])
    m2 = float(t.train_step(inputs, targets)["loss"])
    # same data, frozen params, different sample rng -> different loss
    assert m1 != m2


def test_save_resume_continues(tmp_path):
    inputs, targets = _batch()
    t = Trainer(_model(), _terms(), lr=1e-3, seed=1)
    t.init(inputs)
    t.train_step(inputs, targets)
    path = str(tmp_path / "ckpt.npz")
    t.save(path)

    t2 = Trainer(_model(), _terms(), lr=1e-3, seed=1)
    t2.load(path)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(t.params)),
                    jax.tree_util.tree_leaves(jax.device_get(t2.params))):
        np.testing.assert_allclose(a, b, atol=0)
    # resumed trainer can keep stepping
    m = t2.train_step(inputs, targets)
    assert np.isfinite(float(m["loss"]))


def _batches(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        src = rng.normal(size=(1, *SHAPE, 1)).astype(np.float32)
        trg = rng.normal(size=(1, *SHAPE, 1)).astype(np.float32)
        zeros = np.zeros((1, *SHAPE, 3), np.float32)
        out.append(((src, trg), (trg, zeros)))
    return out


def test_resume_reproduces_uninterrupted(tmp_path):
    """Interrupt/resume must be invisible: params, Adam moments, step counter
    and the rng stream all round-trip, so the resumed run's metrics are
    bitwise identical to an uninterrupted one (probabilistic model, so the
    per-step sample rng is exercised too)."""
    def make_model():
        return VxmDense(inshape=SHAPE, int_steps=1, use_probs=True,
                        nb_unet_features=[[4], [4, 4]])

    batches = _batches(4, seed=5)

    ref = Trainer(make_model(), _terms(), lr=1e-3, seed=7, needs_sample_rng=True)
    ref.init(batches[0][0])
    ref_metrics = [ref.train_step(*b) for b in batches]

    t1 = Trainer(make_model(), _terms(), lr=1e-3, seed=7, needs_sample_rng=True)
    t1.init(batches[0][0])
    for b in batches[:2]:
        t1.train_step(*b)
    path = str(tmp_path / "mid.npz")
    t1.save(path)

    # different constructor seed: everything must come from the checkpoint
    t2 = Trainer(make_model(), _terms(), lr=1e-3, seed=999, needs_sample_rng=True)
    t2.load(path)
    assert t2.global_step == 2
    resumed = [t2.train_step(*b) for b in batches[2:]]

    for m_ref, m_res in zip(ref_metrics[2:], resumed):
        assert float(m_ref["loss"]) == float(m_res["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ref.params)),
                    jax.tree_util.tree_leaves(jax.device_get(t2.params))):
        np.testing.assert_array_equal(a, b)


def test_resume_restores_stream_state(tmp_path):
    """Mutable variable collections (MeanStream 'stream') must survive
    save/load — resuming TemplateCreation used to crash without this."""
    from voxelmorph_tpu.models import TemplateCreation

    model = TemplateCreation(inshape=SHAPE, int_steps=0, int_resolution=1,
                             nb_unet_features=[[4], [4, 4]])
    terms = [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=0.5, target_index=0),
        LossTerm("mean_stream", vxm.losses.MSE().loss, weight=1.0,
                 target_index=1, name="mean_stream"),
    ]
    src = RNG.normal(size=(1, *SHAPE, 1)).astype(np.float32)
    zeros = np.zeros((1, *SHAPE, 3), np.float32)

    t = Trainer(model, terms, lr=1e-3, seed=3)
    t.init((src,))
    for _ in range(2):
        t.train_step((src,), (src, zeros))
    saved_state = jax.device_get(t.state)
    assert float(saved_state["stream"]["mean_stream"]["count"]) == 2
    path = str(tmp_path / "tmpl.npz")
    t.save(path)

    t2 = Trainer(model, terms, lr=1e-3, seed=3)
    t2.load(path)
    for a, b in zip(jax.tree_util.tree_leaves(saved_state),
                    jax.tree_util.tree_leaves(jax.device_get(t2.state))):
        np.testing.assert_array_equal(a, b)
    # training continues from the restored stream count (2 + 1 = 3)
    t2.train_step((src,), (src, zeros))
    assert float(jax.device_get(
        t2.state["stream"]["mean_stream"]["count"])) == 3


def test_synthmorph_checkpoint_roundtrip(tmp_path):
    """SynthMorphDense checkpoints are self-describing: the nested
    LabelsToImageConfig serializes to real JSON and load_model rebuilds a
    model whose outputs match the original."""
    from voxelmorph_tpu.models import (LabelsToImageConfig, SynthMorphDense,
                                       load_model, save_model)

    cfg = LabelsToImageConfig(in_shape=SHAPE, in_label_list=[0, 1, 2],
                              warp_res=[8], bias_res=[8], warp_int_steps=2)
    model = SynthMorphDense(cfg=cfg, nb_unet_features=[[4], [4, 4]],
                            int_steps=1)
    maps = RNG.integers(0, 3, size=(1, *SHAPE, 1)).astype(np.int32)
    src, trg = jax.numpy.asarray(maps), jax.numpy.asarray(maps)
    rngs = {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}
    params = model.init(rngs, src, trg)["params"]
    out = model.apply({"params": params}, src, trg, train=False)

    path = str(tmp_path / "synth.npz")
    save_model(path, model, jax.device_get(params))
    model2, params2 = load_model(path)
    assert isinstance(model2.cfg, LabelsToImageConfig)
    assert model2.cfg.to_dict() == cfg.to_dict()
    out2 = model2.apply({"params": params2}, src, trg, train=False)
    np.testing.assert_allclose(np.asarray(out["y_source"]),
                               np.asarray(out2["y_source"]), atol=1e-6)


def test_async_save_atomic_and_identical(tmp_path):
    """A background save writes the same complete checkpoint as a blocking
    one (params, opt state, step, rng) and leaves no partial tmp files —
    the preemption-safety contract of the async checkpoint path."""
    from voxelmorph_tpu.models import modelio

    trainer = Trainer(_model(), _terms(), lr=1e-3, seed=7)
    inputs, targets = _batch()
    trainer.init(inputs)
    trainer.train_step(inputs, targets)

    sync_path = str(tmp_path / "sync.npz")
    async_path = str(tmp_path / "async.npz")
    trainer.save(sync_path)
    trainer.save(async_path, wait=False)
    trainer.wait_for_saves()

    assert not list(tmp_path.glob("*.tmp.npz"))
    _, p1, e1 = modelio.load_model(sync_path, with_extra=True)
    _, p2, e2 = modelio.load_model(async_path, with_extra=True)
    for a, b in zip(jax.tree_util.tree_leaves((p1, e1)),
                    jax.tree_util.tree_leaves((p2, e2))):
        np.testing.assert_array_equal(a, b)


def test_async_save_failure_surfaces(tmp_path):
    """A failed background write must raise at the next join, not vanish."""
    trainer = Trainer(_model(), _terms(), lr=1e-3, seed=7)
    inputs, targets = _batch()
    trainer.init(inputs)
    trainer.save(str(tmp_path / "no-such-dir" / "x.npz"), wait=False)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        trainer.wait_for_saves()
    # the error is consumed; subsequent saves work again
    trainer.save(str(tmp_path / "ok.npz"))


def test_synthmorph_registration_extraction(tmp_path):
    """A trained SynthMorphDense checkpoint yields a standalone registration
    net for acquired images: extracted params drop into a VxmDense whose
    param structure init would produce, and registering a real-image pair
    returns a finite warp of the right shape."""
    import jax.numpy as jnp
    from voxelmorph_tpu.models import (LabelsToImageConfig, SynthMorphDense,
                                       load_model, save_model)
    from voxelmorph_tpu.models.synthmorph import registration_model

    cfg = LabelsToImageConfig(in_shape=SHAPE, in_label_list=[0, 1, 2],
                              warp_res=[8], bias_res=[8], warp_int_steps=2)
    model = SynthMorphDense(cfg=cfg, nb_unet_features=[[4], [4, 4]],
                            int_steps=1)
    maps = RNG.integers(0, 3, size=(1, *SHAPE, 1)).astype(np.int32)
    src = jax.numpy.asarray(maps)
    rngs = {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}
    params = model.init(rngs, src, src)["params"]
    path = str(tmp_path / "synth.npz")
    save_model(path, model, jax.device_get(params))

    model2, params2 = load_model(path)
    net, net_params = registration_model(model2, params2)
    mov = jnp.asarray(RNG.random((1, *SHAPE, 1)), jnp.float32)
    fix = jnp.asarray(RNG.random((1, *SHAPE, 1)), jnp.float32)
    ref_structure = jax.tree_util.tree_structure(
        net.init(jax.random.PRNGKey(0), mov, fix)["params"])
    assert jax.tree_util.tree_structure(net_params) == ref_structure
    out = net.apply({"params": net_params}, mov, fix, train=False)
    assert out["pos_flow"].shape == (1, *SHAPE, len(SHAPE))
    assert np.isfinite(np.asarray(out["y_source"])).all()


def test_metrics_csv(tmp_path):
    path = str(tmp_path / "metrics.csv")
    logger = MetricsLogger(path)
    logger.log(1, {"loss": 0.5, "grad": 0.1}, 2.0)
    logger.log(2, {"loss": 0.4, "grad": 0.2}, 1.9)
    logger.close()
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "epoch,wall_s,grad,loss"
    assert lines[1].startswith("1,2.0,0.1,0.5")
    assert len(lines) == 3


def test_fit_writes_metrics_csv(tmp_path):
    inputs, targets = _batch()

    def gen():
        while True:
            yield inputs, targets

    t = Trainer(_model(), _terms(), lr=1e-3)
    t.fit(gen(), epochs=2, steps_per_epoch=2, model_dir=str(tmp_path),
          save_freq_epochs=1, log_fn=lambda s: None)
    assert os.path.isfile(str(tmp_path / "metrics.csv"))
    assert os.path.isfile(str(tmp_path / "0002.npz"))


def test_prefetch_preserves_order_and_values():
    items = [({"a": i}, i * 2) for i in range(5)]
    out = list(prefetch(iter(items), size=2))
    assert out == items


def test_find_latest_checkpoint(tmp_path):
    from voxelmorph_tpu.training import find_latest_checkpoint
    assert find_latest_checkpoint(str(tmp_path / "missing")) == (None, 0)
    for e in (0, 20, 40):
        (tmp_path / f"{e:04d}.npz").write_bytes(b"x")
    (tmp_path / "notes.txt").write_bytes(b"x")
    path, epoch = find_latest_checkpoint(str(tmp_path))
    assert epoch == 40 and path.endswith("0040.npz")


def test_device_cached_pair_generator_replays_on_resume(tmp_path):
    """Stateless sampling: a generator started at step k reproduces the
    batches the uninterrupted stream yields from step k — the resume
    guarantee of --cache-device."""
    from voxelmorph_tpu.training import device_cached_pair_generator

    files = []
    for i in range(3):
        path = str(tmp_path / f"v{i}.npz")
        np.savez(path, vol=RNG.random(SHAPE).astype(np.float32))
        files.append(path)

    g0 = device_cached_pair_generator(files, seed=5)
    batches = [next(g0) for _ in range(4)]
    g2 = device_cached_pair_generator(files, seed=5, start_step=2)
    for expect in batches[2:]:
        got = next(g2)
        for a, b in zip(jax.tree_util.tree_leaves(expect),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_cached_label_generator_contract():
    """Same tuple contract as generators.synthmorph: int label-map pairs +
    void targets, device-resident, resume-replayable."""
    from voxelmorph_tpu.training import device_cached_label_generator

    maps = [RNG.integers(0, 4, size=SHAPE).astype(np.int32) for _ in range(3)]
    g = device_cached_label_generator(maps, seed=3)
    (src, trg), voids = next(g)
    assert src.shape == (1, *SHAPE, 1) and trg.shape == (1, *SHAPE, 1)
    assert np.asarray(src).dtype == np.int32
    assert len(voids) == 2 and voids[0].shape == (1, *SHAPE, len(SHAPE))
    # every sampled map is one of the population's (possibly axis-flipped)
    flat = sorted(np.asarray(src).ravel().tolist())
    assert any(sorted(m.ravel().tolist()) == flat for m in maps)

    g1 = device_cached_label_generator(maps, seed=3, start_step=1)
    (s2, t2), _ = next(g)  # step 1 of the original stream
    (s3, t3), _ = next(g1)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s3))
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t3))


def test_same_subj_label_generator():
    from voxelmorph_tpu.training import device_cached_label_generator

    maps = [RNG.integers(0, 4, size=SHAPE).astype(np.int32) for _ in range(4)]
    g = device_cached_label_generator(maps, same_subj=True, flip=False, seed=1)
    (src, trg), _ = next(g)
    np.testing.assert_array_equal(np.asarray(src), np.asarray(trg))


def test_device_cached_semisupervised_generator(tmp_path):
    """HBM-resident semisupervised stream: volumes + one-hot downsampled segs
    match what generators.semisupervised produces from the same files."""
    from voxelmorph_tpu.training import device_cached_semisupervised_generator

    files = []
    for i in range(3):
        path = str(tmp_path / f"v{i}.npz")
        np.savez(path, vol=RNG.random(SHAPE).astype(np.float32),
                 seg=RNG.integers(0, 3, size=SHAPE).astype(np.int32))
        files.append(path)
    labels = np.array([1, 2])

    g = device_cached_semisupervised_generator(files, labels, seed=4)
    (src, trg, src_seg), (t0, flow, trg_seg) = next(g)
    half = tuple(s // 2 for s in SHAPE)
    assert src.shape == (1, *SHAPE, 1)
    assert src_seg.shape == (1, *half, 2)
    assert flow.shape == (1, *SHAPE, len(SHAPE))
    np.testing.assert_array_equal(np.asarray(trg), np.asarray(t0))
    # one-hot correctness: channels sum to 1 exactly where seg is in labels
    s = np.asarray(src_seg)
    assert set(np.unique(s)) <= {0.0, 1.0}
    # find which file src came from and verify the encoding
    vols = [np.load(f)["vol"] for f in files]
    idx = next(i for i, v in enumerate(vols)
               if np.allclose(v, np.asarray(src)[0, ..., 0]))
    seg = np.load(files[idx])["seg"][::2, ::2, ::2]
    np.testing.assert_array_equal(
        s[0].argmax(-1) * s[0].max(-1) + 1 * 0,  # argmax only where any label
        np.where(np.isin(seg, labels), np.searchsorted(labels, seg), 0))


def test_async_save_survives_buffer_donation(tmp_path):
    """The train step donates params/state/opt_state buffers; a background
    save that kept the live references would crash (deleted arrays) once the
    next step runs. The writer must snapshot device copies: stepping
    immediately after save(wait=False) still yields a loadable checkpoint
    holding the PRE-step values. (Regression: epoch-25 checkpoint of a live
    run was silently lost this way.)"""
    from voxelmorph_tpu.models import modelio

    trainer = Trainer(_model(), _terms(), lr=1e-2, seed=11)
    inputs, targets = _batch()
    trainer.init(inputs)
    trainer.train_step(inputs, targets)
    expect = jax.device_get(trainer.params)
    live = (trainer.params, trainer.state, trainer.opt_state)

    path = str(tmp_path / "async.npz")
    trainer.save(path, wait=False)
    # emulate the donation: the TPU train step invalidates the live buffers
    # (CPU jit doesn't donate, so delete them explicitly and immediately —
    # a writer holding these refs instead of copies dies here)
    for leaf in jax.tree_util.tree_leaves(live):
        leaf.delete()
    trainer.wait_for_saves()  # must NOT raise

    _, loaded, extra = modelio.load_model(path, with_extra=True)
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(a, b)
    assert int(extra["train"]["step"]) == 1


def test_clip_norm_caps_gradient_spikes():
    """Adam alone is scale-invariant, so clipping's observable effect is on
    SEQUENCES: after a 1e4-norm gradient spike, an unclipped Adam's second
    moment suppresses the next normal-sized step, while a clipped chain
    (spike capped to norm 1) keeps stepping at ~lr. Drive both transforms
    on the same [small, spike, small] gradient sequence and compare the
    final step size. Also: clip_norm with a custom tx must raise, not be
    silently dropped."""
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.zeros(4)}
    g_small = {"w": jnp.full(4, 1e-2)}
    g_spike = {"w": jnp.full(4, 1e4)}

    def post_spike_step(tx, n_recover=50):
        state = tx.init(params)
        updates, state = tx.update(g_small, state, params)
        updates, state = tx.update(g_spike, state, params)
        for _ in range(n_recover):
            updates, state = tx.update(g_small, state, params)
        return float(jnp.max(jnp.abs(updates["w"])))

    t = Trainer(_model(), _terms(), lr=1e-3, clip_norm=1.0)
    unclipped = optax.adam(1e-3)
    assert post_spike_step(t.tx) > 10 * post_spike_step(unclipped)

    with pytest.raises(ValueError, match="clip_norm"):
        Trainer(_model(), _terms(), tx=optax.adam(1e-3), clip_norm=1.0)


def test_semisupervised_registration_extraction(tmp_path):
    """Semi-supervised checkpoints drop into the inference CLIs: the inner
    VxmDense extracts with a matching param structure and registers plain
    image pairs (no seg input)."""
    from voxelmorph_tpu.models import VxmDenseSemiSupervisedSeg, save_model, load_model
    from voxelmorph_tpu.registration import resolve_registration_model

    model = VxmDenseSemiSupervisedSeg(
        inshape=SHAPE, nb_labels=2, nb_unet_features=[[4], [4, 4]], int_steps=1)
    src = RNG.random((1, *SHAPE, 1)).astype(np.float32)
    half = tuple(s // 2 for s in SHAPE)
    seg = RNG.random((1, *half, 2)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), src, src, seg)["params"]
    path = str(tmp_path / "semi.npz")
    save_model(path, model, jax.device_get(params))

    net, net_params = resolve_registration_model(*load_model(path))
    ref_structure = jax.tree_util.tree_structure(
        net.init(jax.random.PRNGKey(0),
                 jax.numpy.asarray(src), jax.numpy.asarray(src))["params"])
    assert jax.tree_util.tree_structure(net_params) == ref_structure
    out = net.apply({"params": net_params}, src, src, train=False)
    assert out["pos_flow"].shape == (1, *SHAPE, len(SHAPE))


def test_resolution_override_retargets_checkpoint(tmp_path):
    """A checkpoint trained at one resolution evaluates at another: the
    VxmDense family is fully convolutional (inshape only sizes the static
    svf/integration rescale grids), so resolve_registration_model(inshape=)
    clones the net to the eval shape with the SAME params. Unblocks
    canonical-resolution evaluation of half-res-trained SynthMorph /
    HyperMorph populations (VERDICT r3 items 3-4)."""
    from voxelmorph_tpu.models import VxmDense, save_model, load_model
    from voxelmorph_tpu.registration import resolve_registration_model

    model = VxmDense(inshape=SHAPE, nb_unet_features=[[4], [4, 4]],
                     int_steps=2, int_resolution=2)
    src = RNG.random((1, *SHAPE, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), src, src)["params"]
    path = str(tmp_path / "vxm.npz")
    save_model(path, model, jax.device_get(params))

    big = tuple(2 * s for s in SHAPE)
    net, net_params = resolve_registration_model(*load_model(path),
                                                 inshape=big)
    assert tuple(net.inshape) == big
    # params pass through untouched — same pytree, same values
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(net_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mov = RNG.random((1, *big, 1)).astype(np.float32)
    out = net.apply({"params": net_params}, mov, mov, train=False)
    assert out["pos_flow"].shape == (1, *big, len(big))
    assert out["y_source"].shape == (1, *big, 1)
    assert np.isfinite(np.asarray(out["y_source"])).all()
    # matching shape: no clone, identical object semantics
    same, _ = resolve_registration_model(*load_model(path), inshape=SHAPE)
    assert tuple(same.inshape) == SHAPE


# Parity tolerance for the scanned-dispatch contracts below. The per-step
# and scanned paths execute mathematically identical ops with identical rng
# folding and sample sequences, but they are DIFFERENT XLA programs (a
# lax.scan body vs a standalone jit): XLA guarantees the math, not the
# lowering, and fusion/reduction-order differences produce ~1e-7 absolute
# divergence per step that Adam's sqrt-normalization amplifies into the
# low-1e-6 relative range after a few steps (observed: 6.4e-6 rel on 1/864
# params after 4 steps, data-dependent — which made a rtol=1e-6 contract
# order-flaky when the module-global RNG shifted each test's data draws).
# rtol 2e-5 pins the contract at "numerically equivalent programs", which IS
# the XLA guarantee; genuine dispatch bugs (wrong sample order, rng misfold)
# diverge orders of magnitude above this.
SCAN_PARITY_TOL = dict(rtol=2e-5, atol=1e-6)


def test_scanned_cached_label_fit_matches_per_step(tmp_path):
    """The lax.scan multi-step dispatch (fit_cached_labels) must reproduce
    the per-step device_cached_label_generator path: same sample sequence,
    same rng folding, numerically equivalent params after N steps."""
    from voxelmorph_tpu.losses import Dice, Grad
    from voxelmorph_tpu.models import LabelsToImageConfig, SynthMorphDense
    from voxelmorph_tpu.training import device_cached_label_generator

    cfg = LabelsToImageConfig(in_shape=SHAPE, in_label_list=[0, 1, 2],
                              warp_res=[8], bias_res=[8], warp_int_steps=2)
    rng = np.random.default_rng(101)  # test-local: order-independent data
    maps = [rng.integers(0, 3, size=SHAPE).astype(np.int32) for _ in range(4)]

    def make_trainer():
        model = SynthMorphDense(cfg=cfg, nb_unet_features=[[4], [4, 4]],
                                int_steps=1)
        dice, grad = Dice(), Grad("l2", loss_mult=1.0)
        terms = [
            LossTerm("pred_map", lambda t, p: dice.loss(t, p) + 1.0,
                     weight=1.0, target_output_key="map_2", name="dice"),
            LossTerm("pos_flow", grad.loss, weight=1.0,
                     target_output_key="pos_flow", name="grad"),
        ]
        return Trainer(model, terms, lr=1e-3, rng_names=("synth",), seed=3)

    # per-step path, stream starting at 1 (the CLI's shape probe burns 0)
    t1 = make_trainer()
    gen = device_cached_label_generator(maps, batch_size=1, start_step=1)
    probe = np.zeros((1, *SHAPE, 1), np.float32)
    t1.init((probe, probe))
    for _ in range(6):
        inputs, targets = next(gen)
        t1.train_step(inputs, targets)

    # scanned path: 6 steps in 2 dispatches of 3
    t2 = make_trainer()
    t2.fit_cached_labels(maps, epochs=1, steps_per_epoch=6,
                         steps_per_dispatch=3, batch_size=1, start_step=1,
                         model_dir=None, log_fn=lambda s: None)

    l1 = jax.tree_util.tree_leaves(t1.params)
    l2 = jax.tree_util.tree_leaves(t2.params)
    assert t2.global_step == 6
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   **SCAN_PARITY_TOL)


def test_scanned_cached_pair_fit_matches_per_step(tmp_path):
    """The lax.scan multi-step dispatch (fit_cached_pairs) must reproduce
    the per-step device_cached_pair_generator path exactly: same sample
    sequence, same rng folding, same params after N steps."""
    from voxelmorph_tpu.training import (device_cached_pair_generator,
                                         load_volume_stack)

    rng = np.random.default_rng(102)  # test-local: order-independent data
    files = []
    for i in range(4):
        path = str(tmp_path / f"scan{i}.npz")
        np.savez(path, vol=rng.normal(size=SHAPE).astype(np.float32))
        files.append(path)

    def make_trainer():
        return Trainer(_model(), _terms(), lr=1e-3, seed=5)

    # per-step path, stream starting at 1 (the CLI's shape probe burns 0)
    t1 = make_trainer()
    gen = device_cached_pair_generator(files, batch_size=1, start_step=1)
    probe = np.zeros((1, *SHAPE, 1), np.float32)
    t1.init((probe, probe))
    for _ in range(6):
        inputs, targets = next(gen)
        t1.train_step(inputs, targets)

    # scanned path: 6 steps in 2 dispatches of 3
    t2 = make_trainer()
    t2.fit_cached_pairs(load_volume_stack(files), epochs=1, steps_per_epoch=6,
                        steps_per_dispatch=3, batch_size=1, start_step=1,
                        model_dir=None, log_fn=lambda s: None)

    assert t2.global_step == 6
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   **SCAN_PARITY_TOL)


def test_scanned_cached_pair_fit_atlas_mode(tmp_path):
    """Scan-to-atlas scanned dispatch: same parity contract."""
    from voxelmorph_tpu.training import (device_cached_pair_generator,
                                         load_volume_stack)

    rng = np.random.default_rng(103)  # test-local: order-independent data
    files = []
    for i in range(3):
        path = str(tmp_path / f"scan{i}.npz")
        np.savez(path, vol=rng.normal(size=SHAPE).astype(np.float32))
        files.append(path)
    atlas = rng.normal(size=(1, *SHAPE, 1)).astype(np.float32)

    t1 = Trainer(_model(), _terms(), lr=1e-3, seed=5)
    gen = device_cached_pair_generator(files, batch_size=1, atlas=atlas[0],
                                       start_step=1)
    probe = np.zeros((1, *SHAPE, 1), np.float32)
    t1.init((probe, probe))
    for _ in range(4):
        inputs, targets = next(gen)
        t1.train_step(inputs, targets)

    t2 = Trainer(_model(), _terms(), lr=1e-3, seed=5)
    t2.fit_cached_pairs(load_volume_stack(files), epochs=1, steps_per_epoch=4,
                        steps_per_dispatch=2, batch_size=1, atlas=atlas[0],
                        start_step=1, model_dir=None, log_fn=lambda s: None)

    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   **SCAN_PARITY_TOL)
