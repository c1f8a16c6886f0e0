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
