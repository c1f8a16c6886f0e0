"""Quality gate: a short training run must achieve strong Dice on a toy
registration problem — the framework's equivalent of the reference's
Dice-evaluation oracle (SURVEY §3.3), shrunk to CI size."""

import numpy as np
import jax.numpy as jnp
import pytest

import voxelmorph_tpu as vxm
from voxelmorph_tpu.models import VxmDense
from voxelmorph_tpu.registration import build_register_seg_fn
from voxelmorph_tpu.training import LossTerm, Trainer


SHAPE = (16, 16, 16)


def _blob(center, r=4.0):
    g = np.meshgrid(*[np.arange(s, dtype=float) for s in SHAPE], indexing="ij")
    d2 = sum((x - c) ** 2 for x, c in zip(g, center))
    vol = np.exp(-d2 / (2 * (r / 1.5) ** 2)).astype(np.float32)
    seg = (d2 < r * r).astype(np.int32)
    return vol[None, ..., None], seg[None, ..., None]


@pytest.mark.slow
def test_registration_improves_dice():
    moving, moving_seg = _blob((6.0, 6.5, 7.0))
    fixed, fixed_seg = _blob((9.0, 8.5, 8.0))

    model = VxmDense(inshape=SHAPE, int_steps=2, int_resolution=2,
                     nb_unet_features=[[8, 16], [16, 16, 8]])
    terms = [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=1.0, target_index=0),
        LossTerm("reg", vxm.losses.Grad("l2", loss_mult=2).loss,
                 weight=0.01, target_index=1, name="grad"),
    ]
    trainer = Trainer(model, terms, lr=1e-2)
    zeros = np.zeros((1, *SHAPE, 3), np.float32)
    trainer.init((moving, fixed))

    register = build_register_seg_fn(model)

    def dice_now():
        _, _, warped_seg = register(trainer.params, jnp.asarray(moving),
                                    jnp.asarray(fixed), jnp.asarray(moving_seg, jnp.float32))
        return float(vxm.py.utils.dice(
            np.asarray(warped_seg).squeeze().round(), fixed_seg.squeeze(), labels=[1])[0])

    d0 = dice_now()
    for _ in range(40):
        trainer.train_step((moving, fixed), (fixed, zeros))
    d1 = dice_now()

    assert d1 > d0 + 0.2, (d0, d1)
    assert d1 > 0.75, (d0, d1)

    # diffeomorphic sanity: folded voxels should be rare
    out = model.apply({"params": trainer.params}, jnp.asarray(moving),
                      jnp.asarray(fixed), train=False)
    jd = np.asarray(vxm.ops.jacobian_determinant(out["pos_flow"][0]))
    assert (jd <= 0).mean() < 0.02
