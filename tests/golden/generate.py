"""Generate the golden regression fixtures (run from repo root).

Pins today's verified op semantics as committed arrays so future refactors
(e.g. kernel swaps) are checked against fixed values, not a live oracle.
Inputs are derived from a fixed seed; regenerate ONLY after deliberately
changing op semantics, and re-verify against tests/np_reference.py first.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("VXM_WINDOW_HALO", "0")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import voxelmorph_tpu as vxm
from voxelmorph_tpu.ops import warp as W

OUT = os.path.join(os.path.dirname(__file__), "fixtures.npz")

rng = np.random.default_rng(1234)
vol = rng.normal(size=(6, 7, 8, 2)).astype(np.float32)
shift = rng.uniform(-2.5, 2.5, size=(6, 7, 8, 3)).astype(np.float32)
vec = rng.uniform(-3, 3, size=(6, 7, 8, 3)).astype(np.float32)
img_a = rng.normal(size=(1, 9, 9, 9, 1)).astype(np.float32)
img_b = rng.normal(size=(1, 9, 9, 9, 1)).astype(np.float32)
flow = rng.normal(size=(1, 9, 9, 9, 3)).astype(np.float32)
mu = rng.normal(size=(1, 9, 9, 9, 3)).astype(np.float32) * 0.1
logs = rng.normal(size=(1, 9, 9, 9, 3)).astype(np.float32) - 3.0

out = {
    "vol": vol, "shift": shift, "vec": vec,
    "img_a": img_a, "img_b": img_b, "flow": flow, "mu": mu, "logs": logs,
    "transform_linear": np.asarray(W.transform(jnp.asarray(vol), jnp.asarray(shift),
                                               window_halo=None)),
    "transform_nearest": np.asarray(W.transform(jnp.asarray(vol), jnp.asarray(shift),
                                                interp_method="nearest")),
    "transform_fill": np.asarray(W.transform(jnp.asarray(vol), jnp.asarray(shift),
                                             fill_value=0.0)),
    "integrate_ss7": np.asarray(W.integrate_vec(jnp.asarray(vec), nb_steps=7)),
    "integrate_quad5": np.asarray(W.integrate_vec(jnp.asarray(vec),
                                                  method="quadrature", nb_steps=5)),
    "ncc_win5": np.asarray(vxm.losses.NCC(win=5).loss(jnp.asarray(img_a),
                                                      jnp.asarray(img_b))),
    "grad_l2": np.asarray(vxm.losses.Grad("l2").loss(None, jnp.asarray(flow))),
    "kl": np.asarray(vxm.losses.KL(10.0, (9, 9, 9)).loss(
        jnp.asarray(flow), jnp.asarray(jnp.concatenate([mu, logs], axis=-1)))),
}
np.savez_compressed(OUT, **out)
print("wrote", OUT, "keys:", sorted(out))
