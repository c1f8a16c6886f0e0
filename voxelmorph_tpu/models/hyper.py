"""HyperMorph: amortized hyperparameter learning via a hypernetwork.

Rebuild of tf/networks.py:1192-1231. In JAX this is the natural functional
pattern: a small MLP maps the hyperparameter vector to an embedding, and
every U-Net convolution's kernel/bias is generated from that embedding (see
models.unet.HyperConv) — no special Keras layer machinery.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .vxm import VxmDense

__all__ = ["HyperVxmDense"]


class HyperVxmDense(nn.Module):
    """VxmDense conditioned on hyperparameters through a hypernetwork MLP.

    Call: (source, target, hyp) where hyp is (B, nb_hyp_params) — e.g. the
    regularization weight lambda in [0, 1]. Defaults match the reference:
    6 dense layers of 128 ReLU units.
    """

    inshape: Sequence[int]
    nb_hyp_params: int = 1
    nb_hyp_layers: int = 6
    nb_hyp_units: int = 128
    nb_unet_features: Any = None
    int_steps: int = 7
    int_resolution: int = 2
    svf_resolution: int = 1
    bidir: bool = False
    use_probs: bool = False
    src_feats: int = 1
    trg_feats: int = 1
    reg_field: str = "preintegrated"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source, target, hyp, train: bool = True):
        x = hyp
        for n in range(self.nb_hyp_layers):
            x = nn.relu(nn.Dense(self.nb_hyp_units, name=f"hyp_dense_{n + 1}")(x))

        out = VxmDense(
            inshape=self.inshape,
            nb_unet_features=self.nb_unet_features,
            int_steps=self.int_steps,
            int_resolution=self.int_resolution,
            svf_resolution=self.svf_resolution,
            bidir=self.bidir,
            use_probs=self.use_probs,
            src_feats=self.src_feats,
            trg_feats=self.trg_feats,
            reg_field=self.reg_field,
            hyper=True,
            dtype=self.dtype,
            name="vxm",
        )(source, target, hyp=x, train=train)
        out["hyper_val"] = hyp
        return out
