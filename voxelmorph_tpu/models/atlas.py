"""Template (atlas) construction and probabilistic atlas segmentation models.

Rebuild of /root/reference/voxelmorph/tf/networks.py:578-983. The learnable
atlas is simply a parameter leaf in the pytree (vs the reference's
LocalParamWithInput layer), and MeanStream is a flax variable in a mutable
'stream' collection.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import warp as warp_ops
from .unet import ConvBlock
from .vxm import VxmDense

__all__ = ["MeanStream", "TemplateCreation", "ConditionalTemplateCreation",
           "ProbAtlasSegmentation"]


class MeanStream(nn.Module):
    """Running mean over training batches with a capped effective window.

    JAX rebuild of ne.layers.MeanStream (used for the flow-mean penalty in
    template creation, tf/networks.py:805): maintains (mean, count) in a
    mutable 'stream' collection; each training call folds the batch mean in
    with weight ``batch/min(count, cap)`` and returns the *updated* mean,
    broadcast to the batch.
    """

    cap: float = 100.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        shape = x.shape[1:]
        mean = self.variable("stream", "mean", lambda: jnp.zeros(shape, jnp.float32))
        count = self.variable("stream", "count", lambda: jnp.zeros((), jnp.float32))

        if train and not self.is_initializing():
            bs = x.shape[0]
            new_count = jnp.minimum(count.value + bs, self.cap)
            new_mean = mean.value + (bs / new_count) * (
                jnp.mean(x, axis=0) - mean.value)
            mean.value = new_mean
            count.value = new_count
        # Scale the output by min(1, count/cap) so the mean-flow penalty ramps
        # in over the first `cap` samples instead of applying at full strength
        # from step one (matching ne.layers.MeanStream's output scaling).
        scale = jnp.minimum(1.0, count.value / self.cap)
        return jnp.broadcast_to((scale * mean.value)[None], x.shape)


class TemplateCreation(nn.Module):
    """Unconditional deformable template: a learnable atlas image registered
    bidirectionally to each scan (tf/networks.py:761-853).

    Outputs: y_source (atlas->scan), y_target (scan->atlas), mean_stream
    (running mean of neg_flow), pos_flow/neg_flow, atlas.
    """

    inshape: Sequence[int]
    nb_unet_features: Any = None
    mean_cap: float = 100.0
    atlas_feats: int = 1
    src_feats: int = 1
    int_steps: int = 7
    int_resolution: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source, train: bool = True):
        atlas = self.param("atlas", nn.initializers.normal(1e-7),
                           (1, *self.inshape, self.atlas_feats))
        atlas_b = jnp.repeat(atlas, source.shape[0], axis=0)

        out = VxmDense(
            inshape=self.inshape,
            nb_unet_features=self.nb_unet_features,
            bidir=True,
            int_steps=self.int_steps,
            int_resolution=self.int_resolution,
            src_feats=self.atlas_feats,
            trg_feats=self.src_feats,
            dtype=self.dtype,
            name="vxm",
        )(atlas_b, source, train=train)

        out["atlas"] = atlas
        out["atlas_tensor"] = atlas_b  # batched, for y_target-vs-atlas losses
        out["mean_stream"] = MeanStream(cap=self.mean_cap, name="mean_stream")(
            out["neg_flow"], train=train)
        return out

    @staticmethod
    def set_atlas(params, atlas):
        """Return params with the atlas leaf replaced (functional setter)."""
        atlas = jnp.asarray(atlas)
        if atlas.ndim == len(params["atlas"].shape) - 1:
            atlas = atlas[None]
        new = dict(params)
        new["atlas"] = atlas.reshape(params["atlas"].shape)
        return new

    @staticmethod
    def get_atlas(params):
        return np.asarray(params["atlas"]).squeeze()


class ConditionalTemplateCreation(nn.Module):
    """Conditional template: a phenotype vector generates an atlas residual
    added to a base atlas, then registered as in TemplateCreation
    (tf/networks.py:856-983).

    ``conv_nb_levels > 0`` enables the upsampling atlas decoder the reference
    builds through ``ne.models.conv_dec`` (tf/networks.py:913): the phenotype
    is reshaped to a low-resolution ``conv_image_shape`` image and decoded
    through that many [conv+ELU, 2x nearest-upsample] levels plus a final
    linear conv before the extra convolutions. ``conv_image_shape`` defaults
    to ``inshape`` (levels=0) or ``inshape / 2**levels`` otherwise.

    The reference's ``templcondsi`` branch is not reproduced: it references
    an undefined variable (``pout``, tf/networks.py:941) and cannot execute
    upstream either.

    Call: (pheno, atlas, source). Outputs add 'atlas_tensor' and
    'mean_stream' (if enabled).
    """

    inshape: Sequence[int]
    pheno_input_shape: Sequence[int]
    nb_unet_features: Any = None
    src_feats: int = 1
    atlas_feats: Optional[int] = None
    conv_image_shape: Optional[Sequence[int]] = None
    conv_size: int = 3
    conv_nb_levels: int = 0
    conv_nb_features: int = 32
    extra_conv_layers: int = 3
    use_mean_stream: bool = True
    mean_cap: float = 100.0
    int_steps: int = 7
    int_resolution: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pheno, atlas, source, train: bool = True):
        ndims = len(self.inshape)
        atlas_feats = self.atlas_feats or self.src_feats
        if self.conv_image_shape is not None:
            conv_image_shape = tuple(self.conv_image_shape)
            if len(conv_image_shape) == ndims:
                conv_image_shape += (self.conv_nb_features,)
        else:
            scale = 2 ** self.conv_nb_levels
            conv_image_shape = tuple(s // scale for s in self.inshape) + (
                self.conv_nb_features,)
        up_shape = tuple(s * 2 ** self.conv_nb_levels
                         for s in conv_image_shape[:-1])
        if up_shape != tuple(self.inshape):
            raise ValueError(
                f"conv_image_shape {conv_image_shape[:-1]} upsampled through "
                f"{self.conv_nb_levels} levels gives {up_shape}, expected "
                f"inshape {tuple(self.inshape)}")

        # pheno -> dense -> reshape to a low-channel image
        x = nn.Dense(int(np.prod(conv_image_shape)), name="pheno_dense")(pheno)
        x = nn.elu(x)
        x = x.reshape(-1, *conv_image_shape)

        k = (self.conv_size,) * ndims
        # upsampling decoder (ne.models.conv_dec): conv+ELU then 2x nearest
        # repeat per level, closed by a linear likelihood conv
        for n in range(self.conv_nb_levels):
            x = nn.elu(nn.Conv(self.conv_nb_features, k, padding="SAME",
                               name=f"atlas_dec_conv_{n}")(x))
            for axis in range(1, ndims + 1):
                x = jnp.repeat(x, 2, axis=axis)
        if self.conv_nb_levels:
            x = nn.Conv(self.conv_nb_features, (1,) * ndims, padding="SAME",
                        name="atlas_dec_likelihood")(x)

        # extra decoder convolutions (conv_nb_levels=0 default: no upsampling)
        for n in range(self.extra_conv_layers):
            x = nn.Conv(self.conv_nb_features, k, padding="SAME",
                        name=f"atlas_extra_conv_{n}")(x)

        atlas_gen = nn.Conv(atlas_feats, (3,) * ndims, padding="SAME",
                            kernel_init=nn.initializers.normal(1e-7),
                            bias_init=nn.initializers.normal(1e-7),
                            name="atlas_gen")(x)
        atlas_tensor = atlas + atlas_gen

        out = VxmDense(
            inshape=self.inshape,
            nb_unet_features=self.nb_unet_features,
            bidir=True,
            int_steps=self.int_steps,
            int_resolution=self.int_resolution,
            src_feats=atlas_feats,
            trg_feats=self.src_feats,
            dtype=self.dtype,
            name="vxm",
        )(atlas_tensor, source, train=train)

        out["atlas_tensor"] = atlas_tensor
        if self.use_mean_stream:
            out["mean_stream"] = MeanStream(cap=self.mean_cap, name="mean_stream")(
                out["neg_flow"], train=train)
        return out


def _normal_log_prob(x, mu, logsigmasq):
    """log N(x; mu, exp(logsigmasq/2)^2) — replaces tfp.distributions.Normal."""
    sigma_sq = jnp.exp(logsigmasq)
    return -0.5 * (jnp.log(2 * jnp.pi) + logsigmasq) - 0.5 * (x - mu) ** 2 / sigma_sq


class ProbAtlasSegmentation(nn.Module):
    """Atlas-based Bayesian segmentation (tf/networks.py:578-754).

    Warps a probabilistic atlas to the image (VxmDense with
    src_feats=nb_labels), estimates per-label Gaussian (mu, logsigma^2)
    stats from unet features (or the post-warp concat), and produces the
    unnormalized log-marginal 'loss volume' via log-sum-exp.

    Call: (image, atlas) — note the swapped public input order of the
    reference; internally the atlas is the moving image.

    Outputs: loss_vol, pos_flow (aliased as 'flow'), uloglhood, stat_mu,
    stat_logssq, warped_atlas.
    """

    inshape: Sequence[int]
    nb_labels: int
    nb_unet_features: Any = None
    nb_unet_conv_per_level: int = 1
    init_mu: Any = None
    init_sigma: Any = None
    warp_atlas: bool = True
    stat_post_warp: bool = False
    stat_nb_feats: int = 16
    network_stat_weight: float = 0.001
    supervised_model: bool = False
    int_steps: int = 7
    int_resolution: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, atlas, train: bool = True):
        ndims = len(self.inshape)
        assert ndims in (1, 2, 3), f"ndims should be one of 1, 2, or 3. found: {ndims}"

        out = VxmDense(
            inshape=self.inshape,
            nb_unet_features=self.nb_unet_features,
            nb_unet_conv_per_level=self.nb_unet_conv_per_level,
            int_steps=self.int_steps,
            int_resolution=self.int_resolution,
            src_feats=self.nb_labels,
            trg_feats=image.shape[-1],
            dtype=self.dtype,
            name="vxm",
        )(atlas, image, train=train)

        warped_atlas = out["y_source"] if self.warp_atlas else atlas

        if self.stat_post_warp:
            assert self.warp_atlas, "must enable warp_atlas if computing stat post warp"
            combined = jnp.concatenate([warped_atlas, image], axis=-1)
        else:
            combined = out["unet_out"]

        conv = ConvBlock(self.stat_nb_feats, ndims, name="stat_conv0")(combined)
        conv = ConvBlock(self.nb_labels, ndims, name="stat_conv1")(conv)

        weak = nn.initializers.normal(1e-5)
        k = (3,) * ndims
        # VALID padding then a near-global max pool -> one stat per label
        stat_mu_vol = nn.Conv(self.nb_labels, k, padding="VALID",
                              kernel_init=weak, bias_init=weak, name="mu_vol")(conv)
        stat_logssq_vol = nn.Conv(self.nb_labels, k, padding="VALID",
                                  kernel_init=weak, bias_init=weak,
                                  name="logsigmasq_vol")(conv)
        axes = tuple(range(1, ndims + 1))
        stat_mu = jnp.max(stat_mu_vol, axis=axes, keepdims=True)
        stat_logssq = jnp.max(stat_logssq_vol, axis=axes, keepdims=True)

        if self.init_mu is not None:
            init_mu = jnp.asarray(np.array(self.init_mu), jnp.float32)
            stat_mu = self.network_stat_weight * stat_mu + init_mu
        if self.init_sigma is not None:
            init_logsigmasq = jnp.asarray(
                np.array([2 * math.log(f) for f in self.init_sigma]), jnp.float32)
            stat_logssq = self.network_stat_weight * stat_logssq + init_logsigmasq

        # unnormalized log-likelihood of the image under each label's Gaussian
        uloglhood = _normal_log_prob(image, stat_mu, stat_logssq)

        # log p(x, L) = log p(x|L) + log p(L) from the (warped) atlas prior
        logpdf = uloglhood + jnp.log(jnp.clip(warped_atlas, 1e-36, 1.0))

        if not self.supervised_model:
            # log-sum-exp marginal over labels (unnormalized)
            alpha = jnp.max(logpdf, axis=-1, keepdims=True)
            loss_vol = alpha + jnp.log(
                jnp.sum(jnp.exp(logpdf - alpha), axis=-1, keepdims=True) + 1e-7)
        else:
            loss_vol = jax.nn.softmax(logpdf, axis=-1)

        out["loss_vol"] = loss_vol
        out["flow"] = out["pos_flow"]
        out["uloglhood"] = uloglhood
        out["stat_mu"] = stat_mu
        out["stat_logssq"] = stat_logssq
        out["warped_atlas"] = warped_atlas
        return out
