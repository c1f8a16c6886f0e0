"""Configurable N-D U-Net in flax, with optional hypernetwork-generated convs.

Re-designed from the reference's Keras Unet (/root/reference/voxelmorph/tf/
networks.py:1032-1185): same architecture family — encoder of
conv(k3)+LeakyReLU(0.2) blocks with max-pool downsampling, decoder with
nearest-upsample + skip-concat, surplus full-resolution "final convs", and
``nb_upsample_skips`` to emit the output at reduced resolution. Defaults are
the reference's enc [16,32,32,32] / dec [32,32,32,32,32,16,16].

TPU-first mechanics:
  * channels-last layout, convs lowered by XLA onto the MXU;
  * a ``dtype`` knob for bfloat16 compute with float32 params;
  * HyperMorph conditioning is a functional pattern: a small Dense head
    generates each conv's kernel/bias from the hypernetwork embedding and the
    conv is applied per-sample via vmap (replacing neurite's
    HyperConvFromDense layers, tf/networks.py:1695-1728).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Unet", "ConvBlock", "HyperConv", "default_unet_features", "build_feature_lists"]


def default_unet_features():
    return [
        [16, 32, 32, 32],
        [32, 32, 32, 32, 32, 16, 16],
    ]


def build_feature_lists(nb_features=None, nb_levels=None, feat_mult=1,
                        nb_conv_per_level=1) -> Tuple[list, list]:
    """Resolve the (encoder, decoder) feature lists from the flexible spec."""
    if nb_features is None:
        nb_features = default_unet_features()
    if isinstance(nb_features, int):
        if nb_levels is None:
            raise ValueError("must provide unet nb_levels if nb_features is an integer")
        feats = np.round(nb_features * feat_mult ** np.arange(nb_levels)).astype(int)
        enc = np.repeat(feats[:-1], nb_conv_per_level).tolist()
        dec = np.repeat(np.flip(feats), nb_conv_per_level).tolist()
        return enc, dec
    if nb_levels is not None:
        raise ValueError("cannot use nb_levels if nb_features is not an integer")
    enc, dec = nb_features
    return list(enc), list(dec)


def _leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class HyperConv(nn.Module):
    """Convolution whose kernel and bias are generated from a hyper embedding.

    The Dense generators' biases act as the "base" kernel (initialized
    he-normal / zeros), so at initialization the layer behaves like a plain
    conv perturbed by a small hyp-dependent term.
    """

    features: int
    kernel_size: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hyp):
        # x: (B, *spatial, C); hyp: (B, H)
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch, self.features)
        ksize = int(np.prod(kshape))

        fan_in = int(np.prod(self.kernel_size)) * in_ch
        he_std = float(np.sqrt(2.0 / fan_in))

        def base_kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * he_std

        kernel_flat = nn.Dense(
            ksize, name="kernel_gen",
            kernel_init=nn.initializers.normal(1e-3),
            bias_init=base_kernel_init,
            dtype=self.dtype)(hyp)
        bias = nn.Dense(
            self.features, name="bias_gen",
            kernel_init=nn.initializers.normal(1e-3),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype)(hyp)

        kernels = kernel_flat.reshape(-1, *kshape)  # (B, *k, Cin, Cout)
        nd = len(self.kernel_size)
        spatial = "DHW"[-nd:] if nd <= 3 else None
        assert spatial is not None, "HyperConv supports up to 3 spatial dims"
        dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")

        def single(xi, ki):
            return jax.lax.conv_general_dilated(
                xi[None].astype(self.dtype), ki.astype(self.dtype),
                window_strides=(1,) * nd, padding="SAME",
                dimension_numbers=dn)[0]

        out = jax.vmap(single)(x, kernels)
        return out + bias.reshape(bias.shape[0], *([1] * nd), self.features)


class PallasConv3(nn.Module):
    """nn.Conv-compatible 3x3x3 SAME conv backed by the Pallas TPU kernel.

    Same param names/shapes/inits as ``nn.Conv(features, (3,3,3), SAME,
    he_normal)`` — checkpoints are interchangeable. Optionally fuses the
    LeakyReLU(0.2) into the kernel epilogue. Falls back to the XLA conv
    when the kernel declines the shape (tile divisibility / VMEM budget).
    """

    features: int
    fuse_act: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops import pallas_conv
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (3, 3, 3, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        xc = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        slope = 0.2 if self.fuse_act else None
        out = pallas_conv.conv3_same(xc, k, b, act_slope=slope)
        if out is None:
            out = jax.lax.conv_general_dilated(
                xc, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
            if slope is not None:
                out = _leaky_relu(out)
        return out


class LeanDwConv(nn.Module):
    """nn.Conv-compatible k3 SAME conv whose weight gradient is computed by
    shifted dot-contractions (pallas_conv.conv3_same_lean_dw) instead of
    XLA's padded conv-weight-gradient tiling. Same param names/shapes/inits
    as ``nn.Conv(features, (3,)*ndims, SAME, he_normal)`` — checkpoints are
    interchangeable. Optionally fuses the LeakyReLU(0.2)."""

    features: int
    ndims: int
    fuse_act: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops import pallas_conv
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (*((3,) * self.ndims), ci, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return pallas_conv.conv3_same_lean_dw(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype), 0.2 if self.fuse_act else None)


class ConvBlock(nn.Module):
    """conv(k3, he_normal) [+ residual] + LeakyReLU(0.2)."""

    features: int
    ndims: int
    strides: int = 1
    do_res: bool = False
    include_activation: bool = True
    hyper: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hyp=None):
        from ..ops import pallas_conv
        k = (3,) * self.ndims
        fused_act = False
        if self.hyper:
            out = HyperConv(self.features, k, dtype=self.dtype, name="conv")(x, hyp)
        elif (pallas_conv.pallas_conv_enabled() and self.ndims == 3
                and self.strides == 1 and x.ndim == 5):
            fused_act = self.include_activation and not self.do_res
            out = PallasConv3(self.features, fuse_act=fused_act,
                              dtype=self.dtype, name="conv")(x)
        elif pallas_conv.xla_dw_einsum_enabled() and self.strides == 1:
            # all-XLA lean-memory VJP: dw via shifted dot-contractions
            # instead of XLA's padded conv-weight-gradient tiling (the
            # bs2-bf16 OOM driver); forward/dx stay on XLA's conv
            fused_act = self.include_activation and not self.do_res
            out = LeanDwConv(self.features, self.ndims,
                             fuse_act=fused_act, dtype=self.dtype,
                             name="conv")(x)
        else:
            out = nn.Conv(self.features, k, strides=(self.strides,) * self.ndims,
                          padding="SAME", kernel_init=nn.initializers.he_normal(),
                          dtype=self.dtype, name="conv")(x)
        if fused_act:
            return out
        if self.do_res:
            add = x
            if self.features != x.shape[-1]:
                if self.hyper:
                    add = HyperConv(self.features, k, dtype=self.dtype, name="resfix")(x, hyp)
                else:
                    add = nn.Conv(self.features, k, padding="SAME",
                                  kernel_init=nn.initializers.he_normal(),
                                  dtype=self.dtype, name="resfix")(x)
            out = out + add
        if self.include_activation:
            out = _leaky_relu(out)
        return out


def _upsample_nearest(x, factor: int, ndims: int):
    for d in range(ndims):
        x = jnp.repeat(x, factor, axis=d + 1)
    return x


def _pool_fwd_impl(x, window: int, ndims: int):
    w = (window,) * ndims
    return nn.max_pool(x, window_shape=w, strides=w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool(x, window: int, ndims: int):
    """Non-overlapping max pool with a mask-based backward.

    The forward is the plain reduce-window max. The custom backward replaces
    XLA's select-and-scatter gradient — whose TPU lowering materializes
    channel-minor ((2,128)-tiled, C=16 on lanes → 8x pad) layout copies of
    the full-res activation, the dominant allocations in the bs>=2 full-res
    train-step OOM dumps — with repeat + compare + where: elementwise ops
    that fuse into neighbors and add no layout-converted temps. Tied maxima
    split the window's gradient equally (1/count each), so the routed
    gradient sums to g per window even on spatially constant activations
    (uniform image backgrounds), where ties are the norm — and more frequent
    still under bfloat16.
    """
    return _pool_fwd_impl(x, window, ndims)


def _max_pool_fwd(x, window: int, ndims: int):
    out = _pool_fwd_impl(x, window, ndims)
    return out, (x, out)


def _max_pool_bwd(window: int, ndims: int, res, g):
    x, out = res
    up, gu = out, g
    for d in range(ndims):
        up = jnp.repeat(up, window, axis=d + 1)
        gu = jnp.repeat(gu, window, axis=d + 1)
    # VALID pooling truncates non-divisible edges: zero gradient there.
    if up.shape != x.shape:
        pads = [(0, 0)] + [(0, x.shape[d + 1] - up.shape[d + 1])
                           for d in range(ndims)] + [(0, 0)]
        up = jnp.pad(up, pads, constant_values=-jnp.inf)
        gu = jnp.pad(gu, pads)
    mask = x == up
    # per-window tie count: each tied element gets an equal 1/count share so
    # the gradient is routed, not duplicated (window-sum of the output == g)
    w = (1,) + (window,) * ndims + (1,)
    count = jax.lax.reduce_window(mask.astype(gu.dtype),
                                  jnp.zeros((), gu.dtype), jax.lax.add,
                                  w, w, "VALID")
    for d in range(ndims):
        count = jnp.repeat(count, window, axis=d + 1)
    if count.shape != x.shape:
        cpads = [(0, 0)] + [(0, x.shape[d + 1] - count.shape[d + 1])
                            for d in range(ndims)] + [(0, 0)]
        count = jnp.pad(count, cpads, constant_values=1)
    return (jnp.where(mask, gu / count, jnp.zeros_like(gu)),)


_max_pool.defvjp(_max_pool_fwd, _max_pool_bwd)


class Unet(nn.Module):
    """N-D encoder-decoder with skip connections.

    Attributes follow the reference constructor: nb_features (list-of-lists or
    int + nb_levels/feat_mult/nb_conv_per_level), max_pool factor(s),
    nb_upsample_skips, do_res, final_activation_function, and `hyper` to
    enable hypernetwork-generated convolutions (pass `hyp` at call time).
    """

    ndims: int
    nb_features: Any = None
    nb_levels: Optional[int] = None
    max_pool: Any = 2
    feat_mult: int = 1
    nb_conv_per_level: int = 1
    do_res: bool = False
    nb_upsample_skips: int = 0
    hyper: bool = False
    final_activation_function: Optional[str] = None
    remat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hyp=None):
        enc_nf, dec_nf = build_feature_lists(
            self.nb_features, self.nb_levels, self.feat_mult, self.nb_conv_per_level)

        # Rematerialize each conv block in the backward pass: full-resolution
        # 3-D U-Net activations otherwise exceed HBM during training (the
        # decoder's full-res temps alone are multiple GB with TPU layout
        # padding). ~1/3 extra forward FLOPs buys an O(depth) memory cut.
        block_cls = nn.remat(ConvBlock) if self.remat else ConvBlock

        nb_dec_convs = len(enc_nf)
        final_convs = dec_nf[nb_dec_convs:]
        dec_nf = dec_nf[:nb_dec_convs]
        nb_levels = int(nb_dec_convs / self.nb_conv_per_level) + 1

        max_pool = self.max_pool
        if isinstance(max_pool, int):
            max_pool = [max_pool] * nb_levels

        def conv_block(h, nf, name, include_activation=True):
            block = block_cls(nf, self.ndims, do_res=self.do_res,
                              include_activation=include_activation,
                              hyper=self.hyper, dtype=self.dtype, name=name)
            return block(h, hyp) if self.hyper else block(h)

        # encoder
        enc_layers = []
        last = x.astype(self.dtype)
        for level in range(nb_levels - 1):
            for conv in range(self.nb_conv_per_level):
                nf = enc_nf[level * self.nb_conv_per_level + conv]
                last = conv_block(last, nf, f"enc_conv_{level}_{conv}")
            enc_layers.append(last)
            last = _max_pool(last, max_pool[level], self.ndims)

        if self.final_activation_function is not None and len(final_convs) == 0:
            activate = lambda lvl, c: not (
                lvl == (nb_levels - 2) and c == (self.nb_conv_per_level - 1))
        else:
            activate = lambda lvl, c: True

        # decoder
        for level in range(nb_levels - 1):
            real_level = nb_levels - level - 2
            for conv in range(self.nb_conv_per_level):
                nf = dec_nf[level * self.nb_conv_per_level + conv]
                last = conv_block(last, nf, f"dec_conv_{real_level}_{conv}",
                                  include_activation=activate(level, conv))
            if level < (nb_levels - 1 - self.nb_upsample_skips):
                last = _upsample_nearest(last, max_pool[real_level], self.ndims)
                last = jnp.concatenate([last, enc_layers.pop()], axis=-1)

        if self.final_activation_function is not None:
            activate_final = lambda n: n != (len(final_convs) - 1)
        else:
            activate_final = lambda n: True

        for num, nf in enumerate(final_convs):
            last = conv_block(last, nf, f"dec_final_conv_{num}",
                              include_activation=activate_final(num))

        if self.final_activation_function is not None:
            last = getattr(nn, self.final_activation_function)(last)

        return last
