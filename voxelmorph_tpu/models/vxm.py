"""VxmDense and close variants as flax modules.

Behavioral rebuild of /root/reference/voxelmorph/tf/networks.py:42-571. Each
model is a pure function of (params, inputs, rng) returning a dict of named
tensors — the JAX analog of the reference's ``references`` container
(tf/networks.py:250-262) — from which training wirings pick their loss
inputs. Inference fuses warp prediction and image warping into one jitted
call (the reference runs two separate Keras predicts; see SURVEY §3.2).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import warp as warp_ops
from ..ops.interp import resize as _resize
from .unet import Unet

__all__ = [
    "VxmDense",
    "VxmDenseSemiSupervisedSeg",
    "VxmDenseSemiSupervisedPointCloud",
    "InstanceDense",
    "Transform",
    "rescale_flow",
]


def rescale_flow(flow, factor, batched=True):
    """Rescale a (batched) dense flow by a spatial factor (resize + scale)."""
    if factor == 1:
        return flow
    fn = lambda f: warp_ops.rescale_dense_transform(f, factor)
    return jax.vmap(fn)(flow) if batched else fn(flow)


class VxmDense(nn.Module):
    """Dense unsupervised registration network.

    Forward: concat(source, target) -> U-Net -> flow conv (N(0,1e-5) init)
    [-> probabilistic logsigma head + reparameterized sample] -> rescale to
    svf/integration resolution -> scaling-and-squaring VecInt -> rescale to
    full resolution -> SpatialTransformer warp. Mirrors tf/networks.py:42-262.

    Call returns a dict with keys: y_source, (y_target,) svf, preint_flow,
    postint_flow, pos_flow, (neg_flow,) (flow_params,) and reg — the tensor
    selected by ``reg_field`` for the regularization loss.
    """

    inshape: Sequence[int]
    nb_unet_features: Any = None
    nb_unet_levels: Optional[int] = None
    unet_feat_mult: int = 1
    nb_unet_conv_per_level: int = 1
    int_steps: int = 7
    svf_resolution: int = 1
    int_resolution: int = 2
    bidir: bool = False
    use_probs: bool = False
    src_feats: int = 1
    trg_feats: int = 1
    fill_value: Optional[float] = None
    reg_field: str = "preintegrated"
    hyper: bool = False
    dtype: Any = jnp.float32
    # Inference fast path: move the last s squarings of scaling-and-squaring
    # from field space to image space — warp the image 2^s times by the
    # integration intermediate (the 2^s-th root of pos_flow, whose
    # displacements are ~2^s smaller) through the bounded Pallas kernel
    # instead of one full-resolution corner-table gather (measured 108 ms of
    # a 154 ms forward, PERF_BREAKDOWN_r04). pos_flow and every field output
    # are unchanged; y_source carries 2^s trilinear resamplings instead of 1.
    # Falls back to the exact gather at runtime when the root's displacement
    # exceeds fast_warp_halo, and at trace time off-TPU / when the kernel
    # does not fit VMEM. 0 disables (reference-exact default).
    fast_warp_phases: int = 0
    fast_warp_halo: int = 2

    @nn.compact
    def __call__(self, source, target, hyp=None, train: bool = True):
        ndims = len(self.inshape)
        assert ndims in (1, 2, 3), f"ndims should be one of 1, 2, or 3. found: {ndims}"

        # number of decoder upsamplings to skip so the unet emits at svf res
        nb_upsample_skips = int(np.floor(np.log(self.svf_resolution) / np.log(2)))

        x = jnp.concatenate([source, target], axis=-1)
        x = Unet(
            ndims=ndims,
            nb_features=self.nb_unet_features,
            nb_levels=self.nb_unet_levels,
            feat_mult=self.unet_feat_mult,
            nb_conv_per_level=self.nb_unet_conv_per_level,
            nb_upsample_skips=nb_upsample_skips,
            hyper=self.hyper,
            dtype=self.dtype,
            name="unet",
        )(x, hyp)
        x = x.astype(jnp.float32)
        unet_out = x  # exposed for heads that consume unet features (ProbAtlasSeg)

        k = (3,) * ndims
        flow_mean = nn.Conv(ndims, k, padding="SAME",
                            kernel_init=nn.initializers.normal(1e-5),
                            name="flow")(x)

        outputs = {}
        if self.use_probs:
            flow_logsigma = nn.Conv(
                ndims, k, padding="SAME",
                kernel_init=nn.initializers.normal(1e-10),
                bias_init=nn.initializers.constant(-10.0),
                name="log_sigma")(x)
            outputs["flow_params"] = jnp.concatenate([flow_mean, flow_logsigma], axis=-1)
            if train:
                eps = jax.random.normal(self.make_rng("sample"), flow_mean.shape)
            else:
                eps = jnp.zeros_like(flow_mean)
            flow = flow_mean + jnp.exp(flow_logsigma / 2.0) * eps
        else:
            flow = flow_mean

        # rescale to the exact svf grid if the unet grid differs (rounding)
        pre_svf_size = np.array(flow.shape[1:-1])
        svf_size = np.array([int(np.round(d / self.svf_resolution)) for d in self.inshape])
        if not np.array_equal(pre_svf_size, svf_size):
            factor = svf_size[0] / pre_svf_size[0]
            flow = rescale_flow(flow, factor)
        outputs["svf"] = flow

        # rescale to integration resolution
        int_size = np.array([int(np.round(d / self.int_resolution)) for d in self.inshape])
        if self.int_steps > 0 and self.int_resolution > 1 and \
                not np.array_equal(svf_size, int_size):
            factor = int_size[0] / svf_size[0]
            flow = rescale_flow(flow, factor)
        outputs["preint_flow"] = flow

        pos_flow = flow
        neg_flow = -flow if self.bidir else None

        # phase-warp eligibility is a trace-time decision (see field docs)
        fast_s = 0
        if (not train and self.fast_warp_phases > 0 and self.int_steps > 0
                and ndims == 3 and self.fill_value is None):
            from ..ops import pallas_interp
            nch = source.shape[-1]
            if (pallas_interp.pallas_available()
                    and pallas_interp.kernel_vmem_fits(
                        tuple(self.inshape), nch, self.fast_warp_halo)):
                fast_s = min(int(self.fast_warp_phases), self.int_steps)
        pos_root = neg_root = None

        if self.int_steps > 0:
            if fast_s:
                pos_flow, pos_root = warp_ops.integrate_vec_batched(
                    pos_flow, nb_steps=self.int_steps, return_root_steps=fast_s)
                if self.bidir:
                    neg_flow, neg_root = warp_ops.integrate_vec_batched(
                        neg_flow, nb_steps=self.int_steps,
                        return_root_steps=fast_s)
            else:
                pos_flow = warp_ops.integrate_vec_batched(
                    pos_flow, nb_steps=self.int_steps)
                if self.bidir:
                    neg_flow = warp_ops.integrate_vec_batched(
                        neg_flow, nb_steps=self.int_steps)
        outputs["postint_flow"] = pos_flow

        # back to full resolution
        if self.int_steps > 0 and self.int_resolution > 1:
            factor = self.inshape[0] / int_size[0]
            pos_flow = rescale_flow(pos_flow, factor)
            if pos_root is not None:
                pos_root = rescale_flow(pos_root, factor)
            if self.bidir:
                neg_flow = rescale_flow(neg_flow, factor)
                if neg_root is not None:
                    neg_root = rescale_flow(neg_root, factor)

        warp = lambda img, w: warp_ops.transform_batched(
            img, w, fill_value=self.fill_value)
        # Image dtype for the final full-res warp. Training keeps f32 (loss
        # numerics unchanged); bf16-model INFERENCE warps the image in bf16 —
        # interpn's corner table then stays bf16, halving the build traffic
        # and doubling the useful bytes per random-gather cache line of the
        # hottest full-res stage. The seg transport (hard Dice) is a separate
        # nearest gather and is unaffected.
        img_dt = jnp.float32 if train else self.dtype
        if fast_s:
            y_source = warp_ops.phase_warp_batched(
                source.astype(img_dt), pos_root, pos_flow,
                2 ** fast_s, self.fast_warp_halo)
        else:
            y_source = warp(source.astype(img_dt), pos_flow).astype(jnp.float32)
        outputs["y_source"] = y_source
        outputs["unet_out"] = unet_out
        outputs["pos_flow"] = pos_flow
        if self.bidir:
            if fast_s:
                outputs["y_target"] = warp_ops.phase_warp_batched(
                    target.astype(img_dt), neg_root, neg_flow,
                    2 ** fast_s, self.fast_warp_halo)
            else:
                outputs["y_target"] = warp(
                    target.astype(img_dt), neg_flow).astype(jnp.float32)
            outputs["neg_flow"] = neg_flow

        if self.use_probs:
            outputs["reg"] = outputs["flow_params"]
        else:
            field = {
                "svf": outputs["svf"],
                "preintegrated": outputs["preint_flow"],
                "postintegrated": outputs["postint_flow"],
                "warp": pos_flow,
            }
            if self.reg_field.lower() not in field:
                raise ValueError(f'Unknown option "{self.reg_field}" for reg_field.')
            outputs["reg"] = field[self.reg_field.lower()]

        return outputs


class VxmDenseSemiSupervisedSeg(nn.Module):
    """VxmDense + auxiliary warped (downsampled one-hot) segmentations.

    Rebuild of tf/networks.py:287-388: the pos_flow is rescaled to the
    segmentation resolution and applied (linear interp) to the prob-seg
    input; with ``bidir_labels``, the target seg is warped by the rescaled
    neg_flow as well. Call: (source, target, src_seg[, trg_seg]).
    Adds 'y_seg_source' (and 'y_seg_target') to the output dict.
    """

    inshape: Sequence[int]
    nb_labels: int
    nb_unet_features: Any = None
    seg_resolution: int = 2
    bidir: bool = False
    bidir_labels: bool = False
    int_steps: int = 7
    int_resolution: int = 2
    use_probs: bool = False
    src_feats: int = 1
    trg_feats: int = 1
    reg_field: str = "preintegrated"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source, target, src_seg, trg_seg=None, train: bool = True):
        bidir = self.bidir or self.bidir_labels
        out = VxmDense(
            inshape=self.inshape,
            nb_unet_features=self.nb_unet_features,
            bidir=bidir,
            int_steps=self.int_steps,
            int_resolution=self.int_resolution,
            use_probs=self.use_probs,
            src_feats=self.src_feats,
            trg_feats=self.trg_feats,
            reg_field=self.reg_field,
            dtype=self.dtype,
            name="vxm",
        )(source, target, train=train)

        seg_flow = rescale_flow(out["pos_flow"], 1.0 / self.seg_resolution)
        out["y_seg_source"] = warp_ops.transform_batched(
            src_seg.astype(jnp.float32), seg_flow)

        if self.bidir_labels:
            assert trg_seg is not None, "bidir_labels requires a target segmentation input"
            neg_seg_flow = rescale_flow(out["neg_flow"], 1.0 / self.seg_resolution)
            out["y_seg_target"] = warp_ops.transform_batched(
                trg_seg.astype(jnp.float32), neg_seg_flow)
        return out


def registration_model(model, params):
    """Extract the inner VxmDense from a semi-supervised wrapper checkpoint.

    Deployment registers plain image pairs — the auxiliary seg / surface
    inputs exist only at train time (the reference's get_registration_model
    slices the Keras graph the same way, tf/networks.py:264-268). Returns
    ``(VxmDense, vxm_params)``.
    """
    name = type(model).__name__
    if name == "VxmDenseSemiSupervisedSeg":
        bidir = model.bidir or model.bidir_labels
        net = VxmDense(
            inshape=model.inshape,
            nb_unet_features=model.nb_unet_features,
            bidir=bidir,
            int_steps=model.int_steps,
            int_resolution=model.int_resolution,
            use_probs=model.use_probs,
            src_feats=model.src_feats,
            trg_feats=model.trg_feats,
            reg_field=model.reg_field,
            dtype=model.dtype,
        )
    elif name == "VxmDenseSemiSupervisedPointCloud":
        net = VxmDense(
            inshape=model.inshape,
            nb_unet_features=model.nb_unet_features,
            bidir=True,
            int_steps=model.int_steps,
            int_resolution=model.int_resolution,
            use_probs=model.use_probs,
            dtype=model.dtype,
        )
    else:
        raise ValueError(f"no registration extraction for {name}")
    return net, params["vxm"]


class VxmDenseSemiSupervisedPointCloud(nn.Module):
    """VxmDense (bidir) + surface-point distance supervision.

    Rebuild of tf/networks.py:391-486: warps atlas surface points by
    pos_flow (points move opposite to images), samples the subject SDT at
    the warped points — and symmetrically for subject points / atlas SDT
    when ``surf_bidir``. Outputs add 'subj_dt_value' (and 'atl_dt_value').

    Call: (source, target, subj_dt, atl_dt, subj_surface_pts,
    atlas_surface_pts) with the dt/surface args ordered like the
    surf_semisupervised generator's inputs.
    """

    inshape: Sequence[int]
    nb_surface_points: int
    nb_labels_sample: int
    nb_unet_features: Any = None
    sdt_vol_resize: float = 1.0
    surf_bidir: bool = True
    int_steps: int = 7
    int_resolution: int = 2
    use_probs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source, target, subj_dt=None, atl_dt=None,
                 subj_surface=None, atlas_surface=None, train: bool = True):
        out = VxmDense(
            inshape=self.inshape,
            nb_unet_features=self.nb_unet_features,
            bidir=True,
            int_steps=self.int_steps,
            int_resolution=self.int_resolution,
            use_probs=self.use_probs,
            dtype=self.dtype,
            name="vxm",
        )(source, target, train=train)

        pt_warp = lambda pts, flow: jax.vmap(
            lambda p, f: warp_ops.point_spatial_transformer(
                p, f, sdt_vol_resize=self.sdt_vol_resize))(pts, flow)
        sample = lambda vols, pts: jax.vmap(warp_ops.value_at_location)(vols, pts)

        # pos_flow moves images x->A but points A->x. The (D+1)-th point
        # column is the label index: point_spatial_transformer passes it
        # through untouched, and value_at_location uses it as the channel
        # coordinate to sample the matching label's SDT.
        warped_atl_pts = pt_warp(atlas_surface, out["pos_flow"])
        out["warped_atl_surface"] = warped_atl_pts
        out["subj_dt_value"] = sample(subj_dt, warped_atl_pts)

        if self.surf_bidir:
            warped_subj_pts = pt_warp(subj_surface, out["neg_flow"])
            out["warped_subj_surface"] = warped_subj_pts
            out["atl_dt_value"] = sample(atl_dt, warped_subj_pts)
        return out


class InstanceDense(nn.Module):
    """Instance-specific optimization: a trainable flow field (no network).

    The flow is a learnable parameter of shape (1, *inshape/int_resolution, N)
    scaled by ``mult``, integrated and applied to the source — matching
    tf/networks.py:493-571 where it is a LocalParamWithInput with mult=1000.
    Warm-start via ``set_flow``-style param injection (divide by mult).
    """

    inshape: Sequence[int]
    feats: int = 1
    int_steps: int = 7
    int_resolution: int = 2
    mult: float = 1000.0

    @nn.compact
    def __call__(self, source):
        ndims = len(self.inshape)
        flow_shape = tuple(int(np.round(d / self.int_resolution)) for d in self.inshape)
        flow_param = self.param(
            "flow", nn.initializers.normal(1e-5), (1, *flow_shape, ndims))
        flow = flow_param * self.mult
        preint_flow = jnp.repeat(flow, source.shape[0], axis=0)

        pos_flow = preint_flow
        if self.int_steps > 0:
            pos_flow = warp_ops.integrate_vec_batched(pos_flow, nb_steps=self.int_steps)
            if self.int_resolution > 1:
                factor = self.inshape[0] / flow_shape[0]
                pos_flow = rescale_flow(pos_flow, factor)

        y_source = warp_ops.transform_batched(source, pos_flow)
        return {"y_source": y_source, "preint_flow": preint_flow,
                "pos_flow": pos_flow, "reg": preint_flow}

    @staticmethod
    def flow_from_warp(warp, mult: float = 1000.0):
        """Convert an existing (pre-integration) flow into the stored param."""
        return warp / mult


class Transform(nn.Module):
    """Inference-only transform application (tf/networks.py:990-1029)."""

    interp_method: str = "linear"
    rescale: Optional[float] = None
    fill_value: Optional[float] = None
    shift_center: bool = True

    @nn.compact
    def __call__(self, img, trf):
        if self.rescale is not None and self.rescale != 1:
            from ..ops.affine import is_affine_shape, rescale_affine
            if is_affine_shape(trf.shape[1:]):
                trf = rescale_affine(trf, self.rescale)
            else:
                trf = rescale_flow(trf, self.rescale)
        from ..ops.affine import is_affine_shape
        if (not is_affine_shape(trf.shape[1:])
                and trf.shape[1:-1] == img.shape[1:-1]):
            return warp_ops.transform_batched(
                img, trf, interp_method=self.interp_method,
                fill_value=self.fill_value)
        return jax.vmap(
            lambda i, t: warp_ops.transform(
                i, t, interp_method=self.interp_method,
                fill_value=self.fill_value, shift_center=self.shift_center,
                window_halo=None)
        )(img, trf)
