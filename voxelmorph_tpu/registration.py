"""High-level registration API: fused, jitted predict paths.

The reference runs inference as *two* separate Keras predicts (warp, then
warping — SURVEY §3.2); here a single jitted function produces both the warp
and the moved image in one device round trip, with an optional extra image
(e.g. a segmentation, nearest-interpolated) transported by the same warp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops import warp as warp_ops

__all__ = ["build_register_fn", "build_register_seg_fn",
           "build_joint_register_fn", "build_eval_register_fn",
           "resolve_registration_model", "register_pair",
           "enable_fast_warp"]


def enable_fast_warp(model, phases: int = 2, halo: int = 2):
    """Return a copy of ``model`` with the phase-warp inference path on.

    The phase warp replaces the full-resolution corner-table gather (the
    single most expensive inference stage: 108 ms of a 154 ms forward at
    160x192x224, PERF_BREAKDOWN_r04) with 2^phases bounded Pallas warps by
    the integration root — see ``ops.warp.phase_warp_batched``. Sensible
    only for diffeomorphic VxmDense-family models (``int_steps > 0``);
    anything else passes through unchanged. ``phases=2`` bounds the root of
    a ~8-voxel flow to ~2 voxels, inside the halo-2 fast branch; larger
    flows fall back to the exact gather at runtime. (phases=3 measured
    SLOWER than the gather end-to-end — 8 halo-2 kernel applications exceed
    one gather's cost, BENCH_trial_r04b — so more phases only pay off if
    the bounded kernel gets faster.)
    """
    if getattr(model, "int_steps", 0) > 0 and hasattr(model, "fast_warp_phases"):
        return model.clone(fast_warp_phases=phases, fast_warp_halo=halo)
    return model


def resolve_registration_model(model, params, inshape=None):
    """Map any loadable checkpoint to a net that registers *images*.

    SynthMorphDense checkpoints carry the synthesis wrapper around the
    registration net — deployment uses the inner VxmDense only (the
    reference ships just those weights, scripts/tf/train_synthmorph.py:149).
    Every other model class registers images directly and passes through.

    ``inshape``, when given, re-targets the resolved net to that volume
    resolution: the VxmDense family is fully convolutional (``inshape``
    only sizes the static svf/integration rescale grids), so a checkpoint
    trained at one resolution evaluates at another with the same params —
    e.g. SynthMorph nets trained on the half-res synthesized population
    deployed on canonical 160x192x224 scans.
    """
    name = type(model).__name__
    if name == "SynthMorphDense":
        from .models.synthmorph import registration_model
        model, params = registration_model(model, params)
    elif name in ("VxmDenseSemiSupervisedSeg", "VxmDenseSemiSupervisedPointCloud"):
        from .models.vxm import registration_model
        model, params = registration_model(model, params)
    if (inshape is not None
            and type(model).__name__ in ("VxmDense", "HyperVxmDense")
            and tuple(model.inshape) != tuple(inshape)):
        model = model.clone(inshape=tuple(inshape))
    return model, params


def _apply_image_model(model, params, moving, fixed, hyper):
    """model.apply with the HyperVxmDense calling convention handled.

    HyperVxmDense takes a positional (B, nb_hyp) hyperparameter tensor
    (reference tf/networks.py:1192-1231 feeds it as a second model input);
    every other image-registration model is (moving, fixed). Output keys
    are identical, so callers stay uniform.
    """
    if type(model).__name__ == "HyperVxmDense":
        hyp = jnp.full((moving.shape[0], model.nb_hyp_params),
                       hyper, jnp.float32)
        return model.apply({"params": params}, moving, fixed, hyp, train=False)
    return model.apply({"params": params}, moving, fixed, train=False)


def build_register_fn(model, interp_method: str = "linear",
                      hyper: float = 0.5):
    """Return a jitted fn(params, moving, fixed) -> (moved, warp).

    ``hyper`` is baked into HyperVxmDense calls and ignored by other models.
    """

    @jax.jit
    def _register(params, moving, fixed):
        out = _apply_image_model(model, params, moving, fixed, hyper)
        return out["y_source"], out["pos_flow"]

    return _register


def build_register_seg_fn(model, hyper: float = 0.5):
    """Jitted fn(params, moving, fixed, moving_seg) -> (moved, warp, moved_seg).

    The segmentation rides the same warp with nearest-neighbor interpolation —
    the scripts/tf/test.py evaluation path, fused into one call.
    """

    @jax.jit
    def _register(params, moving, fixed, moving_seg):
        out = _apply_image_model(model, params, moving, fixed, hyper)
        warp = out["pos_flow"]
        moved_seg = warp_ops.transform_batched(
            moving_seg, warp, interp_method="nearest")
        return out["y_source"], warp, moved_seg

    return _register


def build_joint_register_fn(model):
    """Jitted fn(params, hyp, moving, fixed) -> (moved, warp) for
    HyperVxmJoint — the SynthMorph affine+deformable product.

    ``hyp`` is the (B, 1) regularization hyperparameter the deformable
    stage was amortized over. The total transform operates on zero-based
    indices (reference tf/networks.py:1648-1666 convention), so the moved
    image is produced with ``shift_center=False`` and zero fill.
    """

    @jax.jit
    def _register(params, hyp, moving, fixed):
        out = model.apply({"params": params}, hyp, moving, fixed)
        warp = out["tot_1"]
        moved = jax.vmap(
            lambda im, w: warp_ops.transform(
                im, w, fill_value=0.0, shift_center=False))(moving, warp)
        return moved, warp

    return _register


def build_eval_register_fn(model, hyper: float = 0.5):
    """Uniform eval entry: fn(params, moving, fixed, moving_seg) ->
    (moved, warp, moved_seg) for ANY zoo registration model.

    VxmDense-family models use the fused register+seg path (HyperVxmDense
    included — ``hyper`` becomes its hyperparameter input); HyperVxmJoint
    gets its (hyp, im1, im2) calling convention and zero-based-index
    transform semantics handled here, with ``hyper`` baked in, so test.py
    and the quality-eval runner work on every checkpoint type.
    """
    if type(model).__name__ != "HyperVxmJoint":
        return build_register_seg_fn(model, hyper=hyper)

    @jax.jit
    def _register(params, moving, fixed, moving_seg):
        hyp = jnp.full((moving.shape[0], 1), hyper, jnp.float32)
        out = model.apply({"params": params}, hyp, moving, fixed)
        warp = out["tot_1"]
        apply = lambda im, interp: jax.vmap(
            lambda i, w: warp_ops.transform(
                i, w, interp_method=interp, fill_value=0.0,
                shift_center=False))(im, warp)
        return apply(moving, "linear"), warp, apply(moving_seg, "nearest")

    return _register


def register_pair(model, params, moving, fixed):
    """Convenience one-shot: returns (moved, warp) as numpy arrays."""
    fn = build_register_fn(model)
    moved, warp = fn(params, jnp.asarray(moving), jnp.asarray(fixed))
    return jax.device_get(moved), jax.device_get(warp)
