"""Dense-warp operations: apply, compose, rescale, and integrate transforms.

TPU-first re-design of the reference's deformation utilities
(/root/reference/voxelmorph/tf/utils/utils.py:96-499). Key departures from the
reference implementation (behavior preserved, mechanics re-thought):

  * No per-sample ``tf.map_fn`` anywhere — batching is ``jax.vmap`` at the
    layer level, which XLA fuses into batched gathers.
  * Scaling-and-squaring integration is a compile-time-unrolled loop of
    warp self-composition with optional rematerialization (``jax.checkpoint``)
    so the 7-step backward pass doesn't hold 7 full fields in HBM.
  * Everything is a pure function of arrays; transforms are float32 (or the
    caller's float dtype) end to end.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# Default halo for the adaptive windowed warp fast path, resolved lazily at
# trace time: ON (halo=1, Pallas kernel) on TPU where the bounded warp is a
# single-HBM-pass win, OFF on CPU where compiling both lax.cond branches
# costs minutes for no runtime benefit. Override with VXM_WINDOW_HALO=<n>
# (0 disables everywhere).
_env_halo = os.environ.get("VXM_WINDOW_HALO")
DEFAULT_WINDOW_HALO = "auto"  # sentinel: resolved by _resolve_halo per trace

# The windowed tiers pad and shift the WHOLE volume per tap — every branch
# of the lax.switch holds (2h+1)^3-term intermediates of the full volume,
# and they are compiled (and their buffers largely live) even when the
# runtime bound picks the gather. For wide-channel volumes (SynthMorph /
# ProbAtlas one-hot maps: 30ch at full res = 900 MB each) that multiplies a
# ~1 GB tensor — measured as the dominant allocations in the full-res
# SynthMorph train-step OOM. Flow fields (3ch) and images (1ch) stay
# windowed; anything wider takes the gather unconditionally.
_WINDOWED_MAX_CHANNELS = 4


def _resolve_halo(window_halo) -> Optional[int]:
    if window_halo != "auto":
        return window_halo
    if _env_halo is not None:
        v = int(_env_halo)
        return v if v > 0 else None
    import jax as _jax
    return 1 if _jax.default_backend() == "tpu" else None

from .affine import affine_to_dense_shift, is_affine_shape, make_square_affine
from .interp import interpn, ndgrid, resize

__all__ = [
    "transform",
    "windowed_transform",
    "transform_batched",
    "batch_transform",
    "compose",
    "rescale_dense_transform",
    "integrate_vec",
    "integrate_vec_batched",
    "phase_warp_batched",
    "point_spatial_transformer",
    "value_at_location",
    "jacobian_determinant",
]


def windowed_transform(vol: jnp.ndarray, loc_shift: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Dense warp for displacement magnitudes bounded by ``halo`` voxels.

    Rewrites the trilinear gather as a sum over integer offsets d in
    [-halo, halo]^N of *contiguous shifted slices* weighted by the
    per-voxel triangle kernel max(0, 1-|shift - d|): every memory access is
    sequential (full HBM bandwidth, no gather transactions), and the VJP is
    pads/slices instead of scatters. Only correct when |shift| <= halo
    element-wise — callers guard with ``lax.cond`` (see ``transform``).

    vol: (*S, C); loc_shift: (*S, N) with N == len(S). Edge behavior matches
    the clamped gather path: coordinates are clamped to [0, dim-1] before
    interpolation.
    """
    nd = loc_shift.shape[-1]
    spatial = vol.shape[:-1]
    # clamp sampling coordinates exactly like the gather path
    grid = ndgrid(spatial, dtype=loc_shift.dtype)
    max_loc = jnp.asarray([s - 1 for s in spatial], loc_shift.dtype)
    coords = jnp.clip(grid + loc_shift, 0.0, max_loc)
    d = coords - grid  # effective shift after clamping, |d| <= halo

    # offsets outside [-halo, halo] have identically-zero triangle weights
    # (|d| <= halo), so the sum has (2*halo+1)^N terms
    pad = halo
    pads = [(pad, pad)] * nd + [(0, 0)]
    vol_p = jnp.pad(vol, pads, mode="edge")

    out = jnp.zeros_like(vol)
    offsets = range(-halo, halo + 1)
    import itertools
    for off in itertools.product(offsets, repeat=nd):
        w = None
        for axis in range(nd):
            t = jnp.maximum(0.0, 1.0 - jnp.abs(d[..., axis] - off[axis]))
            w = t if w is None else w * t
        idx = tuple(
            slice(pad + off[axis], pad + off[axis] + spatial[axis])
            for axis in range(nd)
        )
        out = out + vol_p[idx] * w[..., None]
    return out


# Trace-time switch for the Pallas kernel. pallas_call has no GSPMD
# partitioning rule: under a 'space'-sharded operand XLA would either fail
# to partition or silently all-gather the full field onto every chip. The
# Trainer flips this off whenever its mesh has a space axis > 1, so the
# windowed path lowers to the XLA shifted-slice formulation, which GSPMD
# partitions with ordinary halo exchanges. Sticky for the process (a
# spatially-sharded trainer and a Pallas inference path never share a
# process in practice); VXM_PALLAS=0 is the user-level kill switch.
_PALLAS_DISPATCH_OK = True


def set_pallas_dispatch(enabled: bool) -> None:
    """Allow/forbid lowering bounded warps to the Pallas kernel (trace-time)."""
    global _PALLAS_DISPATCH_OK
    _PALLAS_DISPATCH_OK = bool(enabled)


def _pallas_eligible(vol: jnp.ndarray, loc_shift: jnp.ndarray, halo: int) -> bool:
    if not (_PALLAS_DISPATCH_OK
            and loc_shift.shape[-1] == 3
            and os.environ.get("VXM_PALLAS", "1") != "0"):
        return False
    from . import pallas_interp
    return (pallas_interp.pallas_available()
            and pallas_interp.kernel_vmem_fits(
                vol.shape[:-1], vol.shape[-1], halo))


def _windowed_impl(vol: jnp.ndarray, loc_shift: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Bounded-displacement warp: the Pallas TPU kernel when available
    (single pass over HBM), else the XLA shifted-slice formulation."""
    if _pallas_eligible(vol, loc_shift, halo):
        from . import pallas_interp
        return pallas_interp.warp_bounded(vol, loc_shift, halo)
    return windowed_transform(vol, loc_shift, halo)


def _windowed_impl_batched(vols: jnp.ndarray, shifts: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Batch of bounded warps. The Pallas path unrolls over the batch instead
    of vmapping: the v5 streaming kernel (manual DMA + scratch semaphores)
    has no vmap batching rule, and on a single-TensorCore chip sequential
    kernel launches pipeline back-to-back anyway. The XLA path keeps vmap."""
    if _pallas_eligible(vols[0], shifts[0], halo):
        from . import pallas_interp
        return jnp.stack([
            pallas_interp.warp_bounded(vols[b], shifts[b], halo)
            for b in range(vols.shape[0])])
    return jax.vmap(lambda v, s: windowed_transform(v, s, halo))(vols, shifts)


def transform(
    vol: jnp.ndarray,
    loc_shift: jnp.ndarray,
    interp_method: str = "linear",
    fill_value: Optional[float] = None,
    shift_center: bool = True,
    shape: Optional[Sequence[int]] = None,
    window_halo: Optional[int] = DEFAULT_WINDOW_HALO,
) -> jnp.ndarray:
    """Apply an affine or dense transform to a single (non-batched) image.

    ``loc_shift`` moves *data*: the output at x holds the input at
    ``x + loc_shift(x)`` (pull/backward warping), exactly the reference
    semantics (tf/utils/utils.py:96-174).

    Args:
      vol: ``(*vol_shape, C)`` (or ``(*vol_shape,)``) input image.
      loc_shift: affine ``(N, N+1)``/``(N+1, N+1)`` matrix, or a dense shift of
        shape ``(*out_shape, N)`` or channelwise ``(*out_shape, C, N)``.
      interp_method: 'linear' or 'nearest'.
      fill_value: out-of-domain fill; None = clamp to edge.
      shift_center: center the grid when densifying an affine.
      shape: output spatial shape when densifying an affine (incompatible
        with shift_center=True).
    """
    if shape is not None and shift_center:
        raise ValueError("`shape` option incompatible with `shift_center=True`")

    if not jnp.issubdtype(vol.dtype, jnp.floating):
        vol = vol.astype(jnp.float32)
    if not jnp.issubdtype(loc_shift.dtype, jnp.floating):
        loc_shift = loc_shift.astype(jnp.float32)

    squeeze_channel = False
    if is_affine_shape(loc_shift.shape):
        target_shape = vol.shape[:-1] if shape is None else shape
        if vol.ndim == loc_shift.shape[-1] - 1:  # vol has no channel axis
            target_shape = vol.shape if shape is None else shape
            vol = vol[..., None]
            squeeze_channel = True
        loc_shift = affine_to_dense_shift(loc_shift, shape=target_shape,
                                          shift_center=shift_center)
    nb_dims = loc_shift.shape[-1]
    if vol.ndim == nb_dims:
        vol = vol[..., None]
        squeeze_channel = True

    loc_volshape = loc_shift.shape[:-1]
    is_channelwise = len(loc_volshape) == vol.ndim  # (*out, C, N) vs (*out, N)

    if is_channelwise:
        # One flow per channel: interpolate each channel with its own field.
        # The reference emulates this by appending the channel coordinate to
        # the lookup; a channel-vmap is equivalent and avoids a (D+1)-D gather.
        out = jax.vmap(
            lambda v, s: transform(v[..., None], s, interp_method=interp_method,
                                   fill_value=fill_value, window_halo=None)[..., 0],
            in_axes=(-1, -2),
            out_axes=-1,
        )(vol, loc_shift)
        return out[..., 0] if squeeze_channel else out

    def gather_path(args):
        v, s = args
        grid = ndgrid(loc_volshape, dtype=s.dtype)
        return interpn(v, grid + s, interp_method=interp_method,
                       fill_value=fill_value)

    # Runtime-adaptive fast path: when every displacement component is within
    # `window_halo` voxels (always true for early scaling-and-squaring steps),
    # warp via contiguous shifted slices instead of a random gather — far
    # faster on TPU and with a scatter-free backward. lax.cond picks the
    # branch per call at the cost of compiling both.
    #
    # CAREFUL: only enable on calls NOT wrapped in vmap — a vmapped cond
    # executes BOTH branches (select semantics). Batched callers should use
    # `transform_batched` / `integrate_vec_batched`, which hoist one cond
    # above the whole batch.
    window_halo = _resolve_halo(window_halo)
    use_window = (
        window_halo is not None
        and interp_method == "linear"
        and fill_value is None
        and vol.shape[-1] <= _WINDOWED_MAX_CHANNELS
        and tuple(loc_volshape) == tuple(vol.shape[:-1])
    )
    if use_window:
        out = _tiered_windowed_switch(
            (vol, loc_shift),
            lambda args, h: _windowed_impl(args[0], args[1], h),
            gather_path, window_halo, jnp.max(jnp.abs(loc_shift)))
    else:
        out = gather_path((vol, loc_shift))
    return out[..., 0] if squeeze_channel else out


def _tiered_windowed_switch(args, windowed_fn, gather_fn, window_halo, max_d):
    """Dispatch a warp on the runtime displacement bound, TIERED by halo.

    The kernel cost grows with (2h+1)^3 taps (halo 1 measured ~2.8x cheaper
    than halo 2), and early scaling-and-squaring steps have tiny
    displacements — so instead of one halo-or-gather cond, pick the SMALLEST
    sufficient halo: max|d| <= 1 -> halo-1 kernel, <= window_halo -> full-halo
    kernel, else the gather. One lax.switch, hoisted above any vmap.
    """
    tiers = sorted({1, int(window_halo)})
    index = sum(jnp.int32(max_d > float(h)) for h in tiers)
    branches = [(lambda a, h=h: windowed_fn(a, h)) for h in tiers]
    branches.append(gather_fn)
    return jax.lax.switch(index, branches, args)


def transform_batched(
    vols: jnp.ndarray,
    shifts: jnp.ndarray,
    interp_method: str = "linear",
    fill_value: Optional[float] = None,
    window_halo: Optional[int] = DEFAULT_WINDOW_HALO,
) -> jnp.ndarray:
    """Batched dense warp with ONE adaptive dispatch for the whole batch.

    vols (B, *S, C), shifts (B, *S, N). The windowed/gather decision is a
    single lax.cond over max|shift| of the batch — hoisted above the vmap so
    only one branch executes (vmapping a cond would run both).
    """
    gather = jax.vmap(lambda v, s: transform(
        v, s, interp_method=interp_method, fill_value=fill_value,
        window_halo=None))
    window_halo = _resolve_halo(window_halo)
    use_window = (
        window_halo is not None
        and interp_method == "linear"
        and fill_value is None
        and vols.shape[-1] <= _WINDOWED_MAX_CHANNELS
        and shifts.ndim == vols.ndim
        and tuple(shifts.shape[1:-1]) == tuple(vols.shape[1:-1])
    )
    if not use_window:
        return gather(vols, shifts)
    return _tiered_windowed_switch(
        (vols, shifts),
        lambda args, h: _windowed_impl_batched(args[0], args[1], h),
        lambda args: gather(*args), window_halo,
        jnp.max(jnp.abs(shifts)))


def integrate_vec_batched(
    vec: jnp.ndarray,
    nb_steps: int = 7,
    remat: bool = True,
    window_halo: Optional[int] = DEFAULT_WINDOW_HALO,
    return_root_steps: int = 0,
):
    """Batched scaling-and-squaring with per-step batch-level adaptive warps.

    vec: (B, *S, N). Early steps (tiny displacements after the 2^-n scaling)
    run the windowed fast path; later steps fall back to the gather — decided
    once per step for the whole batch.

    With ``return_root_steps = s > 0``, also returns the intermediate field
    ``root`` after ``nb_steps - s`` squarings — the 2^s-th root of the final
    transform in the diffeomorphism group (``root`` composed with itself 2^s
    times equals the result, up to interpolation error). It is a free
    byproduct of the loop; see ``phase_warp_batched`` for why it's useful.
    Returns ``(final, root)`` in that case.
    """
    assert nb_steps >= 0
    assert 0 <= return_root_steps <= nb_steps
    vec = vec / (2.0 ** nb_steps)

    def step(v):
        return v + transform_batched(v, v, window_halo=window_halo)

    if remat:
        step = jax.checkpoint(step)
    root = vec
    for i in range(nb_steps):
        if i == nb_steps - return_root_steps:
            root = vec
        vec = step(vec)
    if return_root_steps:
        return vec, root
    return vec


def phase_warp_batched(
    vols: jnp.ndarray,
    root: jnp.ndarray,
    full_flow: jnp.ndarray,
    n_apps: int,
    halo: int,
) -> jnp.ndarray:
    """Warp ``vols`` by ``full_flow`` as ``n_apps`` successive bounded warps.

    The TPU-side answer to the full-resolution warp gather being the single
    most expensive stage of inference (measured 108 ms of a 154 ms forward at
    160x192x224 — PERF_BREAKDOWN_r04): when ``root`` is the 2^s-th root of
    ``full_flow`` from scaling-and-squaring (``integrate_vec_batched`` with
    ``return_root_steps=s``) and its displacements are bounded by ``halo``,

        vols ∘ full_flow  ==  ((vols ∘ root) ∘ root) ... (2^s times)

    up to interpolation error — the same first-order composition identity
    scaling-and-squaring itself uses, applied image-side instead of
    field-side (the reference composes fields then gathers once,
    tf/utils/utils.py:407-410; this composes the image through the bounded
    Pallas kernel, which is a single sequential HBM pass per application).
    Each application resamples the image, so the result carries 2^s
    trilinear smoothings instead of 1 — pos_flow (and thus any seg
    transport / Dice evaluation) is unaffected.

    Falls back to the one-shot gather by ``full_flow`` (exact reference
    semantics) whenever max|root| exceeds ``halo`` at runtime.
    """
    def fast(args):
        v, r, _ = args
        for _ in range(n_apps):
            v = _windowed_impl_batched(v, r, halo)
        return v.astype(jnp.float32)

    def slow(args):
        v, _, p = args
        out = jax.vmap(lambda vv, pp: transform(vv, pp, window_halo=None))(v, p)
        return out.astype(jnp.float32)

    return jax.lax.cond(
        jnp.max(jnp.abs(root)) <= float(halo), fast, slow,
        (vols, root, full_flow))


def batch_transform(
    vol: jnp.ndarray,
    loc_shift: jnp.ndarray,
    interp_method: str = "linear",
    fill_value: Optional[float] = None,
) -> jnp.ndarray:
    """Batched channelwise transform: vol (B, *S, C), loc_shift (B, *S', C, N).

    Also accepts loc_shift (B, *S', N), broadcast across channels. Implemented
    with vmap over the batch (the reference reshapes batch into channels;
    tf/utils/utils.py:177-250).
    """
    # window_halo=None: these transforms run under vmap, where a lax.cond
    # would execute both branches (see module comment at `transform`).
    if loc_shift.ndim == vol.ndim:
        fn = lambda v, s: transform(v, s, interp_method=interp_method,
                                    fill_value=fill_value, window_halo=None)
    elif loc_shift.ndim == vol.ndim + 1:
        fn = lambda v, s: transform(v, s, interp_method=interp_method,
                                    fill_value=fill_value, window_halo=None)
    else:
        raise ValueError(
            f"loc_shift rank {loc_shift.ndim} incompatible with vol rank {vol.ndim}"
        )
    return jax.vmap(fn)(vol, loc_shift)


def compose(
    transforms: Sequence[jnp.ndarray],
    interp_method: str = "linear",
    shift_center: bool = True,
    shape: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Compose transforms listed in application order: compose([A, B, C])(x) = C(B(A(x))).

    Affine-only chains stay affine (matrix product); any dense member makes
    the result dense. Matches tf/utils/utils.py:253-318.
    """
    if len(transforms) == 0:
        raise ValueError("Compose transform list cannot be empty")

    curr = None
    for nxt in reversed([jnp.asarray(t) for t in transforms]):
        if not jnp.issubdtype(nxt.dtype, jnp.floating):
            nxt = nxt.astype(jnp.float32)
        if curr is None:
            curr = nxt
            continue

        if not is_affine_shape(nxt.shape):
            # Dense on the left of the chain position: warp-compose.
            if is_affine_shape(curr.shape):
                curr = affine_to_dense_shift(
                    curr,
                    shape=nxt.shape[:-1] if shape is None else shape,
                    shift_center=shift_center,
                )
            curr = curr + transform(nxt, curr, interp_method=interp_method,
                                    window_halo=None)
        elif not is_affine_shape(curr.shape):
            # Matrix left, dense right: fold the dense warp into the matmul.
            curr = affine_to_dense_shift(
                nxt, shape=curr.shape[:-1], shift_center=shift_center, warp_right=curr
            )
        else:
            curr = (make_square_affine(nxt) @ make_square_affine(curr))[:-1]

    return curr


def rescale_dense_transform(trf: jnp.ndarray, factor, interp_method: str = "linear") -> jnp.ndarray:
    """Resize a dense warp and rescale its vectors by ``factor``.

    Multiplies in the smaller space to save HBM traffic (same trick as the
    reference, tf/utils/utils.py:331-339). Accepts batched or single fields.
    """

    def single(f):
        if factor < 1:
            f = resize(f, factor, interp_method=interp_method)
            return f * factor
        f = f * factor
        return resize(f, factor, interp_method=interp_method)

    ndims = trf.shape[-1]
    if trf.ndim > ndims + 1:  # batched
        return jax.vmap(single)(trf)
    return single(trf)


def integrate_vec(
    vec: jnp.ndarray,
    method: str = "ss",
    nb_steps: int = 7,
    remat: bool = True,
    out_time_pt: float = 1.0,
    time_dep: bool = False,
) -> jnp.ndarray:
    """Integrate a (stationary or time-dependent) velocity field.

    Methods (semantics per tf/utils/utils.py:350-462, integrating to time 1):
      'ss' (scaling and squaring): ``v /= 2**n`` then n self-compositions
        ``v <- v + v o (id + v)``. With ``time_dep``, ``vec`` has a leading
        time axis of length 2**n and adjacent pairs are composed per level.
      'quadrature': ``v /= n`` then n-1 compositions of the scaled field
        along the running displacement (time-dep: one field per step).
      'ode': fixed-step RK4 on ``d(disp)/dt = vec o (id + disp)`` from 0 to
        ``out_time_pt`` in nb_steps steps (replaces tf.contrib odeint).

    Args:
      vec: ``(*vol_shape, N)`` velocity field (single sample; vmap for
        batch), or ``(T, *vol_shape, N)`` when ``time_dep``.
      remat: rematerialize each step in the backward pass, trading recompute
        for not keeping every intermediate field in HBM.
    """
    # This single-sample function is routinely wrapped in jax.vmap (VecInt's
    # non-ss path, labels_to_image, batch_transform); a vmapped lax.cond runs
    # BOTH branches (select semantics), so the adaptive windowed fast path is
    # explicitly disabled here. Batched callers that want it should use
    # integrate_vec_batched, which hoists one cond above the whole batch.
    _t = lambda a, b: transform(a, b, window_halo=None)
    if method in ("ss", "scaling_and_squaring"):
        assert nb_steps >= 0, f"nb_steps should be >= 0, found: {nb_steps}"
        if time_dep:
            assert vec.shape[0] == 2 ** nb_steps, \
                "time_dep ss needs a leading time axis of length 2**nb_steps"
            svec = vec / (2.0 ** nb_steps)
            for _ in range(nb_steps):
                pair = lambda a, b: b + _t(a, b)
                if remat:
                    pair = jax.checkpoint(pair)
                svec = jax.vmap(pair)(svec[1::2], svec[0::2])
            return svec[0]
        vec = vec / (2.0 ** nb_steps)
        step = lambda v: v + _t(v, v)
        if remat:
            step = jax.checkpoint(step)
        for _ in range(nb_steps):
            vec = step(vec)
        return vec
    elif method == "quadrature":
        assert nb_steps >= 1, f"nb_steps should be >= 1, found: {nb_steps}"
        vec = vec / nb_steps
        if time_dep:
            disp = vec[0]
            for si in range(nb_steps - 1):
                disp = disp + _t(vec[si + 1], disp)
            return disp
        disp = vec
        step = lambda d: d + _t(vec, d)
        if remat:
            step = jax.checkpoint(step)
        for _ in range(nb_steps - 1):
            disp = step(disp)
        return disp
    elif method == "ode":
        assert not time_dep, "ode not implemented for time-dependent fields"
        assert nb_steps >= 1, f"nb_steps should be >= 1, found: {nb_steps}"
        h = out_time_pt / nb_steps
        f = lambda d: _t(vec, d)

        def rk4_step(d):
            k1 = f(d)
            k2 = f(d + 0.5 * h * k1)
            k3 = f(d + 0.5 * h * k2)
            k4 = f(d + h * k3)
            return d + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        if remat:
            rk4_step = jax.checkpoint(rk4_step)
        disp = jnp.zeros_like(vec)
        for _ in range(nb_steps):
            disp = rk4_step(disp)
        return disp
    raise ValueError(f"method must be 'ss', 'quadrature', or 'ode', found: {method}")


def point_spatial_transformer(
    points: jnp.ndarray, trf: jnp.ndarray, sdt_vol_resize: float = 1.0
) -> jnp.ndarray:
    """Warp surface points with a dense transform (single sample).

    The displacement field that moves image A->B lives in B-space, so it maps
    *points* from B to A by direct interpolation at the point locations
    (tf/utils/utils.py:465-499). Points may carry one trailing extra feature
    (e.g. an SDT resize factor) which is passed through untouched.
    """
    trf = trf * sdt_vol_resize
    pts_d = points.shape[-1]
    trf_d = trf.shape[-1]
    assert pts_d in (trf_d, trf_d + 1)
    extra = None
    if pts_d == trf_d + 1:
        extra = points[..., -1:]
        points = points[..., :-1]
    diff = interpn(trf, points, interp_method="linear")
    out = points + diff
    if extra is not None:
        out = jnp.concatenate([out, extra], axis=-1)
    return out


def value_at_location(
    vol: jnp.ndarray, points: jnp.ndarray, force_post_absolute_val: bool = True
) -> jnp.ndarray:
    """Interpolate a volume at a point cloud (single sample); optional abs().

    When the point coordinates cover every axis of ``vol`` (e.g. D spatial
    dims + a label-channel index), the result gains a trailing singleton
    channel — matching the reference's interpn output shape (M, 1).
    """
    out = interpn(vol, points, interp_method="linear")
    if out.ndim == points.ndim - 1:
        out = out[..., None]
    return jnp.abs(out) if force_post_absolute_val else out


def jacobian_determinant(disp: jnp.ndarray) -> jnp.ndarray:
    """Jacobian determinant of a dense displacement (single sample, jnp).

    ``disp`` is (*vol_shape, N) with N = 2 or 3; the Jacobian is of id + disp
    with central differences (np.gradient convention), mirroring the
    reference's numpy version (/root/reference/voxelmorph/py/utils.py:473-516).
    """
    nd = disp.shape[-1]
    assert nd in (2, 3), "flow has to be 2D or 3D"
    grid = ndgrid(disp.shape[:-1], dtype=disp.dtype)
    J = jnp.stack(jnp.gradient(grid + disp, axis=tuple(range(nd))), axis=-1)
    # J[..., i, j] = d(phi_i)/d(x_j)
    if nd == 3:
        return jnp.linalg.det(J)
    return jnp.linalg.det(J)
