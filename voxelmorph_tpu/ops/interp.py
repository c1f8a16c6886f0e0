"""N-D interpolation primitives (the TPU rebuild of the reference's gather path).

This module owns the *warp gather*: sampling an N-D volume at continuous
locations. It is the hot kernel of the whole framework — the reference
delegates it to ``ne.utils.interpn`` (cited: /root/reference/voxelmorph/tf/
utils/utils.py:174) which lowers to per-voxel ``tf.gather`` calls. Two
implementations exist here:

  * this file's pure-jnp corner-table formulation: ONE row-gather per voxel
    from a table holding all 2^N cell corners (general: any displacement
    magnitude, any N);
  * ``voxelmorph_tpu.ops.pallas_interp.warp_bounded``: a Pallas TPU kernel
    for the bounded-displacement dense warp (|shift| <= halo), the case that
    dominates scaling-and-squaring integration — single HBM pass, no corner
    table. ``ops.warp.transform`` dispatches between them at runtime.

Conventions (matching the reference exactly):
  * ij (matrix) indexing everywhere; xy indexing does not exist.
  * ``linear`` interpolation clamps out-of-bounds samples to the volume edge
    unless ``fill_value`` is given, in which case any location with a
    coordinate outside ``[0, dim-1]`` in *any* dimension gets ``fill_value``.
  * ``nearest`` rounds then clamps, with the same fill semantics.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "interpn",
    "point_interpn",
    "resize",
    "ndgrid",
    "volshape_to_meshgrid",
]


def ndgrid(shape: Sequence[int], dtype=jnp.float32, stacked: bool = True):
    """ij-indexed coordinate grid for ``shape``.

    Returns an array of shape ``(*shape, N)`` when ``stacked`` (the common
    case for building dense warps) or a list of N ``(*shape,)`` arrays.
    """
    axes = [jnp.arange(s, dtype=dtype) for s in shape]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    if stacked:
        return jnp.stack(mesh, axis=-1)
    return mesh


def volshape_to_meshgrid(shape: Sequence[int], indexing: str = "ij", dtype=jnp.float32):
    """Reference-API alias (ne.utils.volshape_to_meshgrid): list of coord arrays."""
    if indexing != "ij":
        raise ValueError("only ij indexing is supported (xy was removed upstream)")
    return ndgrid(shape, dtype=dtype, stacked=False)


# Above this corner-table footprint (V * 2^N * C * itemsize) the generic
# linear gather switches to per-corner accumulation — the half-res SynthMorph
# one-hot warp (860k voxels x 8 x ~31ch ~= 850 MB) stays on the single-gather
# table, full-res (26 GB) cannot.
_CORNER_TABLE_BYTES_LIMIT = 1 << 30


def _flatten_strides(spatial: Sequence[int]) -> list:
    """Row-major strides of a spatial shape, for linearizing ND indices."""
    strides = []
    acc = 1
    for s in reversed(spatial):
        strides.append(acc)
        acc *= s
    return list(reversed(strides))


def _gather_flat(vol_flat: jnp.ndarray, lin_idx: jnp.ndarray) -> jnp.ndarray:
    """vol_flat: (V, C); lin_idx: (...,) int32 -> (..., C)."""
    return jnp.take(vol_flat, lin_idx, axis=0)


@functools.lru_cache(maxsize=None)
def _linear_gather_1ch(spatial: tuple, dtype_name: str):
    """Single-channel multilinear gather with a hand-written dense VJP.

    Forward is the corner-table single-gather (see ``interpn``). The
    autodiff backward of that formulation materializes a zeros-init
    scatter operand of shape (M, 2^N) whose 2^N minor dim lane-pads 16x
    on TPU — measured as a 14.1 GB `broadcast(constant)` HLO temp in the
    batch-4 full-res train step's OOM dump. This custom VJP instead
    accumulates per-corner (M,) vectors: one rank-1 scatter-add per corner
    for d/dvol and pure elementwise math for d/dloc, so every backward
    buffer tiles densely. Gradient semantics exactly mirror autodiff of
    the forward ops, including the clamp-to-edge behavior (clip passes
    gradient at the boundary value itself, blocks it beyond).
    """
    nd = len(spatial)
    strides = _flatten_strides(spatial)
    max_loc = [s - 1 for s in spatial]
    V = 1
    for s in spatial:
        V *= int(s)
    ncorners = 2 ** nd
    corner_bits = [[(c >> d) & 1 for d in range(nd)] for c in range(ncorners)]
    offsets = [int(sum(b * s for b, s in zip(bits, strides)))
               for bits in corner_bits]
    wdtype = jnp.dtype(dtype_name)

    def _weights(loc_dims):
        idx0 = [jnp.clip(jnp.floor(l).astype(jnp.int32), 0, m)
                for l, m in zip(loc_dims, max_loc)]
        w1 = [jnp.clip(l, 0.0, m) - i.astype(wdtype)
              for l, m, i in zip(loc_dims, max_loc, idx0)]
        w0 = [1.0 - w for w in w1]
        lin0 = functools.reduce(
            jnp.add, [i * s for i, s in zip(idx0, strides)])
        return w0, w1, lin0

    def _corner_w(w0, w1, bits):
        return functools.reduce(
            jnp.multiply, [w1[d] if b else w0[d] for d, b in enumerate(bits)])

    @jax.custom_vjp
    def gather(vol_flat, *loc_dims):
        # vol_flat: (V,); loc_dims: nd x (M,) -> (M,)
        w0, w1, lin0 = _weights(loc_dims)
        table = jnp.concatenate(
            [jnp.roll(vol_flat, -off)[:, None] for off in offsets], axis=-1)
        gathered = jnp.take(table, lin0, axis=0)  # (M, 2^N)
        wts = jnp.stack([_corner_w(w0, w1, bits) for bits in corner_bits],
                        axis=-1)
        return jnp.sum(gathered * wts, axis=-1)

    def fwd(vol_flat, *loc_dims):
        return gather(vol_flat, *loc_dims), (vol_flat, loc_dims)

    def _bwd_narrow(res, g):
        vol_flat, loc_dims = res
        w0, w1, lin0 = _weights(loc_dims)
        # clip passes gradient at the boundary value itself (lax.max/min
        # tie convention), blocks it strictly beyond
        mask = [((l >= 0) & (l <= m)).astype(g.dtype)
                for l, m in zip(loc_dims, max_loc)]
        acc_dtype = jnp.promote_types(vol_flat.dtype, g.dtype)
        dvol = jnp.zeros(vol_flat.shape, acc_dtype)
        dloc = [jnp.zeros_like(g) for _ in range(nd)]
        for bits, off in zip(corner_bits, offsets):
            rows = (lin0 + off) % V  # roll-equivalent wrap; wrapped corners
            # carry identically-zero weights (see interpn notes)
            w_c = _corner_w(w0, w1, bits)
            dvol = dvol.at[rows].add((g * w_c).astype(acc_dtype))
            gv = g * jnp.take(vol_flat, rows)
            for d in range(nd):
                others = [w1[dd] if bb else w0[dd]
                          for dd, bb in enumerate(bits) if dd != d]
                w_oth = (functools.reduce(jnp.multiply, others)
                         if others else jnp.ones_like(g))
                term = gv * w_oth
                dloc[d] = dloc[d] + (term if bits[d] else -term)
        dloc = [dl * mk for dl, mk in zip(dloc, mask)]
        return (dvol.astype(vol_flat.dtype), *dloc)

    def _bwd_wide(res, g):
        """Corner-table backward: the narrow variant issues 2^N single-value
        gathers (for d/dloc) and 2^N single-value scatter-adds (for d/dvol)
        per voxel — each a separate 4-byte-row memory transaction stream.
        This variant reuses the forward's insight in reverse: ONE gather
        from the (V, 2^N) corner table for all corner values, and ONE
        2^N-wide scatter-add whose columns are rolled back into place, so
        every transaction moves a full row. Mathematically identical
        (scatter into column c at row r == scatter into r + off_c after the
        roll; wrapped rows carry zero weights)."""
        vol_flat, loc_dims = res
        w0, w1, lin0 = _weights(loc_dims)
        mask = [((l >= 0) & (l <= m)).astype(g.dtype)
                for l, m in zip(loc_dims, max_loc)]
        acc_dtype = jnp.promote_types(vol_flat.dtype, g.dtype)
        table = jnp.concatenate(
            [jnp.roll(vol_flat, -off)[:, None] for off in offsets], axis=-1)
        corner_vals = jnp.take(table, lin0, axis=0)  # (M, 2^N)
        dloc = [jnp.zeros_like(g) for _ in range(nd)]
        col_grads = []
        for ci, bits in enumerate(corner_bits):
            w_c = _corner_w(w0, w1, bits)
            col_grads.append((g * w_c).astype(acc_dtype))
            gv = g * corner_vals[:, ci]
            for d in range(nd):
                others = [w1[dd] if bb else w0[dd]
                          for dd, bb in enumerate(bits) if dd != d]
                w_oth = (functools.reduce(jnp.multiply, others)
                         if others else jnp.ones_like(g))
                term = gv * w_oth
                dloc[d] = dloc[d] + (term if bits[d] else -term)
        sc = jnp.zeros((V, ncorners), acc_dtype)
        sc = sc.at[lin0].add(jnp.stack(col_grads, axis=-1))
        dvol = functools.reduce(jnp.add, [
            jnp.roll(sc[:, ci], offsets[ci]) for ci in range(ncorners)])
        dloc = [dl * mk for dl, mk in zip(dloc, mask)]
        return (dvol.astype(vol_flat.dtype), *dloc)

    def bwd(res, g):
        # trace-time selection; flip with VXM_GATHER_BWD=narrow if the wide
        # table layout ever misbehaves on a new toolchain
        if os.environ.get("VXM_GATHER_BWD", "wide") == "narrow":
            return _bwd_narrow(res, g)
        return _bwd_wide(res, g)

    gather.defvjp(fwd, bwd)
    return gather


@functools.lru_cache(maxsize=None)
def _linear_gather_wide(spatial: tuple, nch: int, dtype_name: str):
    """Channels-first multilinear gather for wide-channel volumes with a
    low-residual custom VJP.

    Forward: 2^N sequential per-corner gathers from a (C, V) channels-first
    volume — no corner table (V * 2^N * C would be 26 GB at full res with 30
    one-hot channels) and no flat channels-minor intermediates (an (M, 30)
    tensor takes the (8,128) lane tile with 30 padded to 128: 4.3x).

    The custom VJP exists for memory, not speed: autodiff of the per-corner
    loop saves every corner's (C, M) gather result as a residual for the
    weight-product backward — measured as ~8 simultaneously-live 900 MB
    buffers in the full-res SynthMorph train step. This backward recomputes
    each corner value from the saved volume instead (one extra gather per
    corner), so residuals are just the volume and the N coordinate vectors.
    Gradient semantics mirror the narrow/table paths exactly (clip passes
    gradient at the boundary value, blocks it strictly beyond).
    """
    nd = len(spatial)
    strides = _flatten_strides(spatial)
    max_loc = [s - 1 for s in spatial]
    ncorners = 2 ** nd
    corner_bits = [[(c >> d) & 1 for d in range(nd)] for c in range(ncorners)]
    offsets = [int(sum(b * s for b, s in zip(bits, strides)))
               for bits in corner_bits]
    wdtype = jnp.dtype(dtype_name)

    def _weights(loc_dims):
        idx0 = [jnp.clip(jnp.floor(l).astype(jnp.int32), 0, m)
                for l, m in zip(loc_dims, max_loc)]
        w1 = [jnp.clip(l, 0.0, m) - i.astype(wdtype)
              for l, m, i in zip(loc_dims, max_loc, idx0)]
        w0 = [1.0 - w for w in w1]
        lin0 = functools.reduce(
            jnp.add, [i * s for i, s in zip(idx0, strides)])
        return w0, w1, lin0

    def _corner_w(w0, w1, bits):
        return functools.reduce(
            jnp.multiply, [w1[d] if b else w0[d] for d, b in enumerate(bits)])

    @jax.custom_vjp
    def gather(vol_cf, *loc_dims):
        # vol_cf: (C, V); loc_dims: nd x (M,) -> (C, M)
        w0, w1, lin0 = _weights(loc_dims)
        out = None
        for bits, off in zip(corner_bits, offsets):
            w_c = _corner_w(w0, w1, bits)
            corner = jnp.take(vol_cf, lin0 + off, axis=1, mode="clip")
            term = corner * w_c[None, :]
            out = term if out is None else out + term
        return out

    def fwd(vol_cf, *loc_dims):
        return gather(vol_cf, *loc_dims), (vol_cf, loc_dims)

    def bwd(res, g):
        vol_cf, loc_dims = res
        w0, w1, lin0 = _weights(loc_dims)
        mask = [((l >= 0) & (l <= m)).astype(g.dtype)
                for l, m in zip(loc_dims, max_loc)]
        acc_dtype = jnp.promote_types(vol_cf.dtype, g.dtype)
        dvol = jnp.zeros(vol_cf.shape, acc_dtype)
        dloc = [jnp.zeros(lin0.shape, g.dtype) for _ in range(nd)]
        for bits, off in zip(corner_bits, offsets):
            rows = jnp.clip(lin0 + off, 0, vol_cf.shape[1] - 1)
            w_c = _corner_w(w0, w1, bits)
            dvol = dvol.at[:, rows].add((g * w_c[None, :]).astype(acc_dtype))
            corner = jnp.take(vol_cf, rows, axis=1)  # recompute, (C, M)
            gv = jnp.sum(g * corner, axis=0)  # (M,) — dloc sums channels
            for d in range(nd):
                others = [w1[dd] if bb else w0[dd]
                          for dd, bb in enumerate(bits) if dd != d]
                w_oth = (functools.reduce(jnp.multiply, others)
                         if others else jnp.ones_like(gv))
                term = gv * w_oth
                dloc[d] = dloc[d] + (term if bits[d] else -term)
        dloc = [dl * mk for dl, mk in zip(dloc, mask)]
        return (dvol.astype(vol_cf.dtype), *dloc)

    gather.defvjp(fwd, bwd)
    return gather


def interpn(
    vol: jnp.ndarray,
    loc: jnp.ndarray,
    interp_method: str = "linear",
    fill_value: Optional[float] = None,
) -> jnp.ndarray:
    """Interpolate an N-D volume at continuous ij locations.

    Args:
      vol: ``(*spatial, C)`` or ``(*spatial,)`` array. If no channel axis is
        present one is added and removed transparently.
      loc: ``(*out_shape, N)`` float locations, ``N == len(spatial)``.
      interp_method: 'linear' (multilinear) or 'nearest'.
      fill_value: value for out-of-domain samples; None clamps to edge.

    Returns:
      ``(*out_shape, C)`` (or ``(*out_shape,)`` if vol had no channel axis).
    """
    nd = loc.shape[-1]
    squeeze_channel = vol.ndim == nd
    if squeeze_channel:
        vol = vol[..., None]
    if vol.ndim != nd + 1:
        raise ValueError(
            f"vol rank {vol.ndim} incompatible with {nd}-D locations "
            f"(expected {nd} spatial dims + 1 channel dim)"
        )
    spatial = vol.shape[:-1]
    nch = vol.shape[-1]

    compute_dtype = loc.dtype if jnp.issubdtype(loc.dtype, jnp.floating) else jnp.float32
    loc = loc.astype(compute_dtype)
    if not jnp.issubdtype(vol.dtype, jnp.floating):
        vol = vol.astype(compute_dtype)

    out_shape = loc.shape[:-1]
    # Unstack coordinates into per-dimension (M,) arrays IMMEDIATELY. Any
    # (M, nd) intermediate is poison on TPU: if XLA materializes one (remat
    # residual, scan carry, layout copy), the minor dim nd=3 pads to a 128
    # lane tile — a 42x HBM expansion (measured: five 78 MB coordinate
    # tensors held as 3.28 GB EACH in the probabilistic train step's OOM
    # dump). Per-dim (M,) vectors tile densely no matter where they land.
    loc_dims = [loc[..., d].reshape(-1) for d in range(nd)]  # nd x (M,)
    vol_flat = vol.reshape(-1, nch)  # (V, C)
    strides = _flatten_strides(spatial)  # python ints
    max_loc = [s - 1 for s in spatial]

    if interp_method == "nearest":
        lin = functools.reduce(jnp.add, [
            jnp.clip(jnp.round(l).astype(jnp.int32), 0, m) * s
            for l, m, s in zip(loc_dims, max_loc, strides)
        ])
        out = _gather_flat(vol_flat, lin)
    elif interp_method == "linear" and nch == 1:
        # the hot path (image warps at the canonical volume): corner-table
        # single-gather forward + hand-written dense-layout VJP — autodiff
        # of the generic path below builds a (M, 2^N)-shaped scatter zeros
        # whose minor dim lane-pads 16x (14.1 GB at batch 4, full res)
        core = _linear_gather_1ch(tuple(int(s) for s in spatial),
                                  jnp.dtype(compute_dtype).name)
        out = core(vol_flat[:, 0], *loc_dims)[:, None]
    elif interp_method == "linear":
        # Per-dim floor index and corner-1 weight; corner 0 gets (1 - w). At
        # the top edge the +1 neighbor would clip to the same voxel and its
        # weight collapses to 0, so the result is the edge value — matching
        # the reference's clamp semantics.
        idx0 = [jnp.clip(jnp.floor(l).astype(jnp.int32), 0, m)
                for l, m in zip(loc_dims, max_loc)]  # nd x (M,)
        w1 = [jnp.clip(l, 0.0, m) - i.astype(compute_dtype)
              for l, m, i in zip(loc_dims, max_loc, idx0)]  # nd x (M,)
        w0 = [1.0 - w for w in w1]

        # TPU gathers cost ~the same per transaction whether a row holds 1 or
        # 128 values, so instead of 2^N scalar gathers per voxel we gather
        # ONCE from a corner table whose row i holds all 2^N cell-corner
        # values of cell i (built with cheap contiguous shifts). Rows whose
        # +1 neighbor would fall off the volume contribute only corners with
        # zero weight (see above), so the wrap-around garbage is harmless.
        ncorners = 2**nd
        corner_bits = [[(c >> d) & 1 for d in range(nd)] for c in range(ncorners)]
        offsets = [
            int(sum(b * s for b, s in zip(bits, strides)))
            for bits in corner_bits
        ]
        lin0 = functools.reduce(
            jnp.add, [i * s for i, s in zip(idx0, strides)])  # (M,)
        table_bytes = (int(vol_flat.shape[0]) * ncorners * nch
                       * jnp.dtype(compute_dtype).itemsize)
        if nch > 1 and table_bytes > _CORNER_TABLE_BYTES_LIMIT:
            # Wide-channel volumes (e.g. SynthMorph's full-res 30-label
            # one-hot maps): the corner table would materialize V * 2^N * C
            # — 26 GB at 160x192x224 x 30 channels (measured compile-time
            # OOM: f32[1,6881280,8,30]). Accumulate per corner instead: 2^N
            # sequential gathers with no table, processed CHANNELS-FIRST —
            # a flat channels-minor (M, 30) intermediate takes the (8,128)
            # lane tile with 30 padded to 128 (4.3x; measured as eight live
            # 3.28 GB buffers in the scanned synth step), while (C, M) rows
            # tile densely. Rows past the volume end (upper-edge cells)
            # clamp under take's clip mode and carry identically-zero
            # weights, so the clamped garbage never contributes.
            vol_cf = jnp.moveaxis(vol, -1, 0).reshape(nch, -1)  # (C, V)
            core = _linear_gather_wide(tuple(int(s) for s in spatial),
                                       int(nch),
                                       jnp.dtype(compute_dtype).name)
            out_cf = core(vol_cf, *loc_dims)  # (C, M)
            if fill_value is not None:
                valid = functools.reduce(jnp.logical_and, [
                    (l >= 0) & (l <= m) for l, m in zip(loc_dims, max_loc)
                ])
                out_cf = jnp.where(valid[None, :], out_cf,
                                   jnp.asarray(fill_value, out_cf.dtype))
            # leave flat-land before transposing: the 1+N-D intermediate
            # lets XLA place the channel axis off the lane dim
            out = jnp.moveaxis(out_cf.reshape(nch, *out_shape), 0, -1)
            if squeeze_channel:
                out = out[..., 0]
            return out
        else:
            table = jnp.concatenate(
                [jnp.roll(vol_flat, -off, axis=0) for off in offsets], axis=-1
            )  # (V, 2^N * C)
            gathered = jnp.take(table, lin0, axis=0)  # (M, 2^N * C)

            wts = jnp.stack(
                [
                    functools.reduce(
                        jnp.multiply,
                        [w1[d] if b else w0[d] for d, b in enumerate(bits)],
                    )
                    for bits in corner_bits
                ],
                axis=-1,
            )  # (M, 2^N)
            # weighted corner reduction as multiply + reduce, NOT einsum: a
            # dot formulation forces a layout copy of the rank-3 gather
            # result, and inside lax.scan XLA materializes it with the
            # trailing unit dim padded to a 128 lane tile (measured: a 220 MB
            # table copied as 28 GB at 160x192x224, C=1). Elementwise ops
            # fuse into the gather instead.
            if nch == 1:
                out = jnp.sum(gathered * wts, axis=-1, keepdims=True)
            else:
                out = jnp.sum(
                    gathered.reshape(-1, ncorners, nch) * wts[..., None],
                    axis=-2)
    else:
        raise ValueError(f"interp_method must be 'linear' or 'nearest', got {interp_method}")

    if fill_value is not None:
        valid = functools.reduce(jnp.logical_and, [
            (l >= 0) & (l <= m) for l, m in zip(loc_dims, max_loc)
        ])
        out = jnp.where(valid[:, None], out, jnp.asarray(fill_value, out.dtype))

    out = out.reshape(*out_shape, nch)
    if squeeze_channel:
        out = out[..., 0]
    return out


def point_interpn(vol, points, interp_method: str = "linear"):
    """Interpolate ``vol`` (``(*S, C)``) at a point cloud ``(M, N)``."""
    return interpn(vol, points, interp_method=interp_method)


def interpn_label_onehot(image, lab_idx, loc, nb_labels: int):
    """Jointly interpolate a scalar image and the ONE-HOT encoding of an
    integer label map at continuous ij locations.

    Numerically identical to
        ``interpn(concat([image[..., None], one_hot(lab_idx, L)], -1), loc)``
    (clamp-to-edge semantics), but exploits the one-hot structure: each cell
    corner holds exactly one non-zero channel, so the multilinear blend of L
    one-hot channels equals scattering each corner's weight into the channel
    named by the INTEGER map at that corner. That turns 2^N gathers of
    (L+1)-channel rows into 2^N gathers of 2 scalars (image + label) plus an
    in-register compare against ``arange(L)`` — at full resolution with the
    ~30-label FreeSurfer set this is ~15x less gather traffic than the
    wide-channel path (`_linear_gather_wide`), the measured bottleneck of the
    full-res SynthMorph train step.

    The one-hot accumulates CHANNELS-FIRST (an (M, L) channels-minor
    intermediate lane-pads L->128; see interpn's wide-channel note).

    Synthesis-path helper (the reference warps image and one-hot maps with a
    shared fused gather: tf/networks.py labels_to_image); intended for the
    forward-only data-synthesis path — it is differentiable via autodiff,
    but has no memory-lean custom VJP like interpn's.

    Args:
      image: ``(*S,)`` float image.
      lab_idx: ``(*S,)`` integer label map, values in ``[0, nb_labels)``.
      loc: ``(*S', N)`` continuous ij sample locations.
      nb_labels: L, the one-hot width.

    Returns:
      ``(image_out (*S',), one_hot (*S', L))``.
    """
    nd = loc.shape[-1]
    spatial = image.shape
    assert lab_idx.shape == tuple(spatial)
    compute_dtype = loc.dtype if jnp.issubdtype(loc.dtype, jnp.floating) else jnp.float32
    loc = loc.astype(compute_dtype)
    out_shape = loc.shape[:-1]
    loc_dims = [loc[..., d].reshape(-1) for d in range(nd)]
    strides = _flatten_strides(spatial)
    max_loc = [s - 1 for s in spatial]
    V = int(image.size)

    idx0 = [jnp.clip(jnp.floor(l).astype(jnp.int32), 0, m)
            for l, m in zip(loc_dims, max_loc)]
    w1 = [jnp.clip(l, 0.0, m) - i.astype(compute_dtype)
          for l, m, i in zip(loc_dims, max_loc, idx0)]
    w0 = [1.0 - w for w in w1]
    lin0 = functools.reduce(jnp.add, [i * s for i, s in zip(idx0, strides)])

    ncorners = 2 ** nd
    corner_bits = [[(c >> d) & 1 for d in range(nd)] for c in range(ncorners)]
    offsets = [int(sum(b * s for b, s in zip(bits, strides)))
               for bits in corner_bits]

    img_flat = image.astype(compute_dtype).reshape(-1)
    lab_flat = lab_idx.reshape(-1)
    labels = jnp.arange(nb_labels, dtype=lab_flat.dtype)

    img_acc = None
    oh_acc = None  # (L, M) channels-first
    for bits, off in zip(corner_bits, offsets):
        w_c = functools.reduce(
            jnp.multiply, [w1[d] if b else w0[d] for d, b in enumerate(bits)])
        # upper-edge cells: the +1 row clamps and carries weight exactly 0
        rows = jnp.clip(lin0 + off, 0, V - 1)
        img_c = jnp.take(img_flat, rows)
        lab_c = jnp.take(lab_flat, rows)
        oh_c = (lab_c[None, :] == labels[:, None]).astype(compute_dtype)
        img_term = w_c * img_c
        oh_term = w_c[None, :] * oh_c
        img_acc = img_term if img_acc is None else img_acc + img_term
        oh_acc = oh_term if oh_acc is None else oh_acc + oh_term

    one_hot = jnp.moveaxis(oh_acc.reshape(nb_labels, *out_shape), 0, -1)
    return img_acc.reshape(out_shape), one_hot


import numpy as _np


def _resize_matrix(n_in: int, n_out: int, factor: float, interp_method: str) -> _np.ndarray:
    """(n_out, n_in) interpolation matrix sampling at arange(n_out)/factor,
    edge-clamped — the separable building block of ``resize``."""
    coords = _np.arange(n_out, dtype=_np.float64) / factor
    coords = _np.clip(coords, 0, n_in - 1)
    W = _np.zeros((n_out, n_in), dtype=_np.float32)
    if interp_method == "nearest":
        idx = _np.clip(_np.round(coords).astype(int), 0, n_in - 1)
        W[_np.arange(n_out), idx] = 1.0
    else:
        lo = _np.clip(_np.floor(coords).astype(int), 0, n_in - 1)
        hi = _np.clip(lo + 1, 0, n_in - 1)
        w_hi = (coords - lo).astype(_np.float32)
        rows = _np.arange(n_out)
        # accumulate (lo may equal hi at the top edge)
        _np.add.at(W, (rows, lo), 1.0 - w_hi)
        _np.add.at(W, (rows, hi), w_hi)
    return W


def resize(
    vol: jnp.ndarray,
    zoom_factor,
    interp_method: str = "linear",
    new_shape: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Resize a single (non-batched) volume by a zoom factor.

    Mirrors ``ne.utils.resize`` semantics used by the reference's
    RescaleTransform (/root/reference/voxelmorph/tf/utils/utils.py:321-347):
    output size is ``ceil(dim * factor)`` per spatial dim and samples are taken
    at ``arange(new_dim) / factor`` in input coordinates (edge-clamped).

    TPU mechanics: regular-grid resampling is separable, so instead of an
    N-D gather this is one small dense matmul per axis — it runs on the MXU
    and is ~100x faster than the gather formulation at volume scale.

    The last axis is treated as channels and never resized.
    """
    spatial = vol.shape[:-1]
    nd = len(spatial)
    if not isinstance(zoom_factor, (list, tuple)):
        zoom_factor = [float(zoom_factor)] * nd
    if new_shape is None:
        new_shape = [int(math.ceil(s * f)) for s, f in zip(spatial, zoom_factor)]
    if tuple(new_shape) == tuple(spatial) and all(f == 1 for f in zoom_factor):
        return vol

    out = vol
    for axis in range(nd):
        n_in = out.shape[axis]
        n_out = int(new_shape[axis])
        if n_in == n_out and zoom_factor[axis] == 1:
            continue
        W = jnp.asarray(_resize_matrix(n_in, n_out, zoom_factor[axis], interp_method))
        out = jnp.moveaxis(
            jnp.tensordot(W, out, axes=([1], [axis])), 0, axis)
    return out
