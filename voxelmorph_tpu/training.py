"""Training engine: jitted/sharded train steps, loss wiring, prefetch,
checkpointing, metrics.

Replaces the reference's Keras ``model.compile(...)+fit(...)`` path
(scripts/tf/train.py:188-199) with an explicit JAX loop: one jitted
(optionally mesh-sharded) step function with donated buffers, a host-side
double-buffering prefetcher so data loading overlaps device compute, and
periodic self-describing checkpoints.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models import modelio
from .parallel import mesh as mesh_lib

__all__ = ["LossTerm", "make_train_step", "Trainer", "prefetch",
           "find_latest_checkpoint", "init_or_resume", "enable_compile_cache",
           "resolve_dtype",
           "device_cached_pair_generator", "device_cached_label_generator",
           "device_cached_semisupervised_generator"]


class LossTerm:
    """One wired loss: model-output key + loss fn + weight + target.

    target_index selects which element of the generator's target tuple this
    loss compares against (mirroring Keras' positional compile semantics);
    target_output_key instead compares against another model output (used by
    SynthMorph, where the Dice target is itself synthesized on device).
    ``weight`` may be a callable ``(inputs, outputs) -> scalar or (B,)`` for
    input-dependent weighting (HyperMorph's per-sample lambda).
    """

    def __init__(self, output_key: str, fn: Callable, weight=1.0,
                 target_index: Optional[int] = None, name: Optional[str] = None,
                 target_output_key: Optional[str] = None):
        self.output_key = output_key
        self.fn = fn
        self.weight = weight
        self.target_index = target_index
        self.target_output_key = target_output_key
        self.name = name or output_key


def make_loss_fn(model, loss_terms: Sequence[LossTerm],
                 needs_sample_rng: bool = False, rng_names: Sequence[str] = ()):
    """Build loss_fn(params, state, inputs, targets, rng)
    -> (total, (metrics, new_state)).

    ``state`` carries non-param variable collections (e.g. MeanStream's
    'stream') which the model may mutate during a training step. ``rng_names``
    lists the model's rng streams (e.g. 'sample', 'synth'), each derived from
    the step rng.
    """
    names = list(rng_names) or (["sample"] if needs_sample_rng else [])

    def loss_fn(params, state, inputs, targets, rng):
        rngs = None
        if names:
            keys = jax.random.split(rng, len(names))
            rngs = dict(zip(names, keys))
        variables = {"params": params, **state}
        if state:
            out, new_state = model.apply(variables, *inputs, rngs=rngs,
                                         mutable=list(state.keys()))
        else:
            out = model.apply(variables, *inputs, rngs=rngs)
            new_state = state
        total = 0.0
        metrics = {}
        for i, term in enumerate(loss_terms):
            if term.target_output_key is not None:
                y_true = out[term.target_output_key]
            else:
                tgt_idx = term.target_index if term.target_index is not None else i
                y_true = targets[tgt_idx]
            raw = term.fn(y_true, out[term.output_key])
            w = term.weight(inputs, out) if callable(term.weight) else term.weight
            total = total + jnp.mean(w * raw)
            metrics[term.name] = jnp.mean(raw)
        metrics["loss"] = total
        return total, (metrics, new_state)

    return loss_fn


def make_train_step(model, loss_terms: Sequence[LossTerm], tx,
                    needs_sample_rng: bool = False, donate: bool = True,
                    rng_names: Sequence[str] = ()):
    """Build the jitted train step:
    (params, state, opt_state, base_rng, step, inputs, targets)
    -> (params, state, opt_state, metrics).
    Buffers are donated so params update in place in HBM. The per-step rng is
    derived INSIDE the jit (fold_in(base_rng, step)) so the host issues no
    extra dispatch per step — step is a () int32 array."""
    loss_fn = make_loss_fn(model, loss_terms, needs_sample_rng=needs_sample_rng,
                           rng_names=rng_names)

    def step_fn(params, state, opt_state, base_rng, step, inputs, targets):
        rng = jax.random.fold_in(base_rng, step)
        grads_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_state)), grads = grads_fn(
            params, state, inputs, targets, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, metrics

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_scanned_cached_label_step(model, loss_terms: Sequence[LossTerm], tx,
                                   batch_size: int,
                                   rng_names: Sequence[str] = ()):
    """K train steps per device dispatch over an HBM-resident label stack.

    On a tunneled/remote TPU each dispatch costs a host round trip that can
    exceed the step's compute (measured: the SynthMorph half-res step is
    ~0.24 s dispatched singly but ~0.12 s of actual compute). This builder
    moves the whole inner loop on device: a ``lax.scan`` whose per-step body
    gathers its batch from the cached label stack by index, applies the
    host-drawn axis flips in-graph, and runs the usual fwd+bwd+update. The
    host streams only (K, 2B) int32 picks and (K, nd) bool flip flags per
    dispatch — the index stream (device_cached_label_indices) is byte-for-
    byte the one the per-step path consumes, so the sample sequence (and
    resume replay) is identical.

    Returns jitted fn(params, state, opt_state, base_rng, step0, data,
    picks, flips) -> (params, state, opt_state, last_metrics).
    """
    loss_fn = make_loss_fn(model, loss_terms, rng_names=rng_names)

    def multi_step(params, state, opt_state, base_rng, step0, data,
                   picks, flips):
        nd = data.ndim - 2
        void = jnp.zeros((batch_size, *data.shape[1:-1], nd), jnp.float32)

        def body(carry, xs):
            params, state, opt_state = carry
            step, pk, fl = xs
            rng = jax.random.fold_in(base_rng, step)
            # float32 for bit-parity with the per-step path (Trainer._put
            # casts every generator batch to float32)
            pair = jnp.take(data, pk, axis=0).astype(jnp.float32)
            for a in range(nd):
                pair = jnp.where(fl[a], jnp.flip(pair, axis=a + 1), pair)
            inputs = (pair[:batch_size], pair[batch_size:])
            grads_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (metrics, new_state)), grads = grads_fn(
                params, state, inputs, (void, void), rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state), metrics

        k = picks.shape[0]
        steps = step0 + jnp.arange(k, dtype=jnp.int32)
        (params, state, opt_state), metrics = jax.lax.scan(
            body, (params, state, opt_state), (steps, picks, flips))
        # dispatch-MEAN metrics: SynthMorph's per-step task difficulty (drawn
        # warp magnitude) varies wildly, so a single step's value is too
        # noisy to show a learning trend (round-2 phaseA lesson)
        mean = jax.tree_util.tree_map(lambda m: m.mean(0), metrics)
        return params, state, opt_state, mean

    return jax.jit(multi_step, donate_argnums=(0, 1, 2))


def make_scanned_cached_pair_step(model, loss_terms: Sequence[LossTerm], tx,
                                  batch_size: int, bidir: bool = False,
                                  atlas: bool = False,
                                  needs_sample_rng: bool = False,
                                  rng_names: Sequence[str] = ()):
    """K train steps per device dispatch over an HBM-resident volume stack.

    The pair-registration counterpart of make_scanned_cached_label_step: the
    ``lax.scan`` body gathers its (src, trg) batch from the cached stack by
    index (scan-to-scan) or pairs it with a device-resident atlas
    (scan-to-atlas), then runs fwd+bwd+update. The host streams only the
    (K, 2B) — (K, B) for atlas — int32 picks per dispatch, drawn from
    device_cached_pair_indices, so the sample sequence (and resume replay)
    is byte-identical to the per-step device_cached_pair_generator path.

    ``extras``: optional tuple of per-step (K, ...) host-streamed arrays
    appended to the model inputs (e.g. HyperMorph's (K, B, 1) lambda draws).

    Returns jitted fn(params, state, opt_state, base_rng, step0, data,
    atlas_dev, picks, *extras) -> (params, state, opt_state, last_metrics);
    pass atlas_dev=() when atlas=False (jit requires a stable pytree).
    """
    loss_fn = make_loss_fn(model, loss_terms, needs_sample_rng=needs_sample_rng,
                           rng_names=rng_names)

    def multi_step(params, state, opt_state, base_rng, step0, data,
                   atlas_dev, picks, *extras):
        nd = data.ndim - 2
        void = jnp.zeros((batch_size, *data.shape[1:-1], nd), jnp.float32)

        def body(carry, xs):
            params, state, opt_state = carry
            step, pk, ex = xs
            rng = jax.random.fold_in(base_rng, step)
            if atlas:
                src = jnp.take(data, pk, axis=0)
                trg = atlas_dev
            else:
                src = jnp.take(data, pk[:batch_size], axis=0)
                trg = jnp.take(data, pk[batch_size:], axis=0)
            inputs = (src, trg, *ex)
            targets = (trg, src, void) if bidir else (trg, void)
            grads_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (metrics, new_state)), grads = grads_fn(
                params, state, inputs, targets, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state), metrics

        k = picks.shape[0]
        steps = step0 + jnp.arange(k, dtype=jnp.int32)
        (params, state, opt_state), metrics = jax.lax.scan(
            body, (params, state, opt_state), (steps, picks, tuple(extras)))
        # dispatch-mean metrics (see make_scanned_cached_label_step)
        mean = jax.tree_util.tree_map(lambda m: m.mean(0), metrics)
        return params, state, opt_state, mean

    return jax.jit(multi_step, donate_argnums=(0, 1, 2))


# One lax.scan dispatch executes steps_per_dispatch full train steps as a
# SINGLE device program. On the tunneled v5e worker, a single dispatch that
# runs for minutes reproducibly kills the worker process ("TPU worker
# process crashed or restarted") — observed with the full-resolution
# SynthMorph step (~33 s/step, K=10 -> ~5.5 min dispatches crashed; K=1
# survived; half-res K=25 at 0.45 s/step and full-res pair-registration
# K=25 at 1.6 s/step both run for hours). Voxel count is the best static
# proxy for step time we have at call time, so warn when volume * K is in
# the measured danger zone. Per-step dispatch overhead is ~28 ms, i.e.
# irrelevant exactly when steps are long enough to be dangerous.
_DISPATCH_VOXEL_STEPS_WARN = 12 * 860_160 * 25  # ~3x the proven-safe load


def _warn_long_dispatch(spatial, steps_per_dispatch: int, log_fn) -> None:
    voxels = int(np.prod(spatial))
    if voxels * steps_per_dispatch > _DISPATCH_VOXEL_STEPS_WARN:
        log_fn(
            f"WARNING: {steps_per_dispatch} steps/dispatch on a {voxels}-voxel "
            "volume puts minutes of compute in one device program — known to "
            "crash the tunneled TPU worker (see training.py note). Use "
            "--steps-per-dispatch 1 for large volumes.")


def find_latest_checkpoint(model_dir: str):
    """Return (path, epoch) of the newest numbered checkpoint, or (None, 0).

    The framework's preemption-recovery primitive: TPU VMs can be preempted
    at any time, so trainers resume from the latest periodic save
    (``--load-weights latest`` in the CLI scripts).
    """
    import re
    if not os.path.isdir(model_dir):
        return None, 0
    best, best_epoch = None, -1
    for name in os.listdir(model_dir):
        m = re.fullmatch(r"(\d+)\.npz", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(model_dir, name)
    return (best, best_epoch) if best else (None, 0)


def prefetch(generator, size: int = 2):
    """Run a python generator in a background thread with a bounded queue,
    overlapping host-side volume loading with device compute."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _sentinel = object()

    def producer():
        try:
            for item in generator:
                q.put(item)
        finally:
            q.put(_sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _sentinel:
            return
        yield item


def device_cached_pair_generator(files, batch_size: int = 1, bidir: bool = False,
                                 atlas=None, add_feat_axis: bool = True,
                                 seed: int = 0, start_step: int = 0):
    """Pair generator over a dataset cached in device HBM.

    Loads every training volume ONCE onto the device and then samples
    scan-to-scan (or scan-to-atlas) pairs by indexing the resident stack —
    per step the host sends only indices. On tunneled/remote accelerators
    this removes the two-full-volume host->device transfer per step that
    otherwise dominates (measured ~2s/step at 160x192x224 vs a ~1s compute
    step). Fits comfortably: 100 canonical volumes are ~2.7 GB of a v5e's
    16 GB HBM.

    Yields the same (inputs, targets) tuple contract as
    generators.scan_to_scan / scan_to_atlas. Sampling is STATELESS per step
    (rng keyed by (seed, step)), so a resumed run passing
    ``start_step = resumed_epoch * steps_per_epoch`` replays exactly the
    batch sequence the uninterrupted run would have seen.
    """
    import jax.numpy as jnp

    data = load_volume_stack(files, add_feat_axis=add_feat_axis)
    n = data.shape[0]
    spatial = data.shape[1:-1]
    zeros = jnp.zeros((batch_size, *spatial, len(spatial)), jnp.float32)
    atlas_dev = None
    if atlas is not None:
        atlas_dev = jnp.broadcast_to(jnp.asarray(atlas, jnp.float32),
                                     (batch_size, *spatial, atlas.shape[-1]))

    stream = device_cached_pair_indices(
        n, batch_size=batch_size, atlas=atlas_dev is not None, seed=seed,
        start_step=start_step)
    for idx in stream:
        if atlas_dev is not None:
            src = jnp.take(data, idx, axis=0)
            trg = atlas_dev
        else:
            src = jnp.take(data, idx[:batch_size], axis=0)
            trg = jnp.take(data, idx[batch_size:], axis=0)
        targets = [trg, src, zeros] if bidir else [trg, zeros]
        yield [src, trg], targets


def device_cached_pair_indices(n: int, batch_size: int = 1, atlas: bool = False,
                               seed: int = 0, start_step: int = 0):
    """The sampling stream behind device_cached_pair_generator: yields the
    per-step picks ((B,) int32 scan-to-atlas, (2B,) scan-to-scan). Stateless
    per step (numpy rng keyed by (seed, step)), so a resumed run — or the
    scanned multi-step path, which consumes the SAME stream — replays the
    exact sample sequence of the per-step path."""
    size = batch_size if atlas else 2 * batch_size
    step = start_step
    while True:
        rng = np.random.default_rng((seed, step))
        yield rng.integers(n, size=size).astype(np.int32)
        step += 1


def load_volume_stack(files, add_feat_axis: bool = True):
    """Load a file list into one (N, *spatial, C) float32 device stack."""
    import jax.numpy as jnp
    from .py import utils as py_utils

    vols = [py_utils.load_volfile(f, np_var="vol", add_batch_axis=True,
                                  add_feat_axis=add_feat_axis) for f in files]
    return jnp.concatenate([jnp.asarray(v, jnp.float32) for v in vols], axis=0)


def device_cached_semisupervised_generator(files, labels, downsize: int = 2,
                                           batch_size: int = 1, seed: int = 0,
                                           start_step: int = 0):
    """generators.semisupervised over an HBM-resident dataset.

    Host-streaming this workload is brutal on a tunneled accelerator: each
    step would move two volumes PLUS two one-hot probability segmentations
    (~N_labels x volume bytes). Instead the volumes and the *integer* segs
    live in HBM and the one-hot encode + stride-downsample run on device per
    step (a cheap compare-broadcast), so the host again sends only indices.
    Contract and sampling statelessness match the other cached generators.
    """
    import jax.numpy as jnp
    from .py import utils as py_utils

    vols, segs = [], []
    for f in files:
        if str(f).endswith(".npz"):
            # one open per file: npz archives carry both variables
            with np.load(f) as d:
                vols.append(np.asarray(d["vol"], np.float32)[None, ..., None])
                segs.append(np.asarray(d["seg"])[None])
        else:
            vols.append(py_utils.load_volfile(
                f, np_var="vol", add_batch_axis=True, add_feat_axis=True))
            segs.append(py_utils.load_volfile(
                f, np_var="seg", add_batch_axis=True, add_feat_axis=False))
    # int16 halves the resident seg bytes but wraps IDs > 32767 — pick the
    # narrowest dtype that actually holds this dataset's labels
    seg_max = max(max(int(s.max()) for s in segs), int(np.max(labels)))
    seg_dtype = jnp.int16 if seg_max <= np.iinfo(np.int16).max else jnp.int32
    data = jnp.concatenate([jnp.asarray(v) for v in vols], axis=0)
    seg_data = jnp.concatenate([jnp.asarray(s, seg_dtype) for s in segs], axis=0)
    labels_dev = jnp.asarray(np.asarray(labels), seg_dtype)
    n = data.shape[0]
    spatial = data.shape[1:-1]
    nd = len(spatial)
    zeros = jnp.zeros((batch_size, *spatial, nd), jnp.float32)

    @jax.jit
    def _one_hot(seg):
        sl = (slice(None),) + (slice(None, None, downsize),) * nd
        return (seg[sl][..., None] == labels_dev).astype(jnp.float32)

    step = start_step
    while True:
        rng = np.random.default_rng((seed, step))
        idx = rng.integers(n, size=2 * batch_size)
        src = jnp.take(data, idx[:batch_size], axis=0)
        trg = jnp.take(data, idx[batch_size:], axis=0)
        src_seg = _one_hot(jnp.take(seg_data, idx[:batch_size], axis=0))
        trg_seg = _one_hot(jnp.take(seg_data, idx[batch_size:], axis=0))
        step += 1
        yield [src, trg, src_seg], [trg, zeros, trg_seg]


def device_cached_label_indices(n: int, nd: int, batch_size: int = 1,
                                same_subj: bool = False, flip: bool = True,
                                seed: int = 0, start_step: int = 0):
    """The sampling stream behind device_cached_label_generator: yields
    (picks (2B,) int32, flip_flags (nd,) bool) per step. Stateless per step
    (numpy rng keyed by (seed, step)), so a resumed run — or the scanned
    multi-step path, which consumes the SAME stream — replays the exact
    sample sequence of the per-step path."""
    step = start_step
    while True:
        rng = np.random.default_rng((seed, step))
        picks = rng.integers(n, size=2 * batch_size).astype(np.int32)
        if same_subj:
            picks[batch_size:] = picks[:batch_size]
        flags = np.zeros(nd, bool)
        if flip:
            nb_axes = int(rng.integers(nd + 1))
            axes = rng.choice(nd, size=nb_axes, replace=False, shuffle=False)
            flags[np.asarray(axes, int)] = True
        step += 1
        yield picks, flags


def device_cached_label_generator(label_maps, batch_size: int = 1,
                                  same_subj: bool = False, flip: bool = True,
                                  seed: int = 0, start_step: int = 0):
    """generators.synthmorph over an HBM-resident label-map stack.

    SynthMorph streams only integer label maps per step (images are
    synthesized on device); caching the whole population in HBM reduces the
    per-step host traffic to a pair of indices, like
    device_cached_pair_generator does for image pairs. Random axis flips run
    on device too. Sampling is stateless per step (rng keyed by
    (seed, step)) so a resumed run replays the uninterrupted sequence.
    """
    import jax.numpy as jnp

    data = jnp.asarray(np.stack(label_maps)[..., None].astype(np.int32))
    n = data.shape[0]
    nd = data.ndim - 2
    void = np.zeros((batch_size, *data.shape[1:-1], nd), "float32")

    stream = device_cached_label_indices(
        n, nd, batch_size=batch_size, same_subj=same_subj, flip=flip,
        seed=seed, start_step=start_step)
    for picks, flags in stream:
        pair = jnp.take(data, picks, axis=0)
        axes = tuple(int(a) + 1 for a in np.flatnonzero(flags))
        if axes:
            pair = jnp.flip(pair, axis=axes)
        yield [pair[:batch_size], pair[batch_size:]], [void] * 2


class MetricsLogger:
    """Structured per-epoch metrics: CSV file + optional stdout.

    The reference has no metrics system beyond Keras progress bars
    (SURVEY §5); this provides a machine-readable training record.
    """

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._file = None
        self._keys = None

    def log(self, epoch: int, metrics: Dict[str, float], wall_s: float):
        if self.path is None:
            return
        row = {"epoch": epoch, "wall_s": round(wall_s, 3),
               **{k: float(v) for k, v in sorted(metrics.items())}}
        if self._file is None:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            self._file = open(self.path, "a")
            self._keys = list(row.keys())
            self._file.write(",".join(self._keys) + "\n")
        self._file.write(",".join(str(row.get(k, "")) for k in self._keys) + "\n")
        self._file.flush()

    def close(self):
        if self._file:
            self._file.close()
            self._file = None


def resolve_dtype(name: str):
    """Map a --dtype CLI string to the jnp compute dtype."""
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def enable_compile_cache():
    """Turn on JAX's persistent compilation cache (idempotent).

    Full-resolution train steps take minutes to compile; with the cache a
    preempted job resumed via ``--load-weights latest`` skips recompilation
    entirely. Disable with VXM_COMPILE_CACHE=0; the directory defaults to
    /tmp/jax_cache (override with JAX_COMPILATION_CACHE_DIR).
    """
    if os.environ.get("VXM_COMPILE_CACHE", "1") == "0":
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


class Trainer:
    """Minimal epoch/step training driver with checkpointing and metrics.

    Mirrors the Keras fit loop contract of the reference scripts: the
    generator yields (inputs, targets) numpy tuples; checkpoints are written
    every ``save_freq_epochs`` as self-describing model files.
    """

    def __init__(self, model, loss_terms: Sequence[LossTerm], lr: float = 1e-4,
                 mesh=None, needs_sample_rng: bool = False, seed: int = 0,
                 spatial_shard: bool = False, tx=None,
                 rng_names: Sequence[str] = (), clip_norm: Optional[float] = None):
        enable_compile_cache()
        self.model = model
        self.loss_terms = list(loss_terms)
        if tx is None:
            tx = optax.adam(lr)
            if clip_norm is not None:
                # global-norm clipping stabilizes the high-lr regimes some
                # workloads need (e.g. SynthMorph on small populations)
                tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
        elif clip_norm is not None:
            raise ValueError(
                "clip_norm only applies to the default optimizer; chain "
                "optax.clip_by_global_norm into your custom tx instead")
        self.tx = tx
        self.mesh = mesh  # lazily built from the first batch if None
        self.rng_names = list(rng_names) or (["sample"] if needs_sample_rng else [])
        self.needs_sample_rng = bool(self.rng_names)
        self.spatial_shard = spatial_shard
        self.base_rng = jax.random.PRNGKey(seed)
        self.step_fn = make_train_step(model, self.loss_terms, self.tx,
                                       rng_names=self.rng_names)
        self.params = None
        self.state = {}  # non-param variable collections (e.g. 'stream')
        self.opt_state = None
        self.global_step = 0
        self.loaded_from = None  # checkpoint path when resumed via load()

    def _ensure_mesh(self, arrays):
        if self.mesh is None:
            batch = int(np.shape(arrays[0])[0]) if arrays else 1
            spatial = int(np.shape(arrays[0])[1]) if arrays and np.ndim(arrays[0]) > 2 else None
            self.mesh = mesh_lib.make_mesh_for_batch(
                batch, spatial_size=spatial if self.spatial_shard else None)
        self._guard_pallas_dispatch()

    def _guard_pallas_dispatch(self):
        # pallas_call cannot be partitioned by GSPMD: with the volume grid
        # sharded over 'space' the step must lower bounded warps to the XLA
        # shifted-slice path (partitioned with plain halo exchanges) instead
        # of the Pallas kernel. Decided here, at trace-owning scope, so a
        # multi-chip run can never hit an unpartitionable kernel.
        if self.mesh is not None and self.mesh.shape.get("space", 1) > 1:
            from .ops import warp as _warp
            _warp.set_pallas_dispatch(False)

    def init(self, sample_inputs, params=None):
        """Initialize (or adopt) params and the optimizer state."""
        if sample_inputs is not None:
            self._ensure_mesh(sample_inputs)
        elif self.mesh is None:
            self.mesh = mesh_lib.make_mesh_for_batch(1)
        self._guard_pallas_dispatch()
        if params is None:
            rngs = {"params": self.base_rng}
            for name in self.rng_names:
                rngs[name] = self.base_rng
            inputs_dev = self._put(sample_inputs)
            variables = self.model.init(rngs, *inputs_dev)
            params = variables.pop("params")
            self.state = mesh_lib.replicate(self.mesh, dict(variables))
        self.params = mesh_lib.replicate(self.mesh, params)
        self.opt_state = self.tx.init(self.params)
        return self.params

    def _put(self, arrays):
        def put(a):
            # device arrays whose placement is equivalent to the desired
            # sharding pass through untouched (no per-step re-put dispatch);
            # is_equivalent_to also matches a SingleDeviceSharding against a
            # one-device NamedSharding, the cache-device generator case
            desired = mesh_lib.batch_sharding(self.mesh, np.ndim(a),
                                              spatial=self.spatial_shard)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 \
                    and a.sharding.is_equivalent_to(desired, np.ndim(a)):
                return a
            return mesh_lib.shard_batch(self.mesh, jnp.asarray(a, jnp.float32),
                                        spatial=self.spatial_shard)
        return tuple(put(a) for a in arrays)

    def train_step(self, inputs, targets):
        inputs = self._put(inputs)
        targets = self._put(targets)
        step = np.asarray(self.global_step, np.int32)  # () array: no retrace
        self.params, self.state, self.opt_state, metrics = self.step_fn(
            self.params, self.state, self.opt_state, self.base_rng, step,
            inputs, targets)
        self.global_step += 1
        return metrics

    def fit(self, generator, epochs: int, steps_per_epoch: int,
            initial_epoch: int = 0, model_dir: Optional[str] = None,
            save_freq_epochs: int = 20, save_filename: str = "{epoch:04d}.npz",
            log_fn: Callable[[str], None] = print, prefetch_size: int = 2,
            metrics_csv: Optional[str] = None, profile_dir: Optional[str] = None):
        gen = prefetch(generator, size=prefetch_size) if prefetch_size else generator
        logger = MetricsLogger(metrics_csv or (
            os.path.join(model_dir, "metrics.csv") if model_dir else None))
        if profile_dir:
            jax.profiler.start_trace(profile_dir)

        if self.params is None:
            inputs, _ = next(gen)
            self.init(inputs)

        if model_dir:
            os.makedirs(model_dir, exist_ok=True)
            self.save(os.path.join(model_dir, save_filename.format(epoch=initial_epoch)),
                      wait=False)

        try:
            for epoch in range(initial_epoch, epochs):
                t0 = time.time()
                step_metrics = []
                for _ in range(steps_per_epoch):
                    inputs, targets = next(gen)
                    # device scalars: no host sync until the epoch boundary
                    step_metrics.append(self.train_step(inputs, targets))
                # epoch-MEAN metrics (a single step's values are too noisy to
                # show a trend when per-step task difficulty varies); the
                # float() fetch here is also the realistic-timing sync point
                last_metrics = {
                    k: float(np.mean([float(m[k]) for m in step_metrics]))
                    for k in step_metrics[-1]}
                dt = time.time() - t0
                msg = " - ".join(f"{k}: {v:.6f}" for k, v in sorted(last_metrics.items()))
                log_fn(f"epoch {epoch + 1}/{epochs} [{dt:.1f}s, "
                       f"{steps_per_epoch / dt:.2f} steps/s] {msg}")
                logger.log(epoch + 1, last_metrics, dt)

                if model_dir and ((epoch + 1) % save_freq_epochs == 0 or epoch + 1 == epochs):
                    self.save(os.path.join(model_dir, save_filename.format(epoch=epoch + 1)),
                              wait=False)
                elif getattr(self, "_save_error", None) is not None:
                    # a background write failed since the last save: fail the
                    # run NOW, not tens of epochs later at the next join
                    self.wait_for_saves()
            self.wait_for_saves()
        finally:
            # close observability cleanly even when a step or a background
            # save raises (a still-running profiler trace corrupts itself)
            logger.close()
            if profile_dir:
                jax.profiler.stop_trace()
        return last_metrics

    def fit_cached_labels(self, label_maps, epochs: int, steps_per_epoch: int,
                          steps_per_dispatch: int = 0, batch_size: int = 1,
                          same_subj: bool = False, flip: bool = True,
                          seed: int = 0, start_step: Optional[int] = None,
                          initial_epoch: int = 0, model_dir: Optional[str] = None,
                          save_freq_epochs: int = 20,
                          save_filename: str = "{epoch:04d}.npz",
                          log_fn: Callable[[str], None] = print,
                          metrics_csv: Optional[str] = None):
        """Scanned fit over an HBM-resident label-map population (SynthMorph).

        Runs ``steps_per_dispatch`` train steps per device round trip (one
        ``lax.scan`` dispatch; default: a whole epoch) — see
        make_scanned_cached_label_step. The host streams only sample indices
        and flip flags; the sample sequence is exactly the per-step
        device_cached_label_generator stream, so checkpoints from either
        path resume interchangeably.
        """
        steps_per_dispatch = steps_per_dispatch or steps_per_epoch
        assert steps_per_epoch % steps_per_dispatch == 0, (
            "steps_per_epoch must be a multiple of steps_per_dispatch")
        _warn_long_dispatch(label_maps[0].shape, steps_per_dispatch, log_fn)
        data = jnp.asarray(np.stack(label_maps)[..., None].astype(np.int32))
        nd = data.ndim - 2
        if self.params is None:
            self.init((np.zeros((batch_size, *data.shape[1:]), np.float32),
                       np.zeros((batch_size, *data.shape[1:]), np.float32)))
        multi_step = make_scanned_cached_label_step(
            self.model, self.loss_terms, self.tx, batch_size,
            rng_names=self.rng_names)
        stream = device_cached_label_indices(
            int(data.shape[0]), nd, batch_size=batch_size,
            same_subj=same_subj, flip=flip, seed=seed,
            start_step=(start_step if start_step is not None
                        else initial_epoch * steps_per_epoch))

        logger = MetricsLogger(metrics_csv or (
            os.path.join(model_dir, "metrics.csv") if model_dir else None))
        if model_dir:
            os.makedirs(model_dir, exist_ok=True)
            self.save(os.path.join(model_dir,
                                   save_filename.format(epoch=initial_epoch)),
                      wait=False)
        last_metrics = {}
        try:
            for epoch in range(initial_epoch, epochs):
                t0 = time.time()
                for _ in range(steps_per_epoch // steps_per_dispatch):
                    pk, fl = zip(*(next(stream)
                                   for _ in range(steps_per_dispatch)))
                    step0 = np.asarray(self.global_step, np.int32)
                    (self.params, self.state, self.opt_state,
                     last_metrics) = multi_step(
                        self.params, self.state, self.opt_state,
                        self.base_rng, step0, data,
                        np.stack(pk), np.stack(fl))
                    self.global_step += steps_per_dispatch
                last_metrics = {k: float(v) for k, v in last_metrics.items()}
                dt = time.time() - t0
                msg = " - ".join(f"{k}: {v:.6f}"
                                 for k, v in sorted(last_metrics.items()))
                log_fn(f"epoch {epoch + 1}/{epochs} [{dt:.1f}s, "
                       f"{steps_per_epoch / dt:.2f} steps/s] {msg}")
                logger.log(epoch + 1, last_metrics, dt)
                if model_dir and ((epoch + 1) % save_freq_epochs == 0
                                  or epoch + 1 == epochs):
                    self.save(os.path.join(
                        model_dir, save_filename.format(epoch=epoch + 1)),
                        wait=False)
                elif getattr(self, "_save_error", None) is not None:
                    self.wait_for_saves()
            self.wait_for_saves()
        finally:
            logger.close()
        return last_metrics

    def fit_cached_pairs(self, data, epochs: int, steps_per_epoch: int,
                         steps_per_dispatch: int = 0, batch_size: int = 1,
                         bidir: bool = False, atlas=None, seed: int = 0,
                         start_step: Optional[int] = None,
                         initial_epoch: int = 0, model_dir: Optional[str] = None,
                         save_freq_epochs: int = 20,
                         save_filename: str = "{epoch:04d}.npz",
                         log_fn: Callable[[str], None] = print,
                         metrics_csv: Optional[str] = None,
                         extra_stream=None):
        """Scanned fit over an HBM-resident volume stack (pair registration).

        Runs ``steps_per_dispatch`` train steps per device round trip (one
        ``lax.scan`` dispatch; default: a whole epoch) — see
        make_scanned_cached_pair_step. The host streams only sample indices;
        the sample sequence is exactly the per-step
        device_cached_pair_generator stream, so checkpoints from either path
        resume interchangeably.

        data: (N, *spatial, C) float32 stack (load_volume_stack);
        atlas: optional (*spatial, C) target volume (scan-to-atlas mode);
        extra_stream: optional generator aligned with the picks stream (same
        start step) yielding a tuple of arrays per step, appended to the
        model inputs — e.g. HyperMorph's per-sample lambda draws.
        """
        steps_per_dispatch = steps_per_dispatch or steps_per_epoch
        assert steps_per_epoch % steps_per_dispatch == 0, (
            "steps_per_epoch must be a multiple of steps_per_dispatch")
        _warn_long_dispatch(np.shape(data)[1:-1], steps_per_dispatch, log_fn)
        data = jnp.asarray(data, jnp.float32)
        atlas_dev = ()
        if atlas is not None:
            atlas_dev = jnp.broadcast_to(
                jnp.asarray(atlas, jnp.float32),
                (batch_size, *data.shape[1:-1], np.asarray(atlas).shape[-1]))
        if self.params is None:
            probe = np.zeros((batch_size, *data.shape[1:]), np.float32)
            self.init((probe, probe))
        multi_step = make_scanned_cached_pair_step(
            self.model, self.loss_terms, self.tx, batch_size, bidir=bidir,
            atlas=atlas is not None, rng_names=self.rng_names)
        stream = device_cached_pair_indices(
            int(data.shape[0]), batch_size=batch_size, atlas=atlas is not None,
            seed=seed,
            start_step=(start_step if start_step is not None
                        else initial_epoch * steps_per_epoch))

        logger = MetricsLogger(metrics_csv or (
            os.path.join(model_dir, "metrics.csv") if model_dir else None))
        if model_dir:
            os.makedirs(model_dir, exist_ok=True)
            self.save(os.path.join(model_dir,
                                   save_filename.format(epoch=initial_epoch)),
                      wait=False)
        last_metrics = {}
        try:
            for epoch in range(initial_epoch, epochs):
                t0 = time.time()
                for _ in range(steps_per_epoch // steps_per_dispatch):
                    picks = np.stack([next(stream)
                                      for _ in range(steps_per_dispatch)])
                    extras = ()
                    if extra_stream is not None:
                        per_step = [next(extra_stream)
                                    for _ in range(steps_per_dispatch)]
                        extras = tuple(np.stack(comp)
                                       for comp in zip(*per_step))
                    step0 = np.asarray(self.global_step, np.int32)
                    (self.params, self.state, self.opt_state,
                     last_metrics) = multi_step(
                        self.params, self.state, self.opt_state,
                        self.base_rng, step0, data, atlas_dev, picks, *extras)
                    self.global_step += steps_per_dispatch
                last_metrics = {k: float(v) for k, v in last_metrics.items()}
                dt = time.time() - t0
                msg = " - ".join(f"{k}: {v:.6f}"
                                 for k, v in sorted(last_metrics.items()))
                log_fn(f"epoch {epoch + 1}/{epochs} [{dt:.1f}s, "
                       f"{steps_per_epoch / dt:.2f} steps/s] {msg}")
                logger.log(epoch + 1, last_metrics, dt)
                if model_dir and ((epoch + 1) % save_freq_epochs == 0
                                  or epoch + 1 == epochs):
                    self.save(os.path.join(
                        model_dir, save_filename.format(epoch=epoch + 1)),
                        wait=False)
                elif getattr(self, "_save_error", None) is not None:
                    self.wait_for_saves()
            self.wait_for_saves()
        finally:
            logger.close()
        return last_metrics

    def save(self, path: str, wait: bool = True):
        """Write a complete training checkpoint.

        Beyond params (what the reference's weights-only `.h5` holds), this
        persists the optimizer state, mutable variable collections (e.g.
        MeanStream's 'stream'), the global step, and the base PRNG key —
        everything needed for a preempted run to resume with metrics
        identical to an uninterrupted one.

        With ``wait=False`` the device→host transfer and file write run in a
        background thread so the train loop keeps dispatching steps. The
        train step DONATES params/state/opt_state buffers, so the writer
        cannot hold the live references (the next step invalidates them);
        instead one jitted call snapshots device-side copies (HBM-bandwidth
        fast, a single dispatch) and the thread transfers those. At most one
        save is in flight — a new one first joins the previous — and the
        file lands atomically (modelio).
        """
        self.wait_for_saves()
        params, state, opt_state = self.params, self.state, self.opt_state
        step, base_rng = self.global_step, self.base_rng
        if not wait:
            if not hasattr(self, "_snapshot_fn"):
                # explicit copies (not identity) so XLA materializes fresh
                # buffers — a passthrough jit would alias the soon-donated
                # inputs; jnp.copy preserves every leaf dtype
                self._snapshot_fn = jax.jit(lambda t: jax.tree_util.tree_map(
                    jnp.copy, t))
            params, state, opt_state = self._snapshot_fn(
                (params, state, opt_state))

        def _write():
            extra = {}
            if state:
                extra["state"] = jax.device_get(state)
            if opt_state is not None:
                leaves = jax.tree_util.tree_leaves(jax.device_get(opt_state))
                extra["opt"] = {f"{i:05d}": np.asarray(l)
                                for i, l in enumerate(leaves)}
            extra["train"] = {
                "step": np.asarray(step, np.int64),
                "base_rng": np.asarray(jax.device_get(base_rng)),
            }
            modelio.save_model(path, self.model, jax.device_get(params),
                               extra_trees=extra)

        if wait:
            _write()
        else:
            def _guarded():
                try:
                    _write()
                except BaseException as e:  # surface on the next join
                    self._save_error = e

            self._save_thread = threading.Thread(
                target=_guarded, name="trainer-save", daemon=False)
            self._save_thread.start()

    def wait_for_saves(self):
        """Block until any in-flight async checkpoint write has completed.

        Re-raises a failed background write (e.g. disk full) here rather
        than losing it — otherwise training would run on with a stale
        'latest' checkpoint and no warning.
        """
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
        err = getattr(self, "_save_error", None)
        if err is not None:
            self._save_error = None
            raise RuntimeError("async checkpoint write failed") from err

    def load(self, path: str, sample_inputs=None):
        """Restore params — and, when present, optimizer state, variable
        collections, step counter and RNG — from a checkpoint.

        Pass ``sample_inputs`` (a batch like the ones training will see) so
        the device mesh is rebuilt for the real batch shape; without it a
        fresh trainer would fall back to a single-device mesh and a resumed
        multi-chip job would silently lose its data/spatial parallelism.
        """
        self.wait_for_saves()
        if self.mesh is None and sample_inputs is not None:
            self._ensure_mesh(sample_inputs)
        _, params, extra = modelio.load_model(path, with_extra=True)
        self.init(None, params=params)
        self.loaded_from = path
        if "state" in extra:
            self.state = mesh_lib.replicate(self.mesh, extra["state"])
        if "opt" in extra:
            leaves = [extra["opt"][k] for k in sorted(extra["opt"])]
            treedef = jax.tree_util.tree_structure(self.opt_state)
            restored = jax.tree_util.tree_unflatten(treedef, leaves)
            self.opt_state = mesh_lib.replicate(self.mesh, restored)
        if "train" in extra:
            self.global_step = int(extra["train"]["step"])
            self.base_rng = jnp.asarray(extra["train"]["base_rng"])
        return self.params


def init_or_resume(trainer: "Trainer", load_weights: Optional[str],
                   model_dir: str, sample_inputs, initial_epoch: int = 0,
                   log_fn: Callable[[str], None] = print) -> int:
    """Shared trainer-initialization policy for every CLI script.

    ``--load-weights latest`` is the preemption-recovery path: resume from
    the newest numbered checkpoint in ``model_dir`` (full train state), and
    return the epoch to continue from. A concrete path loads that file; no
    flag initializes fresh from ``sample_inputs``.
    """
    if load_weights == "latest":
        path, epoch = find_latest_checkpoint(model_dir)
        if path:
            log_fn(f"resuming from {path} (epoch {epoch})")
            trainer.load(path, sample_inputs=sample_inputs)
            return max(initial_epoch, epoch)
        trainer.init(sample_inputs)
        return initial_epoch
    if load_weights:
        trainer.load(load_weights, sample_inputs=sample_inputs)
        return initial_epoch
    trainer.init(sample_inputs)
    return initial_epoch
