#!/usr/bin/env python
"""Benchmark: 3-D volume pairs registered per second per chip.

Reproduces the reference's evaluation semantics (scripts/tf/test.py timing:
warp prediction timed, compile excluded) on the canonical 160x192x224 volume
with the default VxmDense (int_steps=7, int_downsize=2), and additionally:

  * a batch-size x dtype sweep (bs in {1,2,4}, bf16 headline, f32 if time
    remains) — batch-size-1 is the reference's default but underutilizes the
    TPU (SURVEY §7); bs8 is skipped: deterministic, diagnosed XLA OOM;
  * an A/B of the scaling-and-squaring warp paths at integration resolution:
    XLA corner-table gather vs Pallas bounded-displacement kernel;
  * full train-step throughput (fwd+bwd+Adam) at full resolution.

DEADLINE DISCIPLINE (round-2 lesson: BENCH_r02 was rc=124 with no output).
A watchdog thread emits the final JSON line from whatever has completed and
hard-exits when the global deadline hits — even if the main thread is stuck
inside a multi-minute XLA compile. Stages are ordered headline-first and the
expensive train-step compiles are gated on remaining wall-clock. Override the
budget with BENCH_DEADLINE_S (default 780 s).

Timing note: on tunneled backends `block_until_ready` can return before
execution completes, so each timed iteration is chained into an on-device
scalar accumulator that is fetched ONCE after the loop — the fetch cannot
complete until every iteration has executed.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s/chip", "vs_baseline": N,
   "detail": {...}}
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Measured via `python scripts/measure_reference_baseline.py`: the ACTUAL
# reference implementation (torch backend; TF needs neurite, absent here),
# default VxmDense forward at 160x192x224 on this image's host CPU:
# 0.0470 pairs/s (steady-state, 1 thread — the host has one core). Pinned so
# vs_baseline is stable across runs. The old JAX-CPU stand-in measured
# 0.0076 pairs/s; the reference's torch stack is ~6x faster than that, so
# this pin is the *conservative* comparison.
BASELINE_CPU_PAIRS_PER_S = 0.0470

INSHAPE = (160, 192, 224)

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16, f32 runs through the same MXU
# at half rate. MFU is reported against the dtype's own peak.
PEAK_TFLOPS = {"bfloat16": 197.0, "float32": 98.5}

T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "780"))

# Shared result state: stages write into these as they complete so the
# watchdog can always emit a meaningful partial line.
RESULT = {"value": 0.0, "best_cfg": "", "detail": {}}
_EMITTED = threading.Lock()


def _remaining():
    return DEADLINE_S - (time.monotonic() - T0)


def _log(msg):
    """Stage-boundary timestamp on stderr (stdout carries only the JSON
    line). When a run burns its deadline, this names the stage that ate it."""
    print(f"[bench +{time.monotonic() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _emit(partial=False):
    """Print the one JSON line (at most once) and flush."""
    if not _EMITTED.acquire(blocking=False):
        return
    value = RESULT["value"]
    detail = dict(RESULT["detail"])
    detail["best_config"] = RESULT["best_cfg"]
    detail["elapsed_s"] = round(time.monotonic() - T0, 1)
    if partial:
        detail["deadline_hit"] = True
    print(json.dumps({
        "metric": "vxm_dense_registration_throughput_160x192x224",
        "value": round(value, 4),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / BASELINE_CPU_PAIRS_PER_S, 2),
        "baseline": "measured reference (torch-CPU) forward, 0.0470 pairs/s "
                    "(scripts/measure_reference_baseline.py)",
        "detail": detail,
    }), flush=True)


def _watchdog():
    # Thread, not signal.alarm: a Python signal handler only runs between
    # bytecodes, so a main thread stuck in a C++ XLA compile would never see
    # it. os._exit from a thread escapes regardless.
    time.sleep(max(0.0, DEADLINE_S - (time.monotonic() - T0)))
    _emit(partial=True)
    os._exit(0)


def _short_err(e):
    """Loud failure string: type + the most diagnostic line of the message.

    The tunneled backend wraps compile errors in an opaque HTTP 500; when the
    body carries the real XLA OOM accounting (e.g. "Ran out of memory in
    memory space hbm. Used 39.38G of 15.75G"), surface THAT line — it names
    the actual ceiling (diagnosed root cause of the bs8 failures: a
    compressed-remat copy in a channel-minor layout pads bf16[8,...,16]
    8x to 13.1 GB)."""
    text = str(e)
    for line in text.split("\n"):
        if "Ran out of memory" in line or "Exceeded" in line:
            return f"failed: {type(e).__name__}: {line.strip()[:300]}"
    msg = text.strip().split("\n")[0][:200]
    return f"failed: {type(e).__name__}: {msg}"


def _compiled_flops(jitted, *args):
    """Analytic FLOPs of a compiled function via XLA cost analysis (None if
    the backend doesn't expose it)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _enable_compile_cache():
    from voxelmorph_tpu.training import enable_compile_cache
    enable_compile_cache()


def _init_params_small(model_ctor, nb_inputs=2):
    """Initialize params on the CPU backend at a tiny volume.

    Every VxmDense parameter is a conv kernel / bias whose shape is
    independent of the spatial extent, so a 32^3 init produces the identical
    pytree as a full-res init — without the multi-minute full-resolution
    init compile over the tunneled TPU backend that ate ~2 min of the
    round-4 trial's stage-1 budget.
    """
    import jax
    import jax.numpy as jnp
    from voxelmorph_tpu.ops import warp as warp_ops

    small = (32, 32, 32)
    model = model_ctor(small)
    cpu = jax.local_devices(backend="cpu")[0]
    # the bounded-warp dispatch gates on the GLOBAL backend (tpu), but this
    # init executes on the CPU device — force the XLA path for its duration
    # or pallas_call aborts with "only interpret mode on CPU backend"
    from voxelmorph_tpu.ops import pallas_conv
    warp_ops.set_pallas_dispatch(False)
    conv_forced = pallas_conv._FORCED
    pallas_conv.set_pallas_conv(False)
    try:
        with jax.default_device(cpu):
            args = [jnp.zeros((1, *small, 1), jnp.float32)
                    for _ in range(nb_inputs)]
            params = model.init(jax.random.PRNGKey(0), *args)["params"]
    finally:
        warp_ops.set_pallas_dispatch(True)
        pallas_conv.set_pallas_conv(conv_forced)
    return params


def _load_pair():
    """Use the reference's canonical eval volume when available, else synthesize."""
    ref = "/root/reference/data/test_scan.npz"
    rng = np.random.default_rng(0)
    if os.path.isfile(ref):
        vol = np.load(ref)["vol"].astype(np.float32)
        vol = vol / max(vol.max(), 1e-6)
        moving = vol
        fixed = np.roll(vol, shift=(2, -3, 1), axis=(0, 1, 2))
    else:
        moving = rng.random(INSHAPE, dtype=np.float32)
        fixed = rng.random(INSHAPE, dtype=np.float32)
    return moving[None, ..., None], fixed[None, ..., None]


def _timed_chain(fn, *args, iters=8, warmup=2):
    """Time fn by chaining its scalar probe into an accumulator."""
    import jax.numpy as jnp
    for _ in range(warmup):
        float(fn(*args))
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def _timed_chain_stats(fn, *args, iters=8, warmup=2, repeats=3):
    """Repeat _timed_chain and return (mean, min, std) across repeats.

    Round-3 lesson: single-chain means swung 1.6x between driver and trial
    runs on the tunneled device; min-of-N plus a std bar makes a kernel
    regression distinguishable from scheduling noise."""
    samples = [_timed_chain(fn, *args, iters=iters, warmup=warmup if i == 0 else 0)
               for i in range(repeats)]
    return (float(np.mean(samples)), float(np.min(samples)),
            float(np.std(samples)))


def measure_inference(batch_sizes=(1, 2, 4), dtypes=("bfloat16",),
                      iters=8, warmup=2, fast_warp=False):
    """Registration forward throughput sweep. Updates RESULT in place.

    bf16 holds the headline (best has been bs4-bf16 every round), measured
    on the reference-exact single-gather warp. fast_warp=True measures the
    phase-warp path instead (``*_fastwarp`` keys; 2^s bounded Pallas
    applications of the integration root — registration.enable_fast_warp);
    the round-4 trial showed 8 halo-2 applications LOSE to the single
    gather (7.24 vs 8.51 pairs/s), so the fast path is a secondary
    measurement at phases=2 and the headline takes whichever config wins.
    bs8 is NOT attempted: its failure is diagnosed and deterministic (XLA
    OOM, 39.38 GB vs 15.75 GB HBM — BENCH_r03, README), and the two doomed
    multi-minute compiles starved the train stage out of rounds 2 and 3.
    The f32 sweep is a separate call, gated on remaining wall-clock after
    the train stage.
    """
    import jax
    import jax.numpy as jnp
    from voxelmorph_tpu.models import VxmDense
    from voxelmorph_tpu.ops import pallas_conv
    from voxelmorph_tpu.registration import enable_fast_warp

    # XLA conv holds the production inference path. The Pallas conv kernel
    # wins the isolated single-conv microbenchmark 3.8x (AB_conv_r05) but
    # LOSES end-to-end: 4.68 pairs/s at bs4 / 3.58 at bs1 vs XLA's 8.40
    # (BENCH_trial_r05b, PROBE_bs1_r05) — the channels-first transposes and
    # host-side window restaging between kernels cost more than the conv
    # win. Opt in with VXM_BENCH_PALLASCONV=1 to re-measure.
    use_pallas_conv = os.environ.get("VXM_BENCH_PALLASCONV", "0") == "1"
    pallas_conv.set_pallas_conv(use_pallas_conv)
    detail = RESULT["detail"]
    detail["conv_path_infer"] = "pallas" if use_pallas_conv else "xla"

    moving, fixed = _load_pair()
    for dtype_name in dtypes:
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        model = VxmDense(inshape=INSHAPE, int_steps=7, int_resolution=2,
                         dtype=dtype)
        if fast_warp:
            model = enable_fast_warp(model, phases=2)
        params = _init_params_small(
            lambda s: VxmDense(inshape=s, int_steps=7, int_resolution=2,
                               dtype=dtype))

        @jax.jit
        def reg_probe(params, mv, fx):
            out = model.apply({"params": params}, mv, fx, train=False)
            return (jnp.sum(out["y_source"][0, ::64, ::64, ::64])
                    + jnp.sum(out["pos_flow"][0, ::64, ::64, ::64])).astype(jnp.float32)

        for bs in batch_sizes:
            mv = jnp.asarray(np.repeat(moving, bs, axis=0))
            fx = jnp.asarray(np.repeat(fixed, bs, axis=0))
            key = (f"infer_bs{bs}_{dtype_name}"
                   + ("_fastwarp" if fast_warp else ""))
            _log(f"measuring {key}")
            try:
                dt = _timed_chain(lambda m, f: reg_probe(params, m, f), mv, fx,
                                  iters=iters, warmup=warmup)
            except Exception as e:  # OOM at larger batch: record WHY
                detail[key] = _short_err(e)
                continue
            pairs_per_s = bs / dt
            detail[key] = round(pairs_per_s, 4)
            if pairs_per_s > RESULT["value"]:
                RESULT["value"], RESULT["best_cfg"] = pairs_per_s, key
                # cost analysis needs ANOTHER multi-minute AOT compile over
                # the tunnel when cold — defer it to the final stage (it only
                # decorates the headline with MFU; the round-4 trial showed
                # it starving the train stage out of the budget)
                RESULT["mfu_probe"] = (reg_probe, params, mv, fx, bs, dt,
                                       dtype_name)


def measure_mfu():
    """Decorate the headline config with analytic-FLOPs MFU (deferred: the
    cost-analysis compile is expensive when cold)."""
    probe = RESULT.get("mfu_probe")
    if probe is None:
        return
    reg_probe, params, mv, fx, bs, dt, dtype_name = probe
    flops = _compiled_flops(reg_probe, params, mv, fx)
    if flops:
        tfs = flops / dt / 1e12
        RESULT["detail"].update({
            "model_tflop_fwd": round(flops / bs / 1e12, 4),
            "tflops_per_s": round(tfs, 2),
            "mfu": round(tfs / PEAK_TFLOPS[dtype_name], 4),
        })


def measure_train_step(iters=5, warmup=2, dtype_name="float32", batch_size=1):
    """Full train step (fwd+bwd+Adam) at 160x192x224 — captures the
    end-to-end training cost the reference never reports."""
    import jax
    import jax.numpy as jnp
    import voxelmorph_tpu as vxm
    from voxelmorph_tpu.models import VxmDense
    from voxelmorph_tpu.ops import pallas_conv
    from voxelmorph_tpu.training import LossTerm, Trainer

    # XLA conv holds the training path too. The conv kernel's bf16 train
    # steps crash the REMOTE Mosaic compile helper (HTTP 500 subprocess
    # exit 1 at bs1 and bs2, PROBE_bs1_r05) even though the LOCAL AOT
    # helper compiles the same bs2-bf16 step at 14.54 GiB where XLA OOMs
    # at 16.00 (scripts/train_mem_probe.py) — a toolchain discrepancy, so
    # the memory win is real but not deliverable over this tunnel. f32
    # additionally OOMs through the kernel VJP (16.95G, BENCH_trial_r05a).
    use_pallas_conv = os.environ.get("VXM_BENCH_PALLASCONV", "0") == "1"
    pallas_conv.set_pallas_conv(use_pallas_conv)
    RESULT["detail"][f"conv_path_train_{dtype_name}"] = (
        "pallas" if use_pallas_conv else "xla")

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    moving, fixed = _load_pair()
    if batch_size > 1:
        moving = np.repeat(moving, batch_size, axis=0)
        fixed = np.repeat(fixed, batch_size, axis=0)
    model = VxmDense(inshape=INSHAPE, int_steps=7, int_resolution=2, dtype=dtype)
    terms = [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=1.0, target_index=0),
        LossTerm("reg", vxm.losses.Grad("l2", loss_mult=2).loss, weight=0.01,
                 target_index=1, name="grad"),
    ]
    trainer = Trainer(model, terms, lr=1e-4)
    # params via the tiny-volume CPU init (shape-independent conv pytree) —
    # skips a second full-res init compile on the tunneled device
    small_params = _init_params_small(
        lambda s: VxmDense(inshape=s, int_steps=7, int_resolution=2,
                           dtype=dtype))
    trainer.init((moving, fixed), params=small_params)
    zeros = np.zeros((batch_size, *INSHAPE, 3), np.float32)

    # keep the batch device-resident: on a tunneled backend the host->device
    # transfer of two full volumes would otherwise dominate the measurement
    inputs = trainer._put((moving, fixed))
    targets = trainer._put((fixed, zeros))
    rng = jax.random.PRNGKey(0)
    step_idx = np.asarray(0, np.int32)

    def step():
        (trainer.params, trainer.state, trainer.opt_state,
         metrics) = trainer.step_fn(trainer.params, trainer.state,
                                    trainer.opt_state, rng, step_idx,
                                    inputs, targets)
        return metrics["loss"]

    for _ in range(warmup):
        float(step())
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + step()
    float(acc)  # one fetch synchronizes the whole chain
    return (time.perf_counter() - t0) / iters


def measure_vecint_ab(iters=10, warmup=2):
    """A/B the integration-resolution self-warp: gather vs Pallas kernel.

    Field: (1, 80, 96, 112, 3) — the int_resolution=2 SVF of the canonical
    volume. Measures one 7-step scaling-and-squaring integration.
    """
    import jax
    import jax.numpy as jnp
    from voxelmorph_tpu.ops import warp as W
    from voxelmorph_tpu.ops import pallas_interp

    shape = tuple(s // 2 for s in INSHAPE)
    rng = np.random.default_rng(1)
    # realistic magnitude: up to ~12 voxels of displacement pre-integration
    vec = jnp.asarray(
        12.0 * rng.standard_normal((1, *shape, 3)).astype(np.float32) / 3.0)

    out = RESULT["detail"]

    @jax.jit
    def integ_gather(v):
        r = W.integrate_vec_batched(v, nb_steps=7, window_halo=None)
        return jnp.sum(r[0, ::32, ::32, ::32]).astype(jnp.float32)

    out["vecint_gather_ms"] = round(
        _timed_chain(integ_gather, vec, iters=iters, warmup=warmup) * 1e3, 3)

    if pallas_interp.pallas_available():
        @jax.jit
        def integ_pallas(v):
            r = W.integrate_vec_batched(v, nb_steps=7, window_halo=2)
            return jnp.sum(r[0, ::32, ::32, ::32]).astype(jnp.float32)

        try:
            m, mn, sd = _timed_chain_stats(integ_pallas, vec,
                                           iters=iters, warmup=warmup)
            out["vecint_adaptive_pallas_ms"] = round(m * 1e3, 3)
            out["vecint_adaptive_pallas_ms_min"] = round(mn * 1e3, 3)
            out["vecint_adaptive_pallas_ms_std"] = round(sd * 1e3, 3)
        except Exception as e:
            out["vecint_adaptive_pallas_ms"] = _short_err(e)

        @jax.jit
        def warp_pallas_once(v):
            s = v[0] / 128.0
            r = pallas_interp.warp_bounded(s, s, 1)
            return jnp.sum(r[::32, ::32, ::32]).astype(jnp.float32)

        @jax.jit
        def warp_gather_once(v):
            s = v[0] / 128.0
            r = W.transform(s, s, window_halo=None)
            return jnp.sum(r[::32, ::32, ::32]).astype(jnp.float32)

        try:
            m, mn, sd = _timed_chain_stats(warp_pallas_once, vec,
                                           iters=iters, warmup=warmup)
            out["selfwarp_pallas_ms"] = round(m * 1e3, 3)
            out["selfwarp_pallas_ms_min"] = round(mn * 1e3, 3)
            out["selfwarp_pallas_ms_std"] = round(sd * 1e3, 3)
        except Exception as e:
            out["selfwarp_pallas_ms"] = _short_err(e)
        m, mn, sd = _timed_chain_stats(warp_gather_once, vec,
                                       iters=iters, warmup=warmup)
        out["selfwarp_gather_ms"] = round(m * 1e3, 3)
        out["selfwarp_gather_ms_min"] = round(mn * 1e3, 3)
        out["selfwarp_gather_ms_std"] = round(sd * 1e3, 3)

        # roofline estimates for the measured self-warp (halo=1, 3 channels):
        # pallas traffic = read vol+shift once, write once; flops = (2h+2)^3
        # weighted taps per voxel per channel. The gather path additionally
        # builds the 2^3-wide corner table (8x read + 8x write of the volume).
        voxels = float(np.prod(shape))
        nch = 3.0
        if isinstance(out.get("selfwarp_pallas_ms"), float):
            # roofline uses min-of-N: the best observation is the kernel's
            # demonstrated capability; the mean folds in tunnel noise
            t = out.get("selfwarp_pallas_ms_min", out["selfwarp_pallas_ms"]) / 1e3
            flops = voxels * nch * (3 ** 3) * 3 + voxels * 3 * 4  # taps + d_eff
            traffic = voxels * 4 * (nch * 2 + 3)  # vol in+out, 3 shift fields
            out["selfwarp_pallas_gflops"] = round(flops / t / 1e9, 1)
            out["selfwarp_pallas_gbps"] = round(traffic / t / 1e9, 1)
        if isinstance(out.get("selfwarp_gather_ms"), float):
            t = out.get("selfwarp_gather_ms_min", out["selfwarp_gather_ms"]) / 1e3
            # corner table: write 8x vol, then gather-read 8-wide rows + out
            traffic = voxels * 4 * nch * (1 + 8 + 8 + 8 + 1)
            out["selfwarp_gather_gbps_est"] = round(traffic / t / 1e9, 1)

        # full-resolution single-channel bounded warp (the phase-warp unit
        # of work): at 160x192x224 the kernel grid is large enough to hide
        # per-window DMA latency, so this — not the half-res 3-channel
        # self-warp above — is the bandwidth-representative measurement
        if pallas_interp.kernel_vmem_fits(INSHAPE, 1, 1):
            img = jnp.asarray(
                np.random.default_rng(2).standard_normal(
                    (*INSHAPE, 1)).astype(np.float32))
            sh = jnp.asarray(
                0.9 * np.random.default_rng(3).standard_normal(
                    (*INSHAPE, 3)).astype(np.float32))

            @jax.jit
            def warp_full_pallas(im, s):
                r = pallas_interp.warp_bounded(im, s, 1)
                return jnp.sum(r[::64, ::64, ::64]).astype(jnp.float32)

            try:
                m, mn, sd = _timed_chain_stats(warp_full_pallas, img, sh,
                                               iters=iters, warmup=warmup)
                out["fullres_warp_pallas_ms"] = round(m * 1e3, 3)
                out["fullres_warp_pallas_ms_min"] = round(mn * 1e3, 3)
                out["fullres_warp_pallas_ms_std"] = round(sd * 1e3, 3)
                vox = float(np.prod(INSHAPE))
                traffic = vox * 4 * (1 * 2 + 3)  # img in+out, 3 shift fields
                out["fullres_warp_pallas_gbps"] = round(
                    traffic / mn / 1e9, 1)
            except Exception as e:
                out["fullres_warp_pallas_ms"] = _short_err(e)


def measure_cpu_baseline():
    """One-off helper to (re)estimate the CPU baseline. Not run by default."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    measure_inference(batch_sizes=(1,), dtypes=("float32",), iters=2, warmup=1)
    print("cpu baseline:", RESULT["value"], RESULT["detail"])


if __name__ == "__main__":
    if "--cpu-baseline" in sys.argv:
        measure_cpu_baseline()
        sys.exit(0)
    threading.Thread(target=_watchdog, daemon=True).start()
    _log(f"starting, deadline {DEADLINE_S:.0f}s")

    # Tunnel preflight: the axon claim leg dials 127.0.0.1:8082 through the
    # relay. When the relay is dead, every device call HANGS (not errors) —
    # a run would burn its entire deadline blocked in C++ with nothing on
    # the record (observed r04d trial). Refused/timed-out connect -> say so
    # loudly and exit; a zero-value line with a named cause beats one
    # without.
    if os.environ.get("JAX_PLATFORMS", "axon") == "axon":
        import socket
        try:
            socket.create_connection(("127.0.0.1", 8082), timeout=5).close()
        except OSError as e:
            RESULT["detail"]["fatal"] = (
                f"TPU tunnel down: connect 127.0.0.1:8082 -> {e}; "
                "device calls would hang, not error — aborting before "
                "burning the deadline")
            _log(RESULT["detail"]["fatal"])
            _emit()
            sys.exit(0)

    _enable_compile_cache()

    detail = RESULT["detail"]
    detail["infer_bs8"] = ("skipped: diagnosed deterministic XLA OOM "
                           "(39.38G vs 15.75G hbm, BENCH_r03)")
    detail["headline_protocol"] = (
        "fused register fn (y_source + pos_flow), reference-exact "
        "single-gather warp; *_fastwarp keys measure the phase-warp path "
        "(2^2 bounded Pallas applications of the integration root; pos_flow "
        "and seg transport unchanged) — the headline takes the best config")

    # Stage 1 — the headline config ONLY: bs4-bf16 exact warp (best every
    # round). The round-4 trial showed the full bs1/2/4 sweep costs ~10 min
    # of tunneled compiles and starves the train stage even after it was
    # moved up; the headline needs one compile, so the sweep's tail moves to
    # stage 4.
    try:
        measure_inference(batch_sizes=(4,))
    except Exception as e:
        detail["inference_sweep"] = _short_err(e)

    # Stage 2 — train-step throughput. Moved AHEAD of the kernel A/B and the
    # f32 sweep: rounds 2 and 3 both ended with no training number on the
    # record because this stage ran last. bs1-f32 first — the wide gather
    # backward cut its warp backwards 4.3x (AB_gather_bwd_r04) so it holds
    # the deployable number — then bs2-bf16, which sits 253 MB over HBM
    # with the wide backward's table rebuild (recorded loud if it OOMs).
    best_train = 0.0
    for dtype_name, bs, min_s in (("float32", 1, 180), ("bfloat16", 2, 200),
                                  ("bfloat16", 1, 160)):
        key = f"train_step_s_bs{bs}_{'bf16' if dtype_name == 'bfloat16' else 'f32'}"
        if _remaining() < min_s:
            detail[key] = f"skipped: {_remaining():.0f}s left < {min_s}s gate"
            continue
        _log(f"measuring {key}")
        try:
            step_s = measure_train_step(dtype_name=dtype_name, batch_size=bs)
            detail[key] = round(step_s, 3)
            best_train = max(best_train, bs / step_s)
            # headline training throughput: best measured configuration (the
            # reference trains bs1-f32 by default, but nothing stops a TPU
            # user from batching — this is the deployable number)
            detail["train_pairs_per_s"] = round(best_train, 4)
        except Exception as e:
            detail[key] = _short_err(e)

    # Stage 3 — kernel A/B at integration resolution (small, fast compiles;
    # min-of-N stats so regressions are distinguishable from tunnel noise).
    if _remaining() > 90:
        try:
            _log("stage 3: vecint/kernel A/B")
            measure_vecint_ab()
        except Exception as e:
            detail["vecint_ab"] = _short_err(e)
    else:
        detail["vecint_ab"] = f"skipped: {_remaining():.0f}s left"

    # Stage 3b — headline MFU (deferred cost-analysis compile; near-free
    # when the persistent compile cache is warm).
    if _remaining() > 150:
        try:
            _log("stage 3b: MFU cost analysis")
            measure_mfu()
        except Exception as e:
            detail["mfu"] = _short_err(e)
    else:
        detail["mfu"] = f"skipped: {_remaining():.0f}s left"

    # Stage 4 — the phase-warp path at the headline batch size (the A/B that
    # quantifies it end-to-end; wins the headline if it beats the gather),
    # then the rest of the bf16 batch sweep (informational: bs 1/2).
    if _remaining() > 200:
        try:
            measure_inference(batch_sizes=(4,), fast_warp=True)
        except Exception as e:
            detail["inference_fastwarp"] = _short_err(e)
    else:
        detail["inference_fastwarp"] = f"skipped: {_remaining():.0f}s left"
    if _remaining() > 240:
        try:
            measure_inference(batch_sizes=(1, 2))
        except Exception as e:
            detail["inference_sweep_small_bs"] = _short_err(e)
    else:
        detail["inference_sweep_small_bs"] = f"skipped: {_remaining():.0f}s left"

    # Stage 5 — f32 inference sweep (informational; bf16 owns the headline).
    if _remaining() > 180:
        try:
            measure_inference(dtypes=("float32",))
        except Exception as e:
            detail["inference_sweep_f32"] = _short_err(e)
    else:
        detail["inference_sweep_f32"] = f"skipped: {_remaining():.0f}s left"

    _emit()
