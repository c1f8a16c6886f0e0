#!/bin/bash
# Round-4 queue 10 (final session): strict wall-clock budget, everything
# must be dead before the driver's official bench takes the chip.
# 1. bench warm run  -> fills /tmp/jax_cache so the driver's 780 s official
#    run hits compiled programs and finally records train throughput
# 2. HyperMorph retrain (half-res amortization population, ~120 epochs)
# 3. full-resolution lambda sweep of that checkpoint (VERDICT item 3)
cd /root/repo
echo "=== queue10 starting: $(date) ==="
mkdir -p artifacts_r4
END=${QUEUE10_END:?set QUEUE10_END to a unix deadline}
gate() {
  local r=$(( END - $(date +%s) ))
  [ -f /tmp/queue10_stop ] && { echo "stop marker at $1" >&2; return 1; }
  [ "$r" -lt 180 ] && { echo "deadline: skipping $1 (${r}s left)" >&2; return 1; }
  local cap=$2; [ "$r" -lt "$cap" ] && cap=$r
  echo "$cap"
}

T=$(gate benchwarm 1250) && {
echo "=== 1. bench warm (compile-cache fill for the driver run) ($T s): $(date) ==="
BENCH_DEADLINE_S=$(( T - 120 )) timeout "$T" python bench.py \
  > artifacts_r4/BENCH_trial_r04e.json 2>/tmp/bench_warm.err
echo "bench rc=$?"; tail -c 400 artifacts_r4/BENCH_trial_r04e.json; echo
}

T=$(gate hypertrain 820) && {
echo "=== 2. HyperMorph retrain, 120 epochs ($T s): $(date) ==="
timeout "$T" python scripts/train_hypermorph.py \
  --img-list data_synth/train_list.txt \
  --model-dir models_hyper_r4 --image-loss ncc \
  --cache-device --steps-per-dispatch 25 \
  --epochs 120 --steps-per-epoch 100 --save-freq 40 \
  > /tmp/hyper_r4.log 2>&1
echo "hyper rc=$? $(date)"; tail -2 models_hyper_r4/metrics.csv 2>/dev/null
cp -f models_hyper_r4/metrics.csv artifacts_r4/hyper_r4_metrics.csv 2>/dev/null
}

T=$(gate hypersweep 900) && {
echo "=== 3. HyperMorph lambda sweep at FULL res ($T s): $(date) ==="
CK=$(ls models_hyper_r4/0*.npz 2>/dev/null | tail -1)
[ -n "$CK" ] && {
  timeout "$T" python scripts/sweep_hypermorph.py --model "$CK" \
    --lambdas 0.0 0.1 0.25 0.5 0.75 1.0 \
    --out hypermorph_sweep_r4.json > /tmp/hyper_sweep_r4.log 2>&1
  echo "sweep rc=$? model=$CK"; tail -3 /tmp/hyper_sweep_r4.log
  cp -f "$CK" artifacts_r4/hyper_r4_$(basename $CK) 2>/dev/null
}
}

echo "=== queue10 done: $(date) ==="
