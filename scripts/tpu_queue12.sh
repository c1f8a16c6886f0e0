#!/bin/bash
# Round-5 queue, part 2: reprioritized split of the remaining TPU window.
# queue11 runs the two anneal stages (item 4 ramp); this queue takes over
# the chip for HyperMorph (item 3, certain deliverable) BEFORE the pure
# phase + evals (item 4 payoff, research risk) so neither starves the
# other. Waits for queue11's bash to exit (stop marker skips its tail).
cd /root/repo
echo "=== queue12 starting: $(date) ==="
mkdir -p artifacts_r5
END=${QUEUE12_END:?set QUEUE12_END to a unix deadline}

if false; then
  while kill -0 "$(cat /tmp/queue11.pid)" 2>/dev/null; do sleep 10; done
fi
echo "=== queue11 drained: $(date) ==="

gate() {
  local r=$(( END - $(date +%s) ))
  [ -f /tmp/queue12_stop ] && { echo "SKIP $1: stop marker" >&2; return 1; }
  [ "$r" -lt 240 ] && { echo "SKIP $1: deadline (${r}s left)" >&2; return 1; }
  local cap=$2; [ "$r" -lt $(( cap + 120 )) ] && cap=$(( r - 120 ))
  echo "$cap"
}

T=$(gate hypertrain 1500) && {
echo "=== HyperMorph retrain, 150 epochs half-res ($T s): $(date) ==="
timeout -k 30 "$T" python scripts/train_hypermorph.py \
  --img-list data_synth/train_list.txt \
  --model-dir models_hyper_r5 --image-loss ncc \
  --cache-device --steps-per-dispatch 25 \
  --epochs 150 --steps-per-epoch 100 --save-freq 50 \
  > /tmp/hyper_r5.log 2>&1
echo "hyper rc=$? $(date)"; grep -E "epoch " /tmp/hyper_r5.log | tail -1
cp -f models_hyper_r5/metrics.csv artifacts_r5/hyper_r5_metrics.csv 2>/dev/null
}

T=$(gate hypersweep 1500) && {
echo "=== HyperMorph lambda sweep at FULL res ($T s): $(date) ==="
CK=$(ls models_hyper_r5/0*.npz 2>/dev/null | tail -1)
if [ -z "$CK" ]; then echo "SKIP hypersweep: no checkpoint" >&2; else
  timeout -k 30 "$T" python scripts/sweep_hypermorph.py --model "$CK" \
    --lambdas 0.0 0.1 0.25 0.5 0.75 0.9 1.0 \
    --out hypermorph_sweep_r5.json > /tmp/hyper_sweep_r5.log 2>&1
  echo "sweep rc=$? model=$CK"; tail -3 /tmp/hyper_sweep_r5.log
  cp -f "$CK" artifacts_r5/hyper_r5_$(basename $CK) 2>/dev/null
fi
}

T=$(gate pure 1100) && {
echo "=== PURE Dice+Grad from the annealed net ($T s): $(date) ==="
CK=$(ls models_synth_r5/w10/0*.npz 2>/dev/null | tail -1)
[ -z "$CK" ] && { echo "SKIP pure: no w10 checkpoint" >&2; CK=""; }
[ -n "$CK" ] && timeout -k 30 "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir models_synth_r5 --sub-dir pure \
  --init-weights "$CK" \
  --dtype bfloat16 --lr 5e-5 --clip-grad 1.0 \
  --cache-device --steps-per-dispatch 25 \
  --epochs 10 --steps-per-epoch 100 --save-freq 2 \
  > /tmp/pure.log 2>&1
echo "pure rc=$? $(date)"; grep -E "epoch " /tmp/pure.log | tail -1
}

T=$(gate synth_evals 1400) && {
echo "=== eval anneal+pure checkpoints at FULL res ($T s): $(date) ==="
CKS="$(ls models_synth_r5/pure/0*.npz 2>/dev/null | tail -2 | tr '\n' ' ') \
     $(ls models_synth_r5/w10/0*.npz 2>/dev/null | tail -1) \
     $(ls models_synth_r5/w25/0*.npz 2>/dev/null | tail -1)"
[ -z "${CKS// /}" ] && echo "SKIP synth_evals: no checkpoints" >&2
[ -n "${CKS// /}" ] && timeout -k 30 "$T" python scripts/eval_many.py \
  --out-dir artifacts_r5/evals_anneal $CKS > /tmp/evalanneal.log 2>&1
echo "synth_evals rc=$?"; grep -hE '"dice_mean"' artifacts_r5/evals_anneal/*.json 2>/dev/null | tail -6
}

T=$(gate fullres_synth_step 700) && {
echo "=== full-res SynthMorph train-step timing (VERDICT item 5) ($T s): $(date) ==="
timeout -k 30 "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir /tmp/fullres_probe --out-shape 160 192 224 \
  --dtype bfloat16 --cache-device --steps-per-dispatch 1 \
  --epochs 3 --steps-per-epoch 5 --save-freq 99 \
  > /tmp/fullres_step.log 2>&1
echo "fullres_step rc=$?"; grep -E "epoch " /tmp/fullres_step.log | tail -3
grep -E "epoch " /tmp/fullres_step.log | tail -3 \
  > artifacts_r5/fullres_synth_step_r05.txt
}

T=$(gate perfbreak 700) && {
echo "=== perf breakdown r05, bf16 (reconciliation vs BENCH) ($T s): $(date) ==="
timeout -k 30 "$T" python scripts/perf_breakdown.py --dtype bfloat16 \
  > /tmp/perfbreak_bf16.json 2>/tmp/perfbreak.err
timeout -k 30 400 python scripts/perf_breakdown.py --dtype float32 \
  > /tmp/perfbreak_f32.json 2>>/tmp/perfbreak.err
python - <<'PYEOF'
import json
out = {}
for name, path in (("float32", "/tmp/perfbreak_f32.json"),
                   ("bfloat16", "/tmp/perfbreak_bf16.json")):
    try:
        out[name] = json.load(open(path))
    except Exception as e:
        out[name] = f"failed: {e}"
json.dump(out, open("PERF_BREAKDOWN_r05.json", "w"), indent=1)
PYEOF
echo "perfbreak done"; tail -c 300 PERF_BREAKDOWN_r05.json; echo
}

echo "=== queue12 done: $(date) ==="
