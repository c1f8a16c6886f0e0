#!/bin/bash
# Round-5 queue: the quality/demonstration backlog (VERDICT r04 items 3, 4,
# 5, 7, 8) as one serialized TPU pipeline. Perf/kernel work (items 1, 2)
# runs interactively outside this queue.
#
# ADVICE r04 fixes baked in: dataset existence is checked up front (the
# round-4 retrain died on a gitignored list), every timeout gets -k 30 so
# a SIGTERM-deaf JAX process cannot hold the chip past the deadline, the
# deadline clamp reserves 120 s, and every skipped stage logs WHY.
cd /root/repo
echo "=== queue11 starting: $(date) ==="
mkdir -p artifacts_r5
END=${QUEUE11_END:?set QUEUE11_END to a unix deadline}

# --- preflight: regenerate gitignored datasets if absent (ADVICE item 1)
[ -f data_gen/train_list.txt ] || {
  echo "preflight: regenerating data_gen" >&2
  python scripts/make_eval_dataset.py --num-train 40 --num-test 12 \
    > /tmp/regen_gen.log 2>&1 || { echo "regen data_gen FAILED" >&2; }
}
[ -f data_synth/train_list.txt ] || {
  echo "preflight: regenerating data_synth" >&2
  python scripts/make_synth_labels.py --augment 2 \
    > /tmp/regen_synth.log 2>&1 || { echo "regen synth FAILED" >&2; }
}
[ -f data_gen/labels30.npy ] || python - <<'EOF'
import numpy as np
np.save("data_gen/labels30.npy",
        np.load("/root/reference/data/labels.npz")["labels"])
EOF

gate() {
  local r=$(( END - $(date +%s) ))
  [ -f /tmp/queue11_stop ] && { echo "SKIP $1: stop marker" >&2; return 1; }
  [ "$r" -lt 300 ] && { echo "SKIP $1: deadline (${r}s left)" >&2; return 1; }
  local cap=$2; [ "$r" -lt $(( cap + 120 )) ] && cap=$(( r - 120 ))
  echo "$cap"
}

WEAN=artifacts_r4/synth_wean_00006.npz

T=$(gate anneal025 1500) && {
echo "=== anneal image term 0.5->0.25, 1000 steps ($T s): $(date) ==="
timeout -k 30 "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir models_synth_r5 --sub-dir w25 \
  --init-weights "$WEAN" \
  --shared-contrast 0.5 --image-loss-weight 0.25 \
  --dtype bfloat16 --lr 1e-4 --clip-grad 1.0 \
  --cache-device --steps-per-dispatch 25 \
  --epochs 10 --steps-per-epoch 100 --save-freq 5 \
  > /tmp/anneal025.log 2>&1
echo "anneal025 rc=$? $(date)"; grep -E "epoch " /tmp/anneal025.log | tail -1
}

T=$(gate anneal010 1500) && {
echo "=== anneal image term 0.25->0.1, 1000 steps ($T s): $(date) ==="
CK=$(ls models_synth_r5/w25/0*.npz 2>/dev/null | tail -1)
[ -z "$CK" ] && { CK=$WEAN; echo "anneal010: w25 ckpt missing, from wean" >&2; }
timeout -k 30 "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir models_synth_r5 --sub-dir w10 \
  --init-weights "$CK" \
  --shared-contrast 0.5 --image-loss-weight 0.1 \
  --dtype bfloat16 --lr 1e-4 --clip-grad 1.0 \
  --cache-device --steps-per-dispatch 25 \
  --epochs 10 --steps-per-epoch 100 --save-freq 5 \
  > /tmp/anneal010.log 2>&1
echo "anneal010 rc=$? $(date)"; grep -E "epoch " /tmp/anneal010.log | tail -1
}

T=$(gate pure 2600) && {
echo "=== PURE Dice+Grad from the annealed net ($T s): $(date) ==="
CK=$(ls models_synth_r5/w10/0*.npz 2>/dev/null | tail -1)
[ -z "$CK" ] && { echo "SKIP pure: no w10 checkpoint" >&2; CK=""; }
[ -n "$CK" ] && timeout -k 30 "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir models_synth_r5 --sub-dir pure \
  --init-weights "$CK" \
  --dtype bfloat16 --lr 5e-5 --clip-grad 1.0 \
  --cache-device --steps-per-dispatch 25 \
  --epochs 20 --steps-per-epoch 100 --save-freq 5 \
  > /tmp/pure.log 2>&1
echo "pure rc=$? $(date)"; grep -E "epoch " /tmp/pure.log | tail -1
}

T=$(gate synth_evals 2800) && {
echo "=== eval anneal+pure checkpoints at FULL res ($T s): $(date) ==="
CKS="$(ls models_synth_r5/w25/0*.npz 2>/dev/null | tail -1) \
     $(ls models_synth_r5/w10/0*.npz 2>/dev/null | tail -1) \
     $(ls models_synth_r5/pure/0*.npz 2>/dev/null | tail -4 | tr '\n' ' ')"
[ -z "${CKS// /}" ] && echo "SKIP synth_evals: no checkpoints" >&2
[ -n "${CKS// /}" ] && timeout -k 30 "$T" python scripts/eval_many.py \
  --out-dir artifacts_r5/evals_anneal $CKS > /tmp/evalanneal.log 2>&1
echo "synth_evals rc=$?"; grep -hE '"dice_mean"' artifacts_r5/evals_anneal/*.json 2>/dev/null | tail -6
}

T=$(gate hypertrain 1600) && {
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

T=$(gate hypersweep 2000) && {
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

T=$(gate fullres_synth_step 1100) && {
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

T=$(gate perfbreak 2000) && {
echo "=== perf breakdown r05 (bench-consistent timing) ($T s): $(date) ==="
timeout -k 30 "$T" python scripts/perf_breakdown.py --dtype float32 \
  > /tmp/perfbreak_f32.json 2>/tmp/perfbreak.err
timeout -k 30 700 python scripts/perf_breakdown.py --dtype bfloat16 \
  > /tmp/perfbreak_bf16.json 2>>/tmp/perfbreak.err
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

T=$(gate unsuptrain 2600) && {
echo "=== unsupervised VxmDense retrain, full res, NCC, bf16 ($T s): $(date) ==="
timeout -k 30 "$T" python scripts/train.py \
  --img-list data_gen/train_list.txt \
  --model-dir models_unsup_r5 --image-loss ncc --lambda 1 \
  --dtype bfloat16 --cache-device --steps-per-dispatch 10 \
  --epochs 40 --steps-per-epoch 100 --save-freq 10 \
  > /tmp/unsup_r5.log 2>&1
echo "unsup rc=$? $(date)"; grep -E "epoch " /tmp/unsup_r5.log | tail -1
cp -f models_unsup_r5/metrics.csv artifacts_r5/unsup_r5_metrics.csv 2>/dev/null
}

T=$(gate unsupeval 1600) && {
echo "=== unsupervised eval, 12 full-res pairs -> QUALITY_r05 ($T s): $(date) ==="
CK=$(ls models_unsup_r5/0*.npz 2>/dev/null | tail -1)
if [ -z "$CK" ]; then echo "SKIP unsupeval: no checkpoint" >&2; else
  timeout -k 30 "$T" python scripts/run_quality_eval.py --model "$CK" \
    --out QUALITY_r05.json > /tmp/evalunsup_r5.log 2>&1
  echo "unsupeval rc=$?"; grep -E '"dice_mean"' QUALITY_r05.json
  cp -f "$CK" artifacts_r5/unsup_r5_$(basename $CK) 2>/dev/null
fi
}

T=$(gate semitrain 2200) && {
echo "=== semisupervised retrain, 20 scans ($T s): $(date) ==="
head -20 data_gen/train_list.txt > data_gen/train_list20.txt
timeout -k 30 "$T" python scripts/train_semisupervised_seg.py \
  --img-list data_gen/train_list20.txt --labels data_gen/labels30.npy \
  --model-dir models_semi_r5 --image-loss ncc \
  --grad-loss-weight 1 --dice-loss-weight 0.5 \
  --dtype bfloat16 --cache-device \
  --epochs 40 --steps-per-epoch 100 --save-freq 10 \
  > /tmp/semi_r5.log 2>&1
echo "semi rc=$? $(date)"; grep -E "epoch " /tmp/semi_r5.log | tail -1
}

T=$(gate semieval 1600) && {
echo "=== semisupervised eval, 12 pairs -> QUALITY_r05_semisupervised ($T s): $(date) ==="
CK=$(ls models_semi_r5/0*.npz 2>/dev/null | tail -1)
if [ -z "$CK" ]; then echo "SKIP semieval: no checkpoint" >&2; else
  timeout -k 30 "$T" python scripts/run_quality_eval.py --model "$CK" \
    --out QUALITY_r05_semisupervised.json > /tmp/evalsemi_r5.log 2>&1
  echo "semieval rc=$?"; grep -E '"dice_mean"' QUALITY_r05_semisupervised.json
  cp -f "$CK" artifacts_r5/semi_r5_$(basename $CK) 2>/dev/null
fi
}


T=$(gate benchwarm 1400) && {
echo "=== bench warm (compile cache for the driver's official run) ($T s): $(date) ==="
BENCH_DEADLINE_S=$(( T - 120 )) timeout -k 30 "$T" python bench.py \
  > artifacts_r5/BENCH_trial_r05.json 2>/tmp/bench_warm.err
echo "bench rc=$?"; tail -c 500 artifacts_r5/BENCH_trial_r05.json; echo
}

echo "=== queue11 done: $(date) ==="
