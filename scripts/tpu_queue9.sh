#!/bin/bash
# Round-4 queue 9: runs after the TPU tunnel returns.
# 1. warm bench trial (validates tz=2 override, warms compile cache for the
#    driver's official run)  2. HyperMorph retrain + full-res sweep
#  3. long pure-recipe SynthMorph continuation  4. unsup full-res retrain.
cd /root/repo
echo "=== queue9 starting: $(date) ==="
mkdir -p artifacts_r4
END=$(( $(date +%s) + ${QUEUE9_HOURS:-6}*3600 ))
gate() {
  local r=$(( END - $(date +%s) ))
  [ -f /tmp/queue9_stop ] && { echo "stop marker at $1" >&2; return 1; }
  [ "$r" -lt 240 ] && { echo "deadline: skipping $1 (${r}s left)" >&2; return 1; }
  local cap=$2; [ "$r" -lt "$cap" ] && cap=$r
  echo "$cap"
}

T=$(gate bench 1200) && {
echo "=== 1. bench trial (tz override validation + cache warm) ($T s): $(date) ==="
BENCH_DEADLINE_S=1050 timeout "$T" python bench.py > artifacts_r4/BENCH_trial_r04e.json 2>/tmp/bench_trial_r04e.err
echo "bench rc=$?"; tail -c 500 artifacts_r4/BENCH_trial_r04e.json; echo
}

T=$(gate pallasab 2700) && {
echo "=== 1b. kernel A/B: fwd tz/th/bf16 + bwd th sweeps ($T s): $(date) ==="
timeout "$T" python scripts/pallas_ab.py --fullres \
  --out artifacts_r4/AB_selfwarp_tz_r04.json \
  > /tmp/pallas_ab.log 2>/tmp/pallas_ab.err
echo "pallas_ab rc=$?"; tail -c 400 artifacts_r4/AB_selfwarp_tz_r04.json; echo
}

T=$(gate hypertrain 1400) && {
echo "=== 2. HyperMorph retrain, half-res population, 150 epochs ($T s): $(date) ==="
timeout "$T" python scripts/train_hypermorph.py \
  --img-list data_synth/train_list.txt \
  --model-dir models_hyper_r4 --image-loss ncc \
  --cache-device --steps-per-dispatch 25 \
  --epochs 150 --steps-per-epoch 100 --save-freq 50 \
  > /tmp/hyper_r4.log 2>&1
echo "hyper rc=$? $(date)"; grep -E "epoch " /tmp/hyper_r4.log | tail -1
cp -f models_hyper_r4/metrics.csv artifacts_r4/hyper_r4_metrics.csv 2>/dev/null
}

T=$(gate hypersweep 1800) && {
echo "=== 3. HyperMorph lambda sweep at FULL res ($T s): $(date) ==="
CK=$(ls models_hyper_r4/0*.npz 2>/dev/null | tail -1)
timeout "$T" python scripts/sweep_hypermorph.py --model "$CK" \
  --out hypermorph_sweep_r4.json > /tmp/hyper_sweep_r4.log 2>&1
echo "sweep rc=$? model=$CK"; tail -3 /tmp/hyper_sweep_r4.log
[ -n "$CK" ] && cp -f "$CK" artifacts_r4/hyper_r4_$(basename $CK) 2>/dev/null
}

T=$(gate anneal025 1400) && {
echo "=== 4a. anneal image term 0.5->0.25, 1000 steps ($T s): $(date) ==="
timeout "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir models_synth_r4 --sub-dir phaseBw25 \
  --out-labels data_gen/eval_labels.npy \
  --init-weights models_synth_r4/phaseBwean/00006.npz \
  --shared-contrast 0.5 --image-loss-weight 0.25 \
  --dtype bfloat16 --lr 1e-4 --clip-grad 1.0 \
  --cache-device --steps-per-dispatch 25 \
  --epochs 10 --steps-per-epoch 100 --save-freq 5 \
  > /tmp/anneal025.log 2>&1
echo "anneal025 rc=$? $(date)"; grep -E "epoch " /tmp/anneal025.log | tail -1
}

T=$(gate anneal010 1400) && {
echo "=== 4b. anneal image term 0.25->0.1, 1000 steps ($T s): $(date) ==="
CK=$(ls models_synth_r4/phaseBw25/0*.npz 2>/dev/null | tail -1)
[ -z "$CK" ] && CK=models_synth_r4/phaseBwean/00006.npz
timeout "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir models_synth_r4 --sub-dir phaseBw10 \
  --out-labels data_gen/eval_labels.npy \
  --init-weights "$CK" \
  --shared-contrast 0.5 --image-loss-weight 0.1 \
  --dtype bfloat16 --lr 1e-4 --clip-grad 1.0 \
  --cache-device --steps-per-dispatch 25 \
  --epochs 10 --steps-per-epoch 100 --save-freq 5 \
  > /tmp/anneal010.log 2>&1
echo "anneal010 rc=$? $(date)"; grep -E "epoch " /tmp/anneal010.log | tail -1
}

T=$(gate purelong 7000) && {
echo "=== 4c. PURE Dice+Grad from the annealed net, 4000+ steps ($T s): $(date) ==="
CK=$(ls models_synth_r4/phaseBw10/0*.npz 2>/dev/null | tail -1)
[ -z "$CK" ] && CK=models_synth_r4/phaseBpure/00010.npz
timeout "$T" python scripts/train_synthmorph.py \
  --label-dir 'data_synth/lab_*.npz' \
  --model-dir models_synth_r4 --sub-dir phaseBpure2 \
  --out-labels data_gen/eval_labels.npy \
  --init-weights "$CK" \
  --dtype bfloat16 --lr 1e-4 --clip-grad 1.0 \
  --cache-device --steps-per-dispatch 25 \
  --epochs 40 --steps-per-epoch 100 --save-freq 5 \
  > /tmp/purelong.log 2>&1
echo "purelong rc=$? $(date)"; grep -E "epoch " /tmp/purelong.log | tail -1
cp -f models_synth_r4/phaseBpure2/metrics.csv artifacts_r4/purelong_metrics.csv 2>/dev/null
}

T=$(gate pureeval 2400) && {
echo "=== 5. eval annealed + pure checkpoints at FULL res ($T s): $(date) ==="
CKS="$(ls models_synth_r4/phaseBw10/0*.npz 2>/dev/null | tail -1) $(ls models_synth_r4/phaseBpure2/0*.npz 2>/dev/null | tail -3 | tr '\n' ' ')"
timeout "$T" python scripts/eval_many.py --out-dir artifacts_r4/evals_pure \
  $CKS > /tmp/evalpure.log 2>&1
echo "evalpure rc=$?"; grep -E '"dice_mean"' /tmp/evalpure.log | tail -4
}

T=$(gate unsuptrain 8000) && {
echo "=== 6. unsupervised VxmDense retrain, full res, NCC, bf16 ($T s): $(date) ==="
timeout "$T" python scripts/train.py \
  --img-list data_gen/train_list.txt \
  --model-dir models_unsup_r4 --image-loss ncc --lambda 1 \
  --dtype bfloat16 --cache-device --steps-per-dispatch 10 \
  --epochs 60 --steps-per-epoch 100 --save-freq 20 \
  > /tmp/unsup_r4.log 2>&1
echo "unsup rc=$? $(date)"; grep -E "epoch " /tmp/unsup_r4.log | tail -1
cp -f models_unsup_r4/metrics.csv artifacts_r4/unsup_r4_metrics.csv 2>/dev/null
}

T=$(gate unsupeval 1500) && {
echo "=== 7. unsupervised eval (12 full-res pairs) ($T s): $(date) ==="
CKS=$(ls models_unsup_r4/0*.npz 2>/dev/null | tail -2 | tr '\n' ' ')
timeout "$T" python scripts/eval_many.py --out-dir artifacts_r4/evals_unsup \
  $CKS > /tmp/evalunsup.log 2>&1
echo "evalunsup rc=$?"; grep -E '"dice_mean"' /tmp/evalunsup.log | tail -2
}

T=$(gate perfbreak 1600) && {
echo "=== 7b. perf_breakdown refresh (post wide-gather-backward) ($T s): $(date) ==="
timeout "$T" python scripts/perf_breakdown.py --dtype float32 \
  > /tmp/perfbreak_f32.json 2>/tmp/perfbreak.err
timeout 600 python scripts/perf_breakdown.py --dtype bfloat16 \
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
json.dump(out, open("PERF_BREAKDOWN_r04.json", "w"), indent=1)
PYEOF
echo "perfbreak done"; tail -c 300 PERF_BREAKDOWN_r04.json; echo
}

T=$(gate probscont 7000) && {
echo "=== 8. probs NCC+KL continuation, epochs 50->90 ($T s): $(date) ==="
timeout "$T" python scripts/train.py \
  --img-list data_gen/train_list.txt --model-dir models_probs_r4 \
  --use-probs --image-loss ncc --kl-lambda 25 --lambda 0.1 \
  --dtype bfloat16 --cache-device --steps-per-dispatch 25 \
  --load-weights latest --initial-epoch 50 \
  --epochs 90 --steps-per-epoch 100 --save-freq 10 \
  > /tmp/probs_cont.log 2>&1
echo "probscont rc=$? $(date)"; grep -E "epoch " /tmp/probs_cont.log | tail -1
cp -f models_probs_r4/metrics.csv artifacts_r4/probs_ncc_metrics.csv 2>/dev/null
}

T=$(gate probseval 1500) && {
echo "=== 9. eval probs continuation checkpoints ($T s): $(date) ==="
CKS=$(ls models_probs_r4/00[6-9]0.npz 2>/dev/null | tr '\n' ' ')
[ -n "$CKS" ] && timeout "$T" python scripts/eval_many.py \
  --out-dir artifacts_r4/evals_probs $CKS > /tmp/evalprobs2.log 2>&1
echo "probseval rc=$?"; grep -E '"dice_mean"' /tmp/evalprobs2.log | tail -4
}

echo "=== queue9 done: $(date) ==="
