#!/bin/bash
# Round-5 serial TPU job queue (single chip behind the axon tunnel).
# Waits for the tunnel to recover, then runs: hard-corpus teacher pretrain,
# all five distillation strategies (same seed/teacher), and per-strategy
# evaluation — the VERDICT r4 items 1 and 4.
set -u
cd /root/repo
LOG=artifacts/r5_queue.log
echo "=== r5 queue start $(date +%T) ===" >> "$LOG"

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((256,256))@jnp.ones((256,256))).sum()) > 0" 2>/dev/null
}

for i in $(seq 1 60); do
  if probe; then echo "tpu ok after probe $i $(date +%T)" >> "$LOG"; break; fi
  echo "probe $i failed $(date +%T)" >> "$LOG"
  sleep 120
done

run() { # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "--- $name start $(date +%T)" >> "$LOG"
  timeout "$to" "$@" > "artifacts/r5_$name.log" 2>&1
  echo "--- $name rc=$? end $(date +%T)" >> "$LOG"
}

PKG="python -m speech_enhancement_clskd_tpu"
HARD="data.synthetic=true data.synthetic_profile=hard"

run teacher_hard 4500 $PKG pretrain --model teacher \
  --out artifacts/r5_teacher_hard $HARD max_epochs=10

TB=artifacts/r5_teacher_hard/teacher_model.npz
for s in clskd spkd mse stft reviewkd; do
  EXTRA=""
  if [ "$s" = clskd ] || [ "$s" = reviewkd ]; then
    EXTRA="distill.abf_remat=true"
  fi
  run "distill_$s" 4000 $PKG distill --strategy "$s" --teacher-bundle "$TB" \
    --out "artifacts/r5_$s" $HARD max_epochs=5 seed=0 $EXTRA
done

for s in clskd spkd mse stft reviewkd; do
  run "eval_$s" 4000 $PKG evaluate \
    --bundle "artifacts/r5_$s/the_best_model.npz" \
    --results "artifacts/r5_$s/All_metric.json" \
    --examples "artifacts/r5_$s/examples" \
    $HARD data.synthetic_size=512
done

echo "=== r5 queue done $(date +%T) ===" >> "$LOG"
