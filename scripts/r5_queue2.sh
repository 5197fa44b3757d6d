#!/bin/bash
# Round-5 phase 2: bench rows + serving benchmark (run after r5_queue.sh).
# Items: the two timed-out round-4 confirmations (formal f32 row, batch-64
# bf16 multi-epoch confirm), the round-5 byte-cut measurements (bn2 fold,
# gram groups), and the serving RTF/latency table.
set -u
cd /root/repo
LOG=artifacts/r5_queue2.log
echo "=== r5 phase2 start $(date +%T) ===" >> "$LOG"

run() { # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "--- $name start $(date +%T)" >> "$LOG"
  timeout "$to" "$@" > "artifacts/r5_$name.log" 2>&1
  echo "--- $name rc=$? end $(date +%T)" >> "$LOG"
}

PKG="python -m speech_enhancement_clskd_tpu"

# formal f32 bench row (round-4 loose end; compile ~15-20 min via tunnel)
run bench_f32 5400 python bench.py --dtype float32 --abf-remat --batch 32

# bf16 b64 baseline re-run + the two round-5 byte-cut candidates
run bench_b64 3600 python bench.py
run bench_b64_bn2fold 3600 python bench.py --bn2-fold
run bench_b64_gram8 3600 python bench.py --gram-groups 8
# batch-32 variants for the docs/PERF.md keep/kill table
run bench_b32_bn2fold 3600 python bench.py --batch 32 --bn2-fold
run bench_b32 3600 python bench.py --batch 32

# batch-64 bf16 multi-epoch streamed confirm (round-4 loose end)
run b64_confirm 4500 $PKG distill --strategy clskd \
  --teacher-bundle artifacts/r4_teacher/teacher_model.npz \
  --out artifacts/r5_b64_confirm data.synthetic=true data.batch_size=64 \
  max_epochs=3 teacher.compute_dtype=bfloat16 \
  student.compute_dtype=bfloat16 distill.taps_dtype=bfloat16

# serving benchmark (streaming RTF + chunk latency + offline RTF)
run serving 4500 python bench_serving.py \
  --bundle artifacts/r4_distill/the_best_model.npz --out SERVING_r05.json

echo "=== r5 phase2 done $(date +%T) ===" >> "$LOG"
