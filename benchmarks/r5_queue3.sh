#!/bin/bash
# Round-5 TPU queue 3: everything still outstanding after the first queue
# died with its session (queue.log: vf-c3 OOM'd pre-fix, floor-cap barely
# started, c3 seeds + all of queue2 never ran). Serial on the one chip:
#   vf-c3-retry      VERDICT item 2: config-3 floor coverage (rank-norm
#                    chunk now sized to (C, D) [6543231]; verify_floor now
#                    also forces full_rhat so the MEASURED all-param floor
#                    is reported for presets that do not bake it)
#   c5-newton-8192   VERDICT item 1: the baked 4096-draw schedule FAILED
#                    its gate (1.0143, mala-100k-newton_3102ff0); R-hat-1
#                    ~ 1/ESS says 8192 converges
#   vf-c5n-8192      floor protocol on the (converged) Newton arm at 8192
#   floor-cap        VERDICT item 3: judged floor cap under frozen Newton
#   c3-seed{1,2}     VERDICT item 4: sampler-seed variance of config 3's
#                    0.0011 gate margin
#   glm-ab           VERDICT item 8: fused delegation vs jnp path, measured
#   vf-c4-rerun      config-4 measured all-param streaming floor (the
#                    first run predates the full_rhat forcing: null)
#   bench-judged     refresh the judged headline at HEAD
cd /root/repo || exit 1
P=/opt/venv/bin/python
LOG=benchmarks/results/r5_logs
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name START $(date -u +%FT%TZ): $*" >> "$LOG/queue.log"
  timeout 5400 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name EXIT $? $(date -u +%FT%TZ)" >> "$LOG/queue.log"
}

run vf-c3-retry    $P -m benchmarks.verify_floor --preset nested-poisson-1k --sample-groups 16
run c5-newton-8192 $P -m benchmarks.run --preset mala-100k-newton --draws 8192 --out benchmarks/results
run vf-c5n-8192    $P -m benchmarks.verify_floor --preset mala-100k-newton --draws 8192
run floor-cap      $P -m benchmarks.floor_cap
run c3-seed1       $P -m benchmarks.run --preset nested-poisson-1k --run-seed 1 --out benchmarks/results
run c3-seed2       $P -m benchmarks.run --preset nested-poisson-1k --run-seed 2 --out benchmarks/results
run glm-ab         $P -m benchmarks.glm_ab
run vf-c4-rerun    $P -m benchmarks.verify_floor --preset ragged-10k
run bench-judged   $P bench.py
echo "=== QUEUE3 DONE $(date -u +%FT%TZ)" >> "$LOG/queue.log"
