#!/bin/bash
# Round-5 TPU queue 2 (after r5_queue.sh):
#   c5-newton-8192  VERDICT item 1: the variant's baked 4096-draw schedule
#                   FAILED its gate (R-hat 1.0143, artifact
#                   mala-100k-newton_3102ff0); R-hat ~ 1/draws says 8192
#                   converges. Also reports the streaming all-param floor.
#   bench-judged    refresh the judged headline at HEAD (adds the streaming
#                   all-param ESS floor to the metric line)
#   glm-ab          VERDICT item 8: measured fused-delegation vs jnp-path
#                   A/B for the generic GLM surface (binomial, judged-like
#                   shape, Newton)
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

run vf-c3-retry   $P -m benchmarks.verify_floor --preset nested-poisson-1k --sample-groups 16
run c5-newton-8192 $P -m benchmarks.run --preset mala-100k-newton --draws 8192 --out benchmarks/results
run bench-judged   $P bench.py
run glm-ab         $P -m benchmarks.glm_ab
echo "=== QUEUE2 DONE $(date -u +%FT%TZ)" >> "$LOG/queue.log"
