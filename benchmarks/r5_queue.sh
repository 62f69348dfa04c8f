#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 items 1-4): serial runs on the
# one real chip, each logged to benchmarks/results/r5_logs/<name>.log.
# Items:
#   c5-newton-full  item 1a: mala-100k-newton at its baked FULL schedule
#   vf-c5-newton    item 1b: floor-coverage protocol on the Newton arm
#   vf-c5-mala      item 1c: same on the MALA arm (full schedule)
#   vf-c3           item 2a: floor coverage for config 3 (beta_g + beta_s;
#                   sample-groups 16/block keeps the (512,16384,96) collect
#                   buffer + concat peak under ~10 GB HBM)
#   vf-c4           item 2b: floor coverage for config 4 (size-stratified)
#   floor-cap       item 3: re-measure the judged floor cap under Newton
#   c3-seed{1,2}    item 4: sampler-seed variance of config 3's gate margin
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

run c5-newton-full $P -m benchmarks.run --preset mala-100k-newton --out benchmarks/results
run vf-c5-newton   $P -m benchmarks.verify_floor --preset mala-100k-newton
run vf-c5-mala     $P -m benchmarks.verify_floor --preset mala-100k
run vf-c3          $P -m benchmarks.verify_floor --preset nested-poisson-1k --sample-groups 16
run vf-c4          $P -m benchmarks.verify_floor --preset ragged-10k
run floor-cap      $P -m benchmarks.floor_cap
run c3-seed1       $P -m benchmarks.run --preset nested-poisson-1k --run-seed 1 --out benchmarks/results
run c3-seed2       $P -m benchmarks.run --preset nested-poisson-1k --run-seed 2 --out benchmarks/results
echo "=== QUEUE DONE $(date -u +%FT%TZ)" >> "$LOG/queue.log"
