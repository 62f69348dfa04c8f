#!/bin/bash
# Round-5 TPU queue 4: follow-ups that depend on queue-3 state. Waits for
# queue 3 (pid file /tmp/queue3.pid) to drain, then runs serially:
#   glm-ab-poisson   price the round-5 poisson fused wiring vs the jnp
#                    path (glm_ab --family poisson), like the binomial
#                    delegation A/B
#   vf-c2            config-2 floor coverage: the ladder's last
#                    collected-scalar-only floor (166.2k/s) gets the
#                    measured all-param streaming floor + sampled-beta
#                    protocol (fast config; seconds of sampling)
cd /root/repo || exit 1
P=/opt/venv/bin/python
LOG=benchmarks/results/r5_logs
mkdir -p "$LOG"

if [ -f /tmp/queue3.pid ]; then
  while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  name=$1; shift
  echo "=== $name START $(date -u +%FT%TZ): $*" >> "$LOG/queue.log"
  timeout 5400 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name EXIT $? $(date -u +%FT%TZ)" >> "$LOG/queue.log"
}

run glm-ab-poisson $P -m benchmarks.glm_ab --family poisson
run vf-c2          $P -m benchmarks.verify_floor --preset hier-logistic-100
echo "=== QUEUE4 DONE $(date -u +%FT%TZ)" >> "$LOG/queue.log"
