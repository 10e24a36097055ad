#!/bin/bash
# Pending on-chip measurement battery (run when the axon tunnel is
# healthy — probe first with `timeout 1450 python bench.py`; exit 2 +
# "watchdog" on stderr means still wedged, a JSON line means go).
#
# Context (late round 3): the tunnel was down for the back half of the
# round, so these measured-on-CPU items still need their on-chip runs:
#   1. bench.py             — headline (expect >= 8.3M fits/s; also has
#                             VarPro + gridded ablation lines on stderr)
#   2. sweep_f32.py         — f32 scoreboards incl. the 28/28 VarPro
#                             boards (CPU) to confirm on-chip
#   3. bench_lm_iteration.py — gridded-exp matched eval pair
#   4. bench_geodesic.py    — geodesic-vs-plain on the sloppy batch
#                             (CPU pilot ~2x)
# Record results in benchmarks/README.md (update the "pending tunnel"
# notes) and commit.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip_r3
for job in "python bench.py" \
           "python benchmarks/sweep_f32.py" \
           "python benchmarks/bench_lm_iteration.py" \
           "python benchmarks/bench_geodesic.py"; do
  name=$(echo "$job" | awk '{print $2}' | xargs basename | sed 's/\.py//')
  echo "=== $job ==="
  timeout 2400 $job > "/tmp/onchip_r3/$name.out" 2> "/tmp/onchip_r3/$name.err"
  echo "exit=$? (outputs in /tmp/onchip_r3/$name.{out,err})"
  tail -n 3 "/tmp/onchip_r3/$name.out"
done
