#!/bin/bash
# Round-4 on-chip measurement battery (VERDICT r3 item #1).
# Probe first with `timeout 1450 python bench.py`; a JSON line means go.
# Outputs land in /tmp/onchip_r4/<name>.{out,err}.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip_r4
run_job() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" > "/tmp/onchip_r4/$name.out" 2> "/tmp/onchip_r4/$name.err"
  echo "exit=$?"
  tail -n 4 "/tmp/onchip_r4/$name.out"
}
run_job bench_ablation python bench.py --ablation
run_job bench_lm_iteration python benchmarks/bench_lm_iteration.py
run_job bench_geodesic python benchmarks/bench_geodesic.py
run_job sweep_f32 python benchmarks/sweep_f32.py
