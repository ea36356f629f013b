#!/usr/bin/env bash
# Round-4 pending measurements (VERDICT r3 items 1/2/3/7).
# Sequential on purpose: co-resident compiles contaminate measures (quirk 10b).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/measure_r4}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S))" | tee -a "$OUT/$name.log"
  timeout "${STEP_TIMEOUT:-2400}" "$@" >>"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/$name.log"
}

# 0. tunnel probe (fail fast if down)
timeout 60 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down"; exit 1; }

# 1. city 720p with the early-exit commit in tree (bake default ON) —
#    the 97.2 FPS capture predates 5eb2baf; target >= 100
run city_on python benchmarks/bench_city_720p.py

# 2. RL 4096 clean remeasure, bake default ON (target >= 3000)
run rl_4096_on python benchmarks/bench_rlenv.py

# 3. GLB-512 confirm with early-exit in tree (was 1270)
run glb_on python benchmarks/bench_rlenv_glb.py

# 4. render stage profile WITH bake (find the next lever)
RL_STATIC_BAKE=1 run profile_render_bake python scripts/profile_rlenv_render.py --envs 1024 --iters 10

# 5. physics stage profile (the 139 ms composition delta target)
run profile_phys python scripts/profile_rlenv.py --envs 1024 --iters 10

# 6. full driver gate end-to-end (warms .jax_cache for the real run)
STEP_TIMEOUT=3600 run bench_full python bench.py

grep -h "BENCH_JSON\|ms/fleet-step\|env-steps/s\|FPS\|delta" "$OUT"/*.log | tail -80
