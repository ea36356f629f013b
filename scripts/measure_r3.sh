#!/usr/bin/env bash
# Round-3 measurement plan — run when the TPU tunnel is back.
# Each step appends to /tmp/measure_r3/<name>.log; safe to re-run (the
# persistent .jax_cache keeps recompiles cheap). Budget ~60-90 min cold.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/measure_r3}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S))" | tee -a "$OUT/$name.log"
  timeout "${STEP_TIMEOUT:-1800}" "$@" >>"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/$name.log"
}

# 0. tunnel probe (fail fast if still down)
timeout 60 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down"; exit 1; }

# 1. stage attribution (VERDICT r2 item 2: profile, then attack the top)
run profile_phys python scripts/profile_rlenv.py --envs 1024 --iters 10
run profile_render python scripts/profile_rlenv_render.py --envs 1024 --iters 10

# 2. RL bench A/B: static bake off/on (flip the default if ON wins)
RL_ENVS=1024 run rl_1024_off python benchmarks/bench_rlenv.py
RL_ENVS=1024 RL_STATIC_BAKE=1 run rl_1024_on python benchmarks/bench_rlenv.py
RL_ENVS=4096 run rl_4096_off python benchmarks/bench_rlenv.py
RL_ENVS=4096 RL_STATIC_BAKE=1 run rl_4096_on python benchmarks/bench_rlenv.py

# 3. GLB 512-capacity scene (VERDICT r2 item 3 target: >=1000 at 1024 envs)
run glb_off python benchmarks/bench_rlenv_glb.py
RL_STATIC_BAKE=1 run glb_on python benchmarks/bench_rlenv_glb.py

# 4. 720p city chunk A/B
run city_off python benchmarks/bench_city_720p.py
STATIC_BAKE=1 run city_on python benchmarks/bench_city_720p.py

# 4b. cost-model constants (PERF.md machine model) on the real chip
run microops python benchmarks/bench_microops.py

# 4c. raster-free state-obs RL throughput (obs_mode="state")
RL_ENVS=4096 RL_OBS_MODE=state run rl_state python benchmarks/bench_rlenv.py

# 5. the driver gate end-to-end (also warms .jax_cache for the real run)
STEP_TIMEOUT=3600 run bench_full python bench.py

grep -h "BENCH_JSON\|ms/fleet-step\|env-steps/s\|FPS\|(delta)" "$OUT"/*.log | tail -80
