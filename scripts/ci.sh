#!/usr/bin/env bash
# CI: test suite (CPU backend, 8 virtual devices via tests/conftest.py)
# plus a tiny CPU smoke of the two graft entry points.
#
# Tiers:
#   scripts/ci.sh           full suite (~45 min on a slow/loaded box)
#   scripts/ci.sh --quick   every subsystem, slowest equivalence/e2e tests
#                           excluded via '-m "not slow"' (< ~10 min)
set -euo pipefail
cd "$(dirname "$0")/.."

PYTEST_ARGS=()
if [[ "${1:-}" == "--quick" ]]; then
  PYTEST_ARGS+=(-m "not slow")
fi

python -m pytest tests/ -q "${PYTEST_ARGS[@]}"

python - <<'PY'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry() ok")
PY

XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'PY'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8) ok")
PY

echo "CI green"
