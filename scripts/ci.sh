#!/usr/bin/env bash
# CI: full test suite (CPU backend, 8 virtual devices via tests/conftest.py)
# plus a tiny CPU smoke of the two graft entry points and the bench path.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -q

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
