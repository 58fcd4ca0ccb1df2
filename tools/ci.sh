#!/usr/bin/env bash
# Pre-snapshot CI gate (VERDICT r2 #8): a broken variant must not ship.
# Runs the full interpret-mode suite, the single-chip compile check, and
# the 8-device virtual-mesh training dryrun.  Usage: tools/ci.sh [fast]
#   fast: suite only (the dryrun adds ~2 min on a 1-core host).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
if [ "${1:-}" != "fast" ]; then
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'PY'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn)(*args)
g.dryrun_multichip(8)
print("CI gate: entry + multichip dryrun OK")
PY
fi
echo "CI gate: PASS"
