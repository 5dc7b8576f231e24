#!/bin/bash
# TPU wedge-recovery probe (axon tunnel, single v5e).
#
# The chip periodically becomes unresponsive (FAILED_PRECONDITION or a
# silent hang at client init) after a starved/killed client or a
# mid-compile interruption. Recovery is patient sequential probing: ONE
# short-lived client at a time, a few minutes apart — never concurrent
# clients, never a tight retry loop (each connect attempt holds tunnel
# state; see CLAUDE.md "Environment hard-won facts").
#
# Usage: scripts/tpu_probe.sh [max_attempts] [spacing_seconds]
#   Logs to stdout; exits 0 on the first successful device matmul,
#   1 if all attempts exhaust. Typical recovery observed: 10-60 min.
set -u
ATTEMPTS=${1:-40}
SPACING=${2:-240}
PER_TRY=300

for i in $(seq 1 "$ATTEMPTS"); do
  echo "=== probe attempt $i/$ATTEMPTS $(date -u +%H:%M:%S) ==="
  if timeout "$PER_TRY" python -u -c "
import time, sys
t0 = time.time()
import jax
d = jax.devices()
import jax.numpy as jnp, numpy as np
y = jnp.ones((256, 256)) @ jnp.ones((256, 256))
# np.asarray is the only real D2H sync through the tunnel
print('PROBE_OK', float(np.asarray(y)[0, 0]), d, round(time.time() - t0, 1),
      flush=True)
"; then
    echo "TPU_RECOVERED $(date -u +%H:%M:%S)"
    exit 0
  fi
  [ "$i" -lt "$ATTEMPTS" ] && sleep "$SPACING"
done
echo "TPU_STILL_DOWN $(date -u +%H:%M:%S)"
exit 1
