#!/usr/bin/env bash
# Pod-slice launcher for the sharded benchmarks / transforms.
#
# Run THIS SCRIPT ON EVERY HOST of a TPU pod slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $NAME --worker=all --command=...`).
# On Cloud TPU, jax.distributed.initialize() discovers the coordinator
# from the TPU metadata automatically; elsewhere set:
#
#   JAX_COORDINATOR_ADDRESS=host0:8476
#   JAX_NUM_PROCESSES=<n_hosts>
#   JAX_PROCESS_ID=<this host's index>
#
# (ssqueeze_rs_tpu.parallel.initialize() reads exactly these env vars —
# parallel/distributed.py:46-75.)
#
# The scaling bench then measures chunked_stft / chunked_ssq_cwt over
# the REAL (hosts, chips) mesh — same harness as the virtual-CPU proxy —
# and writes SCALING.json with MSamples/s at every device count plus
# strong/weak efficiency (BASELINE.md target: >= 90%).
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu}"
python - <<'PY'
from ssqueeze_rs_tpu.parallel import initialize
import jax
initialize()   # no-op single-host; env-var / TPU-metadata driven otherwise
print(f"process {jax.process_index()}/{jax.process_count()}: "
      f"{jax.local_device_count()} local / {jax.device_count()} global "
      f"devices ({jax.default_backend()})")
PY
exec python tools/scaling_bench.py --out SCALING.json "$@"
