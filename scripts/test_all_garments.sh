#!/usr/bin/env bash
# Evaluate the best checkpoints for all garments (reference launcher `test`).
set -euo pipefail
METHOD="${1:-ours}"
shift || true
exec python -m vts_tpu.launch "$METHOD" test --epoch best "$@"
