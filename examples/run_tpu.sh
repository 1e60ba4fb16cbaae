#!/bin/sh
# Launch a workload on the TPU host (the options84s16.sh SLURM-script
# analog: one chip replaces the reference's 16-rank/4-node allocation).
#
#   examples/run_tpu.sh examples/aggregation2d
#
set -e
OPTS="${1:?usage: $0 <optionsfile> [extra args...]}"
shift || true
mkdir -p solutions checks
# AUTOWRAP_SCRATCH enables the persistent compilation cache, exactly
# as the reference workflow used it for its generated ufuncs
export AUTOWRAP_SCRATCH="${AUTOWRAP_SCRATCH:-$HOME/.cache/ksfd_tpu}"
exec python "$(dirname "$0")/../ksfdsolver.py" "@$OPTS" "$@"
