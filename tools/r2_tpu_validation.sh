#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the round-2
# TPU validation debt (docs/HANDOFF_r2.md):
#   1. options93 manufactured gate        (tools/validate.py)
#   2. options92 adaptive CLI gate        (examples/eigenmode1d)
#   3. bench.py at 1024^2 and 1536^2      (stage_eval_b default path)
#   4. member-batched Mosaic ensemble     (tools/ensemble_bench.py)
#   5. ARK4(3)6L[2]SA adaptive run        (-ts_type arkimex type 4)
# Logs land in ${LOGDIR:-/tmp/tpu_validation}; read SUMMARY there.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${LOGDIR:-/tmp/tpu_validation}"
mkdir -p "$LOGDIR"
export KSFD_COMPILE_CACHE="${KSFD_COMPILE_CACHE:-/tmp/jaxcache}"
mkdir -p "$KSFD_COMPILE_CACHE"

probes="${PROBES:-90}"   # 90 probes x (240s probe + 300s sleep) <= ~13.5h
up=0
for i in $(seq "$probes"); do
  if timeout 240 python -c 'import jax; jax.devices()' >/dev/null 2>&1; then
    up=1; break
  fi
  sleep 300
done
if [ "$up" != 1 ]; then
  echo "tunnel never came up ($(date))" | tee "$LOGDIR/SUMMARY"
  exit 3
fi
echo "tunnel up at $(date)" | tee "$LOGDIR/SUMMARY"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "== $name: $*" >> "$LOGDIR/SUMMARY"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc | $(tail -c 400 "$LOGDIR/$name.log" | tr '\n' ' ')" \
    >> "$LOGDIR/SUMMARY"
}

run validate93 2400 python tools/validate.py
rm -rf "$LOGDIR/eig" && mkdir -p "$LOGDIR/eig"
run eigenmode92 3600 python ksfdsolver.py @examples/eigenmode1d \
  --save="$LOGDIR/eig/s"
run bench1024 3600 env KSFD_BENCH_PROBE=0 python bench.py --verbose
run bench1536 3600 env KSFD_BENCH_PROBE=0 python bench.py --nx 1536 --verbose
run ensemble 3600 python tools/ensemble_bench.py --nx 256 --members 1,4,8,16
run ensemble_xla 3600 python tools/ensemble_bench.py --nx 256 --members 4 \
  --no-pallas
# ARK4(3)6L[2]SA on the options92 workload, shortened
sed -e 's/^tmax=200000$/tmax=20000/' \
    -e 's/^-ts_type rosw$/-ts_type arkimex/' \
    examples/eigenmode1d > /tmp/eig_ark4
sed -i '/-ts_type arkimex/a -ts_arkimex_type 4' /tmp/eig_ark4
rm -rf "$LOGDIR/ark" && mkdir -p "$LOGDIR/ark"
run ark4 2400 python ksfdsolver.py @/tmp/eig_ark4 --save="$LOGDIR/ark/s"

echo "ALL DONE $(date)" >> "$LOGDIR/SUMMARY"
cat "$LOGDIR/SUMMARY"
