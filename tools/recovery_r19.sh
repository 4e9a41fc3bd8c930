#!/usr/bin/env bash
# Round-19 recovery cells (VERDICT r18 tasks #3 and #4), all at the 10x
# tier via tools/recovery_slope.sh env contract, interleaved in ONE
# window so the pairs adjudicate within-boot:
#   1. md2 x LIST in a clean window  — the cell r18 dropped as
#      ambient-poisoned (ingest-side LIST optimum number).
#   2. The maintenance-race floor    — same cells with the maintenance
#      thread paused during the timed restart
#      (SPARK_GRAFT_PAUSE_MAINTENANCE=1): the clean recovery floor the
#      formula models; race term = unpaused minus paused.
# md39 base/list single anchors tie the window back to the r18 cells.
#
# Usage: tools/recovery_r19.sh <outDir> [reps]
set -eu
OUT=${1:?outDir}
REPS=${2:-2}
mkdir -p "$OUT"
echo "loadavg before: $(cat /proc/loadavg)"
python3 tools/io_probe.py

cell() { # $1 tag, $2 cadence, $3 list_ms, $4 pause, $5 reps
  echo "== cell $1 (md=$2 list=$3 pause=$4) =="
  THROTTLE_MBPS=512 THROTTLE_OPEN_MS=200 THROTTLE_LIST_MS=$3 \
    SPARK_GRAFT_PAUSE_MAINTENANCE=$4 \
    BATCHES=20 STATE_PARTS=32 CADENCES="$2" TAG="$1" \
    tools/recovery_slope.sh /tmp/sf1.0 "$OUT" "$5"
}

for rep in 1 2; do
  [ "$rep" -le "$REPS" ] || break
  cell thrl19base_rep$rep   2 0   0 1
  cell thrl19list_rep$rep   2 200 0 1
  cell thrl19basep_rep$rep  2 0   1 1
  cell thrl19listp_rep$rep  2 200 1 1
done
# window anchors back to the r18 md39 cells (1 rep each)
cell thrl19anchor 39 0   0 1
cell thrl19anchorl 39 200 0 1

python3 tools/io_probe.py
echo "loadavg after: $(cat /proc/loadavg)"
