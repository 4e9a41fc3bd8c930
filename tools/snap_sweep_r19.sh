#!/usr/bin/env bash
# Round-19 late campaign: (a) the snapshot-load compute term — recovery
# at md ∈ {2,5,10,20,39}, base GET knobs, maintenance PAUSED (clean
# floor), so the only thing varying with cadence is the checkpoint's
# file population; the re-attributed residual predicts recovery excess
# ∝ snapshot count (~10 ms each). (b) the driver-lane split — LIST
# cells at md2/md39 (paused) now carry throttle_meta_driver, turning
# the inferred ~11-16 s serial component into a measured count.
# Usage: tools/snap_sweep_r19.sh <outDir>
set -eu
OUT=${1:?outDir}
mkdir -p "$OUT"
echo "loadavg before: $(cat /proc/loadavg)"
python3 tools/io_probe.py
cell() { # $1 tag, $2 cadence, $3 list_ms
  echo "== cell $1 (md=$2 list=$3 paused) =="
  THROTTLE_MBPS=512 THROTTLE_OPEN_MS=200 THROTTLE_LIST_MS=$3 \
    SPARK_GRAFT_PAUSE_MAINTENANCE=1 \
    BATCHES=20 STATE_PARTS=32 CADENCES="$2" TAG="$1" \
    tools/recovery_slope.sh /tmp/sf1.0 "$OUT" 1
}
cell snap19_md2  2  0
cell snap19_md5  5  0
cell snap19_md10 10 0
cell snap19_md20 20 0
cell snap19_md39 39 0
cell snap19_md2l  2  200
cell snap19_md39l 39 200
python3 tools/io_probe.py
echo "loadavg after: $(cat /proc/loadavg)"
