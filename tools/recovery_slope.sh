#!/usr/bin/env bash
# Changelog recovery SLOPE at replay-dominated state size (round 16,
# VERDICT r15 task #2; throttle mode round 17). The r15 frontier
# measured recovery 0.85-1.6 s at ~8 MB of span state —
# restart-overhead-dominated, so the minDeltasForSnapshot knob's slope
# (replay length ∝ versions since the last snapshot) was asserted, not
# measured. This drive grows state to the replay-dominated regime via
# SPARK_GRAFT_GAP_HOLD: withholding the index-0 event for half the
# streams makes their full event history BUFFER in BufferState.queue
# (the gap hold-back semantic), so the 10× events tier carries
# ~hundreds of MB of span state instead of bare write positions. Each
# run logs replay_changelogs/snapshots read from the checkpoint just
# before the timed restart (ADVICE r15: maintenance races the ingest
# tail, so reps are only comparable WITH the debt recorded).
#
# THROTTLE MODE (round 17 — VERDICT r16 task #1): the r16 slope came
# out NVMe-bounded (≤1 GB of cold checkpoint reads back in under a
# second — the local rig cannot show the download-bound spread a
# cluster recovery has). Setting THROTTLE_MBPS and/or THROTTLE_OPEN_MS
# points each run's checkpoint at a throttle:///… dir
# (graft.streaming.ThrottledFileSystem): reads pay a per-open GET
# round-trip and a global bandwidth cap, writes (= ingest) pay
# nothing. Page-cache state no longer matters (the injected physics
# dominate and apply warm or cold), so throttle runs default
# DROP_CACHES to 0 — results stop depending on a root-only,
# machine-wide knob.
#
# RIG NOTE: with SPARK_GRAFT_DROP_CACHES=1 (the non-throttle default)
# each restart drops the MACHINE-WIDE page cache — run only on an
# otherwise-idle rig. Checkpoint cleanup is scoped to the dirs this
# script creates (ADVICE r16): a concurrent bench's /tmp/streambench*
# checkpoint is never touched.
#
# Usage: tools/recovery_slope.sh [sfDir] [outDir] [reps]
#   env: BATCHES CADENCES STATE_PARTS THROTTLE_MBPS THROTTLE_OPEN_MS TAG
set -eu
SF=${1:-/tmp/sf1.0}
OUT=${2:-tools/tier_r16}
REPS=${3:-2}
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Xmx${SPARK_DRIVER_MEM:-16g}"
export SPARK_GRAFT_SF_DIR="$SF"
export SPARK_GRAFT_MEASURE_RECOVERY=1
export SPARK_GRAFT_MAINTENANCE_MS=3000
export SPARK_GRAFT_GAP_HOLD=${SPARK_GRAFT_GAP_HOLD:-50}
# fixture props are ~tens of bytes; production event bodies are KB-sized
# — pad held streams' payloads so the buffered state carries real mass
# (~500k held events x ~600 B ≈ 300 MB) instead of ~20 MB
export SPARK_GRAFT_PAD_BYTES=${SPARK_GRAFT_PAD_BYTES:-512}
THROTTLE_MBPS=${THROTTLE_MBPS:-}
THROTTLE_OPEN_MS=${THROTTLE_OPEN_MS:-}
THROTTLE_LIST_MS=${THROTTLE_LIST_MS:-}
TAG=${TAG:-}
if [ -n "$THROTTLE_MBPS" ] || [ -n "$THROTTLE_OPEN_MS" ] || [ -n "$THROTTLE_LIST_MS" ]; then
  [ -n "$THROTTLE_MBPS" ] && export SPARK_GRAFT_THROTTLE_MBPS="$THROTTLE_MBPS"
  [ -n "$THROTTLE_OPEN_MS" ] && export SPARK_GRAFT_THROTTLE_OPEN_MS="$THROTTLE_OPEN_MS"
  # round 18: LIST/HEAD-class metadata latency (object stores charge
  # GET-class round-trips for listStatus/getFileStatus too)
  [ -n "$THROTTLE_LIST_MS" ] && export SPARK_GRAFT_THROTTLE_LIST_MS="$THROTTLE_LIST_MS"
  # injected physics dominate, warm or cold — the root-only knob is moot
  export SPARK_GRAFT_DROP_CACHES=${SPARK_GRAFT_DROP_CACHES:-0}
  CP_SCHEME="throttle://"
else
  # cold-cache restart: without this the whole checkpoint sits in the OS
  # page cache (125 GiB RAM) and every cadence replays at memory speed
  export SPARK_GRAFT_DROP_CACHES=${SPARK_GRAFT_DROP_CACHES:-1}
  CP_SCHEME=""
fi
BATCHES=${BATCHES:-20}     # more batches = more versions = longer replay tail
CADENCES=${CADENCES:-"2 10 39"}

for md in $CADENCES; do
  for rep in $(seq 1 "$REPS"); do
    echo "== min_deltas=$md rep $rep =="
    RUN_CP="/tmp/rslope_cp_$$_${md}_${rep}"   # each run leaves an up-to-GB checkpoint
    rm -rf "$RUN_CP"
    SPARK_GRAFT_MIN_DELTAS=$md SPARK_GRAFT_CP_DIR="${CP_SCHEME}${RUN_CP}" \
      java $OPENS $JAVA_FLAGS -cp "$CP" graft.StreamBench "$BATCHES" ${STATE_PARTS:-32} tws \
      >"$OUT/recovery${TAG}_md${md}_r${rep}.log" 2>&1 \
      || { tail -3 "$OUT/recovery${TAG}_md${md}_r${rep}.log"; exit 1; }
    grep '"metric"' "$OUT/recovery${TAG}_md${md}_r${rep}.log" | tee "$OUT/recovery${TAG}_md${md}_r${rep}.json"
    rm -rf "$RUN_CP"
  done
done

python3 - "$OUT" "$REPS" "$TAG" $CADENCES <<'EOF'
import json, sys
out, reps, tag = sys.argv[1], int(sys.argv[2]), sys.argv[3]
print(f"{'min_deltas':>10} {'rep':>3} {'ingest ev/s':>11} {'recovery_s':>10} "
      f"{'replay_cl':>9} {'snapshots':>9} {'thr_opens':>9} {'thr_mb':>7}")
for md in [int(x) for x in sys.argv[4:]]:
    for r in range(1, reps + 1):
        d = json.load(open(f"{out}/recovery{tag}_md{md}_r{r}.json"))
        print(f"{md:>10} {r:>3} {d['value']:>11} {d.get('recovery_s','-'):>10} "
              f"{d.get('replay_changelogs','-'):>9} {d.get('snapshots','-'):>9} "
              f"{d.get('throttle_opens','-'):>9} {d.get('throttle_read_mb','-'):>7}")
EOF
