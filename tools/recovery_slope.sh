#!/usr/bin/env bash
# Round-16 changelog recovery SLOPE at replay-dominated state size
# (VERDICT r15 task #2). The r15 frontier measured recovery 0.85-1.6 s
# at ~8 MB of span state — restart-overhead-dominated, so the
# minDeltasForSnapshot knob's slope (replay length ∝ versions since the
# last snapshot) was asserted, not measured. This drive grows state to
# the replay-dominated regime via SPARK_GRAFT_GAP_HOLD: withholding the
# index-0 event for half the streams makes their full event history
# BUFFER in BufferState.queue (the gap hold-back semantic), so the 10×
# events tier carries ~hundreds of MB of span state instead of bare
# write positions. Each run logs replay_changelogs/snapshots read from
# the checkpoint just before the timed restart (ADVICE r15: maintenance
# races the ingest tail, so reps are only comparable WITH the debt
# recorded).
#
# Usage: tools/recovery_slope.sh [sfDir] [outDir] [reps]
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
# cold-cache restart: without this the whole checkpoint sits in the OS
# page cache (125 GiB RAM) and every cadence replays at memory speed
export SPARK_GRAFT_DROP_CACHES=${SPARK_GRAFT_DROP_CACHES:-1}
BATCHES=${BATCHES:-20}     # more batches = more versions = longer replay tail
CADENCES=${CADENCES:-"2 10 39"}

for md in $CADENCES; do
  for rep in $(seq 1 "$REPS"); do
    echo "== min_deltas=$md rep $rep =="
    rm -rf /tmp/streambench*   # each run leaves an up-to-GB checkpoint
    SPARK_GRAFT_MIN_DELTAS=$md \
      java $OPENS $JAVA_FLAGS -cp "$CP" graft.StreamBench "$BATCHES" 32 tws \
      >"$OUT/recovery_md${md}_r${rep}.log" 2>&1 \
      || { tail -3 "$OUT/recovery_md${md}_r${rep}.log"; exit 1; }
    grep '"metric"' "$OUT/recovery_md${md}_r${rep}.log" | tee "$OUT/recovery_md${md}_r${rep}.json"
  done
done

python3 - "$OUT" "$REPS" $CADENCES <<'EOF'
import json, sys
out, reps = sys.argv[1], int(sys.argv[2])
print(f"{'min_deltas':>10} {'rep':>3} {'ingest ev/s':>11} {'recovery_s':>10} {'replay_cl':>9} {'snapshots':>9}")
for md in [int(x) for x in sys.argv[3:]]:
    for r in range(1, reps + 1):
        d = json.load(open(f"{out}/recovery_md{md}_r{r}.json"))
        print(f"{md:>10} {r:>3} {d['value']:>11} {d.get('recovery_s','-'):>10} "
              f"{d.get('replay_changelogs','-'):>9} {d.get('snapshots','-'):>9}")
EOF
