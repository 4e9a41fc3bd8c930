#!/usr/bin/env bash
# Round-19 hot-fraction curve under the two-phase session plan
# (VERDICT r18 task #5): the r18 round pinned the ends (uniform 3.06,
# hot-40 2.66, hot-80 1.13 s mins) across two boots; this drive runs
# the WHOLE curve — uniform, 5/10/20/40/80% hot — in one boot window,
# with a second uniform arm closing the drift bracket, so the
# monotone-DOWN claim becomes a single committed same-boot artifact.
# Arms are the q16 window family only (session under study;
# sliding/tumbling ride along as in-arm controls that should NOT move
# with hot fraction).
#
# Usage: tools/skew_curve.sh <outDir> [reps]
set -eu
OUT=${1:?outDir}
REPS=${2:-5}
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Xmx${SPARK_DRIVER_MEM:-8g}"
echo "loadavg before: $(cat /proc/loadavg)"
python3 tools/io_probe.py

run_arm() { # $1 = arm name, $2 = fixture dir
  echo "== arm $1 ($2) =="
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_BENCH_REPS="$REPS" \
    SPARK_GRAFT_BENCH_ONLY="q16_session,q16_sliding,q16_tumbling" \
    java $OPENS $JAVA_FLAGS -cp "$CP" graft.Bench >"$OUT/skew19_$1.stdout" 2>&1 || {
      echo "arm $1 FAILED"; tail -3 "$OUT/skew19_$1.stdout"; return 1; }
  # raw per-rep arrays live in the filtered-run record, not stdout
  cp BENCH_LAST_FILTERED.json "$OUT/skew19_$1.json"
  python3 -c "
import json; d=json.load(open('$OUT/skew19_$1.json'))
r=d['raw']['q16_session']
print('  session mins: %.3f  all reps: %s  drift %.3f' % (min(r), r, d['calib']['drift']))"
}

run_arm uniform1 /tmp/sf6.0
run_arm hot5  /tmp/sf6.0_hot5
run_arm hot10 /tmp/sf6.0_hot10
run_arm hot20 /tmp/sf6.0_hot20
run_arm hot40 /tmp/sf6.0_hot40
run_arm hot80 /tmp/sf6.0_hot80
run_arm uniform2 /tmp/sf6.0
python3 tools/io_probe.py
echo "loadavg after: $(cat /proc/loadavg)"
