#!/usr/bin/env bash
# Round-15 cache-class residency A/B (the instrument that convicted the
# r13 shingle frames, SCALING.md r14 follow-up 1): run the FULL bench
# suite on one boot, once with every session cache resident (baseline)
# and once per cache class with that class excluded via
# SPARK_GRAFT_NO_CACHE (the frames stay correct — consumers just
# recompute instead of reading resident localCheckpoint blocks). The
# tax a class levies on the suite shows up as the baseline's
# NON-consumer mins sitting above the excluded arm's.
#
# Usage: tools/ab_cache_classes.sh <outDir> [sfDir] [classes...]
set -eu
OUT=${1:?outDir}
SF=${2:-/root/testdata/sf0.1}
shift || true; shift || true
CLASSES=${@:-band simhash modality termfreq}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Xmx${SPARK_DRIVER_MEM:-8g}"

mkdir -p "$OUT"
echo "loadavg before: $(cat /proc/loadavg)"
run_arm() { # $1 = arm name, $2 = NO_CACHE value ("" for baseline)
  echo "== arm $1 (SPARK_GRAFT_NO_CACHE='$2') =="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_NO_CACHE="$2" \
    java $OPENS $JAVA_FLAGS -cp "$CP" graft.Bench >"$OUT/$1.stdout" 2>&1 || {
      echo "arm $1 FAILED"; tail -3 "$OUT/$1.stdout"; return 1; }
  cp BENCH_LAST.json "$OUT/ab_$1.json"
  grep -o '"value":[0-9.]*' "$OUT/$1.stdout" | head -1
}

run_arm baseline ""
for c in $CLASSES; do run_arm "no_$c" "$c"; done
# second baseline closes the drift bracket: if baseline2 != baseline1,
# ambient load moved during the sweep and ratios need that context
run_arm baseline2 ""
echo "loadavg after: $(cat /proc/loadavg)"
