#!/usr/bin/env bash
# Exactly-once crash-resume drive at tier scale (SCALING.md round-13):
# run graft.Pipeline over a tier's events table, SIGKILL the JVM
# mid-batch, resume against the same workDir, and assert the resumed
# store is IDENTICAL to a single uninterrupted run's store.
#
# Usage: tools/crash_resume_drive.sh <sfDir> <workRoot> [killAfterSecs]
#
# Runs the class directly (the build.sbt fork flags replicated below)
# so the kill hits the exact Spark JVM, not an sbt wrapper.
set -u
SF=${1:?sfDir}
ROOT=${2:?workRoot}
KILL_AFTER=${3:-45}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g}"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8}

run_pipeline() { # $1 = workDir, $2 = logfile
  java $OPENS $JAVA_FLAGS -cp "$CP" graft.Pipeline "$SF" "$1" >"$2" 2>&1
}

rm -rf "$ROOT"; mkdir -p "$ROOT"

echo "== reference: single uninterrupted run =="
run_pipeline "$ROOT/single" "$ROOT/single.log" || { tail -5 "$ROOT/single.log"; exit 1; }
grep '^\[pipeline\]' "$ROOT/single.log" | tail -3

echo "== crash run: SIGKILL after ${KILL_AFTER}s =="
java $OPENS $JAVA_FLAGS -cp "$CP" graft.Pipeline "$SF" "$ROOT/crash" \
  >"$ROOT/crash1.log" 2>&1 &
PID=$!
sleep "$KILL_AFTER"
if kill -0 "$PID" 2>/dev/null; then
  kill -9 "$PID"
  wait "$PID" 2>/dev/null
  echo "killed pid $PID after ${KILL_AFTER}s; batches seen:"
  grep -c '^\[pipeline\] batch=' "$ROOT/crash1.log" || true
else
  wait "$PID" 2>/dev/null
  echo "WARNING: run finished before the kill (${KILL_AFTER}s too late to interrupt)"
  grep -c '^\[pipeline\] batch=' "$ROOT/crash1.log" || true
fi

echo "== resume run (same workDir) =="
run_pipeline "$ROOT/crash" "$ROOT/crash2.log" || { tail -5 "$ROOT/crash2.log"; exit 1; }
grep '^\[pipeline\]' "$ROOT/crash2.log" | tail -3

echo "== compare stores =="
python3 - "$ROOT" <<'EOF'
import sys
import duckdb
root = sys.argv[1]
q = lambda d: duckdb.sql(
    f"SELECT count(*), count(DISTINCT (stream_name, idx)), "
    f"md5(string_agg(stream_name || ':' || idx || ':' || result, '|' "
    f"ORDER BY stream_name, idx)) FROM read_parquet('{d}/store/*.parquet')"
).fetchone()
single, resumed = q(f"{root}/single"), q(f"{root}/crash")
print(f"single : rows={single[0]} distinct={single[1]} hash={single[2]}")
print(f"resumed: rows={resumed[0]} distinct={resumed[1]} hash={resumed[2]}")
assert resumed[1] == single[1], "distinct (stream, idx) sets differ — LOSS or PHANTOM"
assert resumed[2] == single[2], "store content hash differs"
# rows == distinct proves the sink admitted no duplicate positions
assert single[0] == single[1] and resumed[0] == resumed[1], "duplicate rows in a store"
print("OK: resumed store byte-identical to the single-run store, no dup positions")
EOF
