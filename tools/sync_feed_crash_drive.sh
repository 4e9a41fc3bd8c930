#!/usr/bin/env bash
# Crash-resume gate for the one-command composed sync (graft.Tool
# sync-feed): run the plain span sync over a tier's events feed,
# SIGKILL the JVM mid-sync at jittered offsets, re-run against the
# same workDir, and assert the produced topic is IDENTICAL to a single
# uninterrupted run's — the lease-CAS-after-write + batch-scoped
# overwrite argument, proven under a real kill rather than the
# ToolSpec's logical replay.
#
# With GATE set (e.g. GATE=neardup), drives the GATED sync with
# --canonical instead: the plain kept set is only SET-equivalent across
# a resume (first-admitted-wins across ranges — SCALING.md r14
# follow-up 4 addendum), so the gated gate compares the CANONICAL kept
# digest, which must be bit-identical across kill/resume.
#
# Usage: tools/sync_feed_crash_drive.sh <sfDir> <workRoot> [seeds] [baseKillSecs]
set -u
SF=${1:?sfDir}
ROOT=${2:?workRoot}
SEEDS=${3:-2}
BASE_KILL=${4:-25}
GATE=${GATE:-}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g}"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8}
ARGS="--ranges 8 --max-items 25000"
[ -n "$GATE" ] && ARGS="--gate $GATE --canonical --ranges 8 --max-items 1000"

run_sync() { # $1 = workDir, $2 = logfile
  java $OPENS $JAVA_FLAGS -cp "$CP" graft.Tool sync-feed "$SF" "$1" $ARGS >"$2" 2>&1
}

compare_canonical() { # $1 = resumed log, $2 = run name, $3 = kill_s: canonical digests must match
  S=$(grep -o 'canonical kept=[0-9]* digest=-\?[0-9]*' "$ROOT/single.log" | tail -1)
  R=$(grep -o 'canonical kept=[0-9]* digest=-\?[0-9]*' "$1" | tail -1)
  echo "  single  $S"
  echo "  resumed $R"
  OK=1; [ -n "$S" ] && [ "$S" = "$R" ] && OK=0
  python3 -c 'import json,sys; print(json.dumps({"name":sys.argv[1],"kind":"seed","kill_s":int(sys.argv[2]),"single_canonical":sys.argv[3],"resumed_canonical":sys.argv[4],"pass":sys.argv[5]=="0"}))' \
    "$2" "$3" "$S" "$R" "$OK" >> "$ROOT/runs.jsonl"
  [ "$OK" = 0 ] && echo "  -> IDENTICAL" || { echo "  -> MISMATCH"; return 1; }
}

compare_topic() { # $1 = crashed+resumed workDir, $2 = run name, $3 = kill_s
  python3 - "$ROOT" "$1" "${2:-$(basename "$1")}" "${3:-0}" <<'EOF'
import json, sys
import duckdb
root, crashed, name, kill_s = sys.argv[1:5]
q = lambda d: duckdb.sql(
    f"SELECT count(*), md5(string_agg(CAST(key AS VARCHAR) || '=' || CAST(value AS VARCHAR), '|' "
    f"ORDER BY CAST(key AS VARCHAR), CAST(value AS VARCHAR))) "
    f"FROM read_parquet('{d}/topic/*/*.parquet')"
).fetchone()
single, resumed = q(f"{root}/single"), q(crashed)
ok = single == resumed
print(f"  single  msgs={single[0]} hash={single[1]}")
print(f"  resumed msgs={resumed[0]} hash={resumed[1]}  -> {'IDENTICAL' if ok else 'MISMATCH'}")
with open(f"{root}/runs.jsonl", "a") as f:
    f.write(json.dumps({"name": name, "kind": "seed", "kill_s": int(kill_s),
        "single_msgs": single[0], "single_hash": single[1],
        "resumed_msgs": resumed[0], "resumed_hash": resumed[1],
        "pass": ok}) + "\n")
sys.exit(0 if ok else 1)
EOF
}

rm -rf "$ROOT"; mkdir -p "$ROOT"
: > "$ROOT/runs.jsonl"
FAILS=0

record_fail() { # $1 = name, $2 = kill_s, $3 = reason
  python3 -c 'import json,sys; print(json.dumps({"name":sys.argv[1],"kind":"seed","kill_s":int(sys.argv[2]),"pass":False,"reason":sys.argv[3]}))' \
    "$1" "$2" "$3" >> "$ROOT/runs.jsonl"
}

echo "== reference: single uninterrupted sync =="
run_sync "$ROOT/single" "$ROOT/single.log" || { tail -5 "$ROOT/single.log"; exit 1; }
grep '\[sync-feed\] caught' "$ROOT/single.log"

for s in $(seq 1 "$SEEDS"); do
  K=$((BASE_KILL + 9 * (s - 1)))
  echo "== seed $s: SIGKILL at ${K}s =="
  java $OPENS $JAVA_FLAGS -cp "$CP" graft.Tool sync-feed "$SF" "$ROOT/seed$s" $ARGS \
    >"$ROOT/seed$s.crash.log" 2>&1 &
  PID=$!
  sleep "$K"
  if kill -0 "$PID" 2>/dev/null; then
    kill -9 "$PID"; wait "$PID" 2>/dev/null
    echo "  killed after ${K}s"
  else
    wait "$PID" 2>/dev/null
    echo "  WARNING: sync finished before the ${K}s kill"
  fi
  run_sync "$ROOT/seed$s" "$ROOT/seed$s.resume.log" || { tail -5 "$ROOT/seed$s.resume.log"; record_fail "seed$s" "$K" "resume run failed"; FAILS=$((FAILS+1)); continue; }
  grep '\[sync-feed\] caught' "$ROOT/seed$s.resume.log"
  if [ -n "$GATE" ]; then
    compare_canonical "$ROOT/seed$s.resume.log" "seed$s" "$K" || FAILS=$((FAILS+1))
  else
    compare_topic "$ROOT/seed$s" "seed$s" "$K" || FAILS=$((FAILS+1))
  fi
done

echo "== summary: $SEEDS kill/resume cycles, $FAILS failures =="
# machine-checkable verdict (VERDICT r16 item 2)
python3 - "$ROOT" "$SF" "$FAILS" "$GATE" <<'EOF'
import json, subprocess, sys
root, sf, fails, gate = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
runs = [json.loads(l) for l in open(f"{root}/runs.jsonl")]
commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
v = {"gate": f"sync_feed_crash_resume{'_' + gate if gate else ''}", "sf": sf,
     "binary_commit": commit, "runs": runs, "failures": fails,
     "pass": fails == 0}
with open(f"{root}/verdict.json", "w") as f:
    json.dump(v, f, indent=1)
print(f"verdict -> {root}/verdict.json (pass={fails == 0})")
EOF
exit "$FAILS"
