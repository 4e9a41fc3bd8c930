#!/usr/bin/env bash
# Exactly-once crash-resume gate at tier scale (SCALING.md rounds 13/14):
# run graft.Pipeline over a tier's events table, kill the JVM, resume
# against the same workDir, and assert the resumed store is IDENTICAL
# to a single uninterrupted run's store.
#
# Two kill families per invocation:
#   - SEED kills: external SIGKILL at jittered wall-clock offsets
#     (base + seed*jitter), landing mid-batch / mid-shuffle / mid-write
#     wherever the clock falls — exercises Spark's WAL/commit recovery;
#   - PROTOCOL kills: in-process Runtime.halt at exact CheckpointStore
#     windows via SPARK_GRAFT_CRASH_POINT (graft.streaming.CrashPoint):
#     ckpt-pre-swap  = version written, pointer still old
#     ckpt-pre-gc    = pointer swapped, stale versions not yet swept
#     ckpt-mid-gc    = sweep partially done
#     — exercises the external store's atomicity at its weakest
#     instants, which timed kills almost never hit.
#
# Usage: tools/crash_resume_drive.sh <sfDir> <workRoot> [seeds] [baseKillSecs]
#   seeds        number of jittered external-kill runs (default 5)
#   baseKillSecs first kill offset; seed s kills at base + 11*s (default 30)
#
# Runs the class directly (the build.sbt fork flags replicated below)
# so the kill hits the exact Spark JVM, not an sbt wrapper.
set -u
SF=${1:?sfDir}
ROOT=${2:?workRoot}
SEEDS=${3:-5}
BASE_KILL=${4:-30}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g}"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8}
# tier-sized admission pages: Pipeline's 400-line default suits the
# sf0.001 demo — at the 10x tier (1M events) it means 2,500
# micro-batches and an hours-long "single run" (round-17 lesson: the
# env lived only in the invoking shell's history, so a fresh caller got
# the demo default)
export SPARK_GRAFT_FEED_LINES_PER_TRIGGER=${SPARK_GRAFT_FEED_LINES_PER_TRIGGER:-25000}

run_pipeline() { # $1 = workDir, $2 = logfile
  java $OPENS $JAVA_FLAGS -cp "$CP" graft.Pipeline "$SF" "$1" >"$2" 2>&1
}

compare_store() { # $1 = crashed+resumed workDir, $2 = run name, $3 = kind, $4 = kill_s
  python3 - "$ROOT" "$1" "${2:-$(basename "$1")}" "${3:-seed}" "${4:-0}" <<'EOF'
import json, sys
import duckdb
root, crashed, name, kind, kill_s = sys.argv[1:6]
q = lambda d: duckdb.sql(
    f"SELECT count(*), count(DISTINCT (stream_name, idx)), "
    f"md5(string_agg(stream_name || ':' || idx || ':' || result, '|' "
    f"ORDER BY stream_name, idx)) FROM read_parquet('{d}/store/*.parquet')"
).fetchone()
single, resumed = q(f"{root}/single"), q(crashed)
ok = (resumed[1] == single[1] and resumed[2] == single[2]
      and single[0] == single[1] and resumed[0] == resumed[1])
print(f"  single  rows={single[0]} hash={single[2]}")
print(f"  resumed rows={resumed[0]} hash={resumed[2]}  -> {'IDENTICAL' if ok else 'MISMATCH'}")
with open(f"{root}/runs.jsonl", "a") as f:
    f.write(json.dumps({"name": name, "kind": kind, "kill_s": int(kill_s),
        "single_rows": single[0], "single_hash": single[2],
        "resumed_rows": resumed[0], "resumed_hash": resumed[2],
        "pass": ok}) + "\n")
sys.exit(0 if ok else 1)
EOF
}

record_fail() { # $1 = name, $2 = kind, $3 = kill_s, $4 = reason
  python3 -c 'import json,sys; print(json.dumps({"name":sys.argv[1],"kind":sys.argv[2],"kill_s":int(sys.argv[3]),"pass":False,"reason":sys.argv[4]}))' \
    "$1" "$2" "$3" "$4" >> "$ROOT/runs.jsonl"
}

kill_run() { # $1 = workDir, $2 = log, $3 = killAfterSecs, extra env via CRASH_ENV
  if [ -n "${CRASH_ENV:-}" ]; then
    env "$CRASH_ENV" java $OPENS $JAVA_FLAGS -cp "$CP" graft.Pipeline "$SF" "$1" >"$2" 2>&1 &
  else
    java $OPENS $JAVA_FLAGS -cp "$CP" graft.Pipeline "$SF" "$1" >"$2" 2>&1 &
  fi
  PID=$!
  if [ "$3" -gt 0 ]; then
    sleep "$3"
    if kill -0 "$PID" 2>/dev/null; then
      kill -9 "$PID"; wait "$PID" 2>/dev/null
      echo "  external SIGKILL after $3 s; batches before kill: $(grep -c '^\[pipeline\] batch=' "$2" || true)"
    else
      wait "$PID" 2>/dev/null
      echo "  WARNING: run finished before the ${3}s kill"
    fi
  else
    wait "$PID" 2>/dev/null # crash-point run: the JVM halts itself
    echo "  crash-point halt; batches before halt: $(grep -c '^\[pipeline\] batch=' "$2" || true); $(grep '\[crashpoint\]' "$2" || echo 'NO HALT FIRED')"
  fi
}

rm -rf "$ROOT"; mkdir -p "$ROOT"
: > "$ROOT/runs.jsonl"
FAILS=0

echo "== reference: single uninterrupted run =="
run_pipeline "$ROOT/single" "$ROOT/single.log" || { tail -5 "$ROOT/single.log"; exit 1; }
grep '^\[pipeline\]' "$ROOT/single.log" | tail -2

for s in $(seq 1 "$SEEDS"); do
  K=$((BASE_KILL + 11 * (s - 1)))
  echo "== seed $s: external SIGKILL at ${K}s =="
  kill_run "$ROOT/seed$s" "$ROOT/seed$s.crash.log" "$K"
  run_pipeline "$ROOT/seed$s" "$ROOT/seed$s.resume.log" || { tail -5 "$ROOT/seed$s.resume.log"; record_fail "seed$s" seed "$K" "resume run failed"; FAILS=$((FAILS+1)); continue; }
  compare_store "$ROOT/seed$s" "seed$s" seed "$K" || FAILS=$((FAILS+1))
done

# hit counts: pre-swap/pre-gc fire once per commit -> 3rd = batch 3;
# mid-gc fires once per swept stale entry, and the first commit with a
# stale version (current-2) is commit 3 -> 1st hit = batch 3's sweep
for spec in ckpt-pre-swap:3 ckpt-pre-gc:3 ckpt-mid-gc:1; do
  point=${spec%%:*}
  echo "== protocol kill: $spec =="
  CRASH_ENV="SPARK_GRAFT_CRASH_POINT=$spec" kill_run "$ROOT/$point" "$ROOT/$point.crash.log" 0
  if ! grep -q '\[crashpoint\]' "$ROOT/$point.crash.log"; then
    echo "  FAIL: crash point $spec never fired — protocol window untested"
    record_fail "$point" protocol 0 "crash point never fired"
    FAILS=$((FAILS+1)); continue
  fi
  CRASH_ENV="" run_pipeline "$ROOT/$point" "$ROOT/$point.resume.log" || { tail -5 "$ROOT/$point.resume.log"; record_fail "$point" protocol 0 "resume run failed"; FAILS=$((FAILS+1)); continue; }
  compare_store "$ROOT/$point" "$point" protocol 0 || FAILS=$((FAILS+1))
done

echo "== summary: $((SEEDS + 3)) kill/resume cycles, $FAILS failures =="
# machine-checkable verdict (VERDICT r16 item 2): one jq-able artifact
# per drive run — gate, tier, kill offsets, per-run digests, pass/fail
# — committed under tools/gates_rN/ while the raw logs stay ignored
python3 - "$ROOT" "$SF" "$FAILS" <<'EOF'
import json, subprocess, sys
root, sf, fails = sys.argv[1], sys.argv[2], int(sys.argv[3])
runs = [json.loads(l) for l in open(f"{root}/runs.jsonl")]
commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
v = {"gate": "checkpoint_store_crash_resume", "sf": sf,
     "binary_commit": commit, "runs": runs, "failures": fails,
     "pass": fails == 0}
with open(f"{root}/verdict.json", "w") as f:
    json.dump(v, f, indent=1)
print(f"verdict -> {root}/verdict.json (pass={fails == 0})")
EOF
exit "$FAILS"
