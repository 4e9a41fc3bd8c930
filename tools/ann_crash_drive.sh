#!/usr/bin/env bash
# AnnIndexStore crash-resume gate (round 15): in-process Runtime.halt
# kills at the refresh protocol's exact windows while a SEPARATE JVM
# keeps serving probes against the same index dir.
#
#   ann-pre-swap  = new version sealed + tmp pointer staged, _current old
#   ann-pre-gc    = pointer swapped, stale versions not yet swept
#   ann-mid-gc    = sweep partially done
#
# Per crash point: build v1(base) -> refresh v2(grown) -> start the
# serving loop -> crash-refresh v3(base) at the window -> assert the
# orphaned _refreshing lease (remove it: the documented operator
# remediation, AnnIndexStore scaladoc) -> resume refresh(base) ->
# assert (a) the requested crash point actually fired, (b) every served
# answer across the whole timeline equals one of the two COLD-REBUILD
# digests, zero serve errors, (c) the final serve equals the cold
# rebuild of the last corpus.
#
# Usage: tools/ann_crash_drive.sh <sfDir> <workRoot>
set -u
SF=${1:?sfDir}
ROOT=${2:?workRoot}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g}"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-4}

drive() { java $OPENS $JAVA_FLAGS -cp "$CP" graft.AnnCrashDrive "$@"; }

mkdir -p "$ROOT"
: > "$ROOT/runs.jsonl"
echo "== cold digests =="
BASE_MD5=$(drive cold "$SF" base | awk '/^COLD/{print $2}')
GROWN_MD5=$(drive cold "$SF" grown | awk '/^COLD/{print $2}')
echo "  base=$BASE_MD5 grown=$GROWN_MD5"
[ -n "$BASE_MD5" ] && [ -n "$GROWN_MD5" ] && [ "$BASE_MD5" != "$GROWN_MD5" ] || {
  echo "FAIL: cold digests missing or identical (fixture exercises nothing)"; exit 1; }

record() { # $1 = point, $2 = pass(0/1), $3 = reason, $4 = serves, $5 = errors, $6 = off_digest, $7 = final_matches(0/1)
  python3 -c 'import json,sys; print(json.dumps({"name":sys.argv[1],"kind":"protocol","pass":sys.argv[2]=="0","reason":sys.argv[3] or None,"serves":int(sys.argv[4]),"serve_errors":int(sys.argv[5]),"off_digest":int(sys.argv[6]),"final_matches_cold_rebuild":sys.argv[7]=="0"}))' \
    "$1" "$2" "$3" "${4:-0}" "${5:-0}" "${6:-0}" "${7:-1}" >> "$ROOT/runs.jsonl"
}

FAIL=0
for P in ann-pre-swap ann-pre-gc ann-mid-gc; do
  echo "== crash point $P =="
  IDX="$ROOT/idx-$P"; STOP="$ROOT/stop-$P"; SLOG="$ROOT/serve-$P.log"
  rm -rf "$IDX" "$STOP" "$SLOG"
  PFAIL=0; REASON=""
  drive refresh "$SF" "$IDX" base  >/dev/null || { echo "FAIL: v1 build"; record "$P" 1 "v1 build failed"; FAIL=1; continue; }
  drive refresh "$SF" "$IDX" grown >/dev/null || { echo "FAIL: v2 refresh"; record "$P" 1 "v2 refresh failed"; FAIL=1; continue; }
  # serving load in its own JVM, across the kill
  java $OPENS $JAVA_FLAGS -cp "$CP" graft.AnnCrashDrive serve-loop "$SF" "$IDX" "$STOP" >"$SLOG" 2>&1 &
  SRV=$!
  sleep 12  # let the server warm up and serve a few grown answers
  SPARK_GRAFT_CRASH_POINT="$P:1" drive refresh "$SF" "$IDX" base >"$ROOT/crash-$P.log" 2>&1
  RC=$?
  if [ $RC -ne 137 ]; then
    echo "FAIL: crash point $P never fired (refresh rc=$RC)"; FAIL=1
    record "$P" 1 "crash point never fired (rc=$RC)"
    touch "$STOP"; wait $SRV 2>/dev/null; continue
  fi
  # the halt skips the finally: the lease MUST be orphaned; removing it
  # is the documented remediation before the resume
  if [ ! -f "$IDX/_refreshing" ]; then
    echo "FAIL: $P left no orphaned _refreshing lease"; FAIL=1
    record "$P" 1 "no orphaned _refreshing lease"
    touch "$STOP"; wait $SRV 2>/dev/null; continue
  fi
  rm "$IDX/_refreshing"
  drive refresh "$SF" "$IDX" base >/dev/null || { echo "FAIL: resume refresh"; PFAIL=1; REASON="resume refresh failed"; }
  sleep 2  # a couple of post-resume serves from the loop
  touch "$STOP"; wait $SRV 2>/dev/null
  FINAL=$(drive serve "$SF" "$IDX" | awk '/^SERVE/{print $2}')
  NERR=$(grep -c '^ERROR' "$SLOG" || true)
  NSRV=$(grep -c '^SERVE' "$SLOG" || true)
  NBAD=$(awk -v b="$BASE_MD5" -v g="$GROWN_MD5" '/^SERVE/{if ($2!=b && $2!=g) n++} END{print n+0}' "$SLOG")
  echo "  serves=$NSRV errors=$NERR off-digest=$NBAD final=$FINAL"
  [ "$NERR" -eq 0 ] || { echo "FAIL: $NERR serve errors during $P"; PFAIL=1; REASON="serve errors"; }
  [ "$NBAD" -eq 0 ] || { echo "FAIL: $NBAD serves matched neither cold side"; PFAIL=1; REASON="off-digest serves"; }
  [ "$NSRV" -ge 3 ] || { echo "FAIL: serving loop produced too few samples"; PFAIL=1; REASON="too few serve samples"; }
  FINMATCH=0; [ "$FINAL" = "$BASE_MD5" ] || { echo "FAIL: final state != cold rebuild of last corpus"; PFAIL=1; REASON="final != cold rebuild"; FINMATCH=1; }
  record "$P" "$PFAIL" "$REASON" "$NSRV" "$NERR" "$NBAD" "$FINMATCH"
  [ "$PFAIL" -ne 0 ] && FAIL=1
done

# machine-checkable verdict (VERDICT r16 item 2): one jq-able artifact
# per drive run, committed under tools/gates_rN/ (raw logs stay ignored)
python3 - "$ROOT" "$SF" "$FAIL" "$BASE_MD5" "$GROWN_MD5" <<'EOF'
import json, subprocess, sys
root, sf, fail, base, grown = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]
runs = [json.loads(l) for l in open(f"{root}/runs.jsonl")]
commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
v = {"gate": "ann_refresh_crash_under_serving", "sf": sf,
     "binary_commit": commit, "cold_base_digest": base,
     "cold_grown_digest": grown, "runs": runs,
     "failures": sum(1 for r in runs if not r["pass"]), "pass": fail == 0}
with open(f"{root}/verdict.json", "w") as f:
    json.dump(v, f, indent=1)
print(f"verdict -> {root}/verdict.json (pass={fail == 0})")
EOF

if [ $FAIL -eq 0 ]; then echo "ALL ANN CRASH GATES PASS"; else echo "ANN CRASH GATE FAILURES"; fi
exit $FAIL
