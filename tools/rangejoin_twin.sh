#!/usr/bin/env bash
# Round-16 range-join density twin (VERDICT r15 task #3): measure
# q20_range_join's 60->100x marginal exponent on BOTH fixture shapes in
# one quiet window — the packed shape (copies share one ~30-day span,
# so events-per-15-min-bin grows with the tier and the join's OUTPUT
# grows ~tier^2; r15 adjudicated its 1.81 exponent as fixture temporal
# density) and the density-constant twin (make_scale.py --time-axis:
# the time axis grows with the tier, bin density ~constant — the
# production history shape). If the adjudication is right, the twin
# lands ~1.0 while packed reproduces ~1.8.
#
# Usage: tools/rangejoin_twin.sh [outDir]
set -eu
OUT=${1:-tools/tier_r16}
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Xmx${SPARK_DRIVER_MEM:-16g}"
export SPARK_GRAFT_BENCH_ONLY=q20_range_join
export SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3}

run() { # $1 = label, $2 = fixture dir
  echo "== $1 ($2) =="
  SPARK_GRAFT_SF_DIR="$2" java $OPENS $JAVA_FLAGS -cp "$CP" graft.Bench \
    >"$OUT/rangejoin_$1.stdout" 2>&1 || { tail -3 "$OUT/rangejoin_$1.stdout"; exit 1; }
  # stdout carries headline queries only; the full per-query record
  # (medians + raw reps) for a filtered run lands in
  # BENCH_LAST_FILTERED.json — claim it per arm before the next run
  # overwrites it
  mv BENCH_LAST_FILTERED.json "$OUT/rangejoin_$1.json"
  grep '"metric"' "$OUT/rangejoin_$1.stdout"
}

run packed60  /tmp/sf6.0
run packed100 /tmp/sf10.0
run axis60    /tmp/sf6.0_axis
run axis100   /tmp/sf10.0_axis

python3 - "$OUT" <<'EOF'
import json, math, sys
out = sys.argv[1]
def m(label):
    d = json.load(open(f"{out}/rangejoin_{label}.json"))
    raw = d["raw"]["q20_range_join"]
    return min(raw), d["queries"]["q20_range_join"], d["calib"]["drift"]
g = math.log(100/60)
for shape in ("packed", "axis"):
    lo, lomed, d1 = m(f"{shape}60"); hi, himed, d2 = m(f"{shape}100")
    print(f"{shape:7}: 60x min {lo:.2f}s med {lomed:.2f}s -> 100x min {hi:.2f}s med {himed:.2f}s"
          f"  exponent(min) {math.log(hi/lo)/g:.2f} (med {math.log(himed/lomed)/g:.2f})"
          f"  drifts {d1:.2f}/{d2:.2f}")
EOF
