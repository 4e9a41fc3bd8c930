#!/usr/bin/env bash
# Launch graft.Bench with the standard plain-java launcher (same flags
# as tools/ab_cache_classes.sh) against an SF dir; stdout to $1.
set -eu
OUT=${1:?stdout file}
SF=${2:-/root/testdata/sf0.1}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
JAVA_FLAGS="-Dspark.ui.enabled=false -Xmx${SPARK_DRIVER_MEM:-8g}"
echo "loadavg before: $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR="$SF" java $OPENS $JAVA_FLAGS -cp "$CP" graft.Bench >"$OUT" 2>&1
echo "loadavg after: $(cat /proc/loadavg)"
