#!/bin/bash
# Run a graft main class on the compiled classes + /opt/spark/jars
# WITHOUT holding the sbt build lock (so sbt keeps working in parallel).
# Usage: tools/run_main.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g); GRAFT_CLASSES overrides the class
# dir (point long background runs at a frozen snapshot so concurrent
# sbt recompiles can't feed the running JVM mixed class versions).
set -euo pipefail
MAIN="$1"; shift
CLS="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
CP="$CLS:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$MAIN" "$@"
