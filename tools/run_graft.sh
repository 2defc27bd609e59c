#!/bin/bash
# Plain-java runner for graft mains (no sbt lock contention): compiled
# classes + the image's Spark jars, with the JDK17 add-opens Spark needs
# outside spark-submit. Usage: tools/run_graft.sh <mainClass> [args...]
# Env: GRAFT_XMX (default 8g), SPARK_GRAFT_CPUS (default 4).
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="${GRAFT_XMX:-8g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"$XMX" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
