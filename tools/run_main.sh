#!/usr/bin/env bash
# Direct-JVM launcher for graft mains — same classpath sbt uses
# (target/scala-2.13/classes + /opt/spark/jars), same JDK17 add-opens,
# same heap default. Usage: tools/run_main.sh graft.BenchOne q_foo 5
# Faster iteration than `sbt runMain` (no sbt startup, no build lock);
# the DRIVER CONTRACT still runs through sbt — this script is a dev tool.
set -euo pipefail
CLASSES="$(dirname "$0")/../target/scala-2.13/classes"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
