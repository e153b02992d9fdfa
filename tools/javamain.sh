#!/bin/bash
# Run a graft main directly on the compiled classes (no sbt project
# lock), with the same JVM flags build.sbt gives forked mains.
# Usage: tools/javamain.sh graft.tools.ScaleUp <args...>
# Honors SPARK_DRIVER_MEM (default 48g) and SPARK_GRAFT_OPTS (-D flags).
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" ${SPARK_GRAFT_OPTS:-} \
  -cp "$CP" "$@"
