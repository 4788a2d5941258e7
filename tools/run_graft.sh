#!/bin/bash
# Direct-JVM runner for graft mains (bypasses sbt, so it can run while
# sbt test holds the build lock). Usage: tools/run_graft.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) and the usual SPARK_GRAFT_* vars.
set -u
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Duser.dir=/root/repo -cp "$CP" "$@"
