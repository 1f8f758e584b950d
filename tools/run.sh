#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars, the same
# way the driver invokes them. Usage: tools/run.sh <MainClass> [args...]
# Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS pass through.
cd "$(dirname "$0")/.." || exit 1
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:target/scala-2.13/test-classes:src/main/resources:/opt/spark/jars/*" \
  "$MAIN" "$@"
