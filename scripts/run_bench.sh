#!/bin/bash
# Direct-java Bench runner (no sbt lock): mirrors build.sbt's forked-run
# JVM flags. Usage:
#   SPARK_GRAFT_ONLY=q249_stream_pit_maintained SPARK_GRAFT_BENCH_OUT=/tmp/x.json \
#     scripts/run_bench.sh [extra JVM flags...]
# Extra args are passed as JVM options (e.g. -Djava.io.tmpdir=/dev/shm/graft).
set -e
# repo root derived from this script's location; flags mirror build.sbt's
# forked-run javaOptions (keep the two in sync when build.sbt changes)
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CP="$ROOT/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Duser.timezone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" "$@" -cp "$CP" graft.Bench
