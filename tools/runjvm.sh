#!/usr/bin/env bash
# Run a graft main class in a FRESH JVM directly against the compiled
# classes (no sbt startup, no shared-JVM aging): tools/runjvm.sh [-mXX]
# graft.Bench args...   Heap via SPARK_DRIVER_MEM (default 48g for
# sf10-sized runs; override per call).
set -euo pipefail
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-48g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# JVM_EXTRA: optional extra JVM flags, e.g. session-conf overrides via
# system properties (SparkConf loads spark.* properties):
#   JVM_EXTRA="-Dspark.graft.reliableCheckpoints=true -Dspark.checkpoint.dir=/tmp/ckpt"
exec java -Xmx"$MEM" $ADD_OPENS ${JVM_EXTRA:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
