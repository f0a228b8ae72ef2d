#!/bin/bash
# Plain-java launcher for graft mains off a classes snapshot (no sbt lock,
# no sbt JVM between the timer and Spark). Usage:
#   cp -r target/scala-2.13/classes /tmp/classes_snap && CP_DIR=/tmp/classes_snap \
#   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=... tools/run_bench.sh graft.Bench [gate ...]
# CP_DIR defaults to the in-repo target classes (fine when sbt is idle).
CP="${CP_DIR:-target/scala-2.13/classes}:/opt/spark/jars/*"
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
-Dio.netty.tryReflectionSetAccessible=true"
# GRAFT_HEAP overrides the JVM heap (e.g. GRAFT_HEAP=8g for the
# bounded-memory sweeps); default matches the recorded sweeps' 100g.
exec java $JOPTS -Xmx"${GRAFT_HEAP:-100g}" -cp "$CP" "$@"
