#!/usr/bin/env bash
# Like tools/run.sh but off a SNAPSHOTTED classpath (default
# /tmp/graft-classes-snap), so long-running probe/verify JVMs survive a
# concurrent `sbt compile` rewriting target/scala-2.13/classes (the
# ClosureCleaner "capturingClassReader is null" crash from r7).
# Usage: [GRAFT_SNAP_CP=<dir>] tools/run_snap.sh [-mem 16g] <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
SNAP="${GRAFT_SNAP_CP:-/tmp/graft-classes-snap}"
MEM="${SPARK_DRIVER_MEM:-16g}"
if [ "${1:-}" = "-mem" ]; then MEM="$2"; shift 2; fi
OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
CP="$SNAP:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java "-Xmx$MEM" "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
