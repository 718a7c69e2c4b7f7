#!/usr/bin/env bash
# Full sf0.001 (or given SF) oracle gate off a SNAPSHOT of the compiled
# classes, so concurrent recompiles cannot taint a running gate.
# Usage: scripts/gate_bg.sh <tag> [sfDir]
set -euo pipefail
TAG="$1"; SF="${2:-/root/testdata/sf0.001}"
SNAP="/tmp/classes_$TAG"
rm -rf "$SNAP"; cp -r /root/repo/target/scala-2.13/classes "$SNAP"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$SNAP:/opt/spark/jars/*" \
  graft.Verify "$SF" "/tmp/vout_$TAG" > "/tmp/verify_$TAG.log" 2>&1
python3 /root/repo/scripts/check.py "$SF" "/tmp/vout_$TAG" \
  > "/tmp/check_$TAG.log" 2>&1
tail -1 "/tmp/check_$TAG.log"
