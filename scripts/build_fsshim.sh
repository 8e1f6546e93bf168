#!/bin/bash
# Compile the no-fork local-filesystem shim (engine/javashim) into
# /tmp/spark_graft_bench/fsshim.jar.  Needs only javac + the spark jars.
set -e
OUT=${1:-/tmp/spark_graft_bench/fsshim.jar}
SRC=$(dirname "$0")/../engine/javashim
TMP=$(mktemp -d)
CP=$(ls /opt/spark/jars/hadoop-client-api-*.jar | head -1)
javac -cp "$CP" -d "$TMP" "$SRC"/NioRawLocalFileSystem.java
mkdir -p $(dirname "$OUT")
jar cf "$OUT" -C "$TMP" sparkgraft
rm -rf "$TMP"
echo "built $OUT"
