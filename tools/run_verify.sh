#!/usr/bin/env bash
# Zero-compile correctness gate (round-12, VERDICT #1a): run graft.Verify
# straight from the committed prebuilt jar against the Spark jars — no
# sbt, no compilation, so the driver/judge path cannot be starved by a
# loaded host re-compiling 24k LoC. Rebuild the jar after source changes
# with:  sbt -batch package && cp target/scala-2.13/*.jar dist/graft.jar
#
# Usage: tools/run_verify.sh [sf_dir] [out_dir]
set -euo pipefail
SF_DIR=${1:-/root/testdata/sf0.01}
OUT_DIR=${2:-/tmp/verify_out}
REPO=$(cd "$(dirname "$0")/.." && pwd)
JAR="$REPO/dist/graft.jar"
[ -f "$JAR" ] || { echo "missing $JAR — run: tools/rebuild_jar.sh" >&2; exit 2; }
# staleness guard (round-13, ADVICE r12 #3): compare the source-tree
# fingerprint recorded at rebuild time against the live tree. A mismatch
# means this gate would verify code that is NOT HEAD — warn loudly (the
# run still proceeds: a stale-but-running gate beats no gate for the
# driver path; set SPARK_GRAFT_STRICT_JAR=1 to refuse instead).
if [ -f "$REPO/dist/graft.jar.srchash" ]; then
  LIVE=$("$REPO/tools/srctree_hash.sh")
  BUILT=$(cat "$REPO/dist/graft.jar.srchash")
  if [ "$LIVE" != "$BUILT" ]; then
    echo "WARNING: STALE JAR — dist/graft.jar was built from a different" >&2
    echo "  source tree (built=$BUILT live=$LIVE)." >&2
    echo "  Results verify the JAR's code, not HEAD. Run tools/rebuild_jar.sh." >&2
    [ "${SPARK_GRAFT_STRICT_JAR:-0}" = "1" ] && exit 3
  fi
else
  echo "WARNING: dist/graft.jar.srchash missing — cannot prove the jar matches HEAD (run tools/rebuild_jar.sh)" >&2
fi
# the JDK17 --add-opens set Spark needs outside spark-submit (same list
# as build.sbt / org.apache.spark.launcher.JavaModuleOptions)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$JAR:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT_DIR"
