#!/usr/bin/env bash
# Rebuild the committed zero-compile gate jar AND its source-tree
# fingerprint (round-13, ADVICE r12 #3: run_verify.sh must be able to tell
# a stale jar from a fresh one instead of trusting the rebuild convention).
#
# Usage: tools/rebuild_jar.sh
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
sbt -batch package
# the glob must exclude the -tests jar sbt may also have built
cp "$(ls target/scala-2.13/*.jar | grep -v -- '-tests' | head -1)" dist/graft.jar
tools/srctree_hash.sh > dist/graft.jar.srchash
echo "rebuilt dist/graft.jar (srchash $(cat dist/graft.jar.srchash))"
