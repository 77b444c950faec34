#!/usr/bin/env bash
# Deterministic fingerprint of the code that feeds dist/graft.jar: every
# src/main scala file plus build.sbt, hashed content-wise in sorted-path
# order. Used by rebuild_jar.sh (records it) and run_verify.sh (recomputes
# and compares, so a stale jar cannot silently green-light edited source).
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
{ find src/main -type f -name '*.scala' | LC_ALL=C sort; echo build.sbt; } \
  | xargs sha256sum | sha256sum | cut -d' ' -f1
