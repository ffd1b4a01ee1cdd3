#!/usr/bin/env bash
# Cross-JVM optimistic-concurrency proof for ManifestTable: two REAL
# writer processes merge disjoint batches against the same base
# snapshot; barrier markers make them stage concurrently, the designated
# loser commits into the winner's landed version, hits a genuine
# ConcurrentCommitException from another process, re-stages, and lands
# on attempt 2. Asserts both attempt counts and the converged row count.
# See graft.OccDemo's scaladoc for the sequencing rationale.
#
# The writers run as plain `java` JVMs off the sbt-compiled classes
# (two parallel sbt invocations would fight over the project lock).
#
#   tools/occ_demo.sh
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="$(mktemp -d /tmp/occ_demo.XXXXXX)"
TABLE="$ROOT/table" BARRIER="$ROOT/barrier"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-4}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JAVA_FLAGS=(--add-exports=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED)

sbt -batch compile >/dev/null

run_occ() { java "${JAVA_FLAGS[@]}" -cp "$CP" graft.OccDemo "$@" 2>&1 | grep -E "\[occ\]"; }

echo "== seed the base table (version 1)"
run_occ seed "$TABLE"

echo "== two writer JVMs stage concurrently; one commit must conflict"
run_occ win "$TABLE" "$BARRIER" >"$ROOT/win.out" &
pid_win=$!
run_occ lose "$TABLE" "$BARRIER" >"$ROOT/lose.out"
wait "$pid_win"
cat "$ROOT/win.out" "$ROOT/lose.out"
grep -q "writer win committed after 1 attempt(s)" "$ROOT/win.out" \
  || { echo "FAIL: winner should commit first try"; exit 1; }
grep -q "writer lose committed after 2 attempt(s)" "$ROOT/lose.out" \
  || { echo "FAIL: loser did not hit the conflict and retry exactly once"; exit 1; }

echo "== converged table holds the seed and BOTH writers' batches"
run_occ check "$TABLE" 210

echo "OK: real cross-process conflict fired; loser re-staged; both landed"
rm -rf "$ROOT"
