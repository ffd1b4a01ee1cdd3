#!/usr/bin/env bash
# One-command end-to-end proof of the composed continuous-ingest
# pipeline OUTSIDE ScalaTest: three ContinuousIngestMain runs against a
# generated source directory exercise the cold build (first batch builds
# the corpus + all six indexes), an incremental batch (indexed probe,
# exactly-once appends), and an empty drain. Asserts the corpus row
# counts the accept gates are expected to produce. See README "Demo".
#
#   tools/ingest_demo.sh [sfDir]      (default /root/testdata/sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
ROOT="$(mktemp -d /tmp/ingest_demo.XXXXXX)"
SRC="$ROOT/src" CORPUS="$ROOT/corpus" CP="$ROOT/checkpoint"
IDX="demo_mh" TI="demo_ti" ANN="demo_ann" IVF="$ROOT/ivf" CK="demo_ck" CMS="demo_cms"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"

run_main() { sbt -batch "runMain $*" 2>&1 | grep -E "\[demo-data\]|\[demo-check\]|\[ingest\]"; }

count_of() { sed -n 's/.*corpus now \([0-9]*\) rows.*/\1/p' <<<"$1" | tail -1; }

echo "== cold: 5000-doc batch -> gates, build corpus + 6 indexes"
run_main graft.IngestDemoData "$SF_DIR" "$SRC" cold
out1=$(run_main graft.ContinuousIngestMain "$SRC" "$CORPUS" "$IDX" "$CP" "$TI" "$ANN" "$IVF" "$CK" "$CMS")
echo "$out1"
n1=$(count_of "$out1")

echo "== incremental: 500-doc batch -> indexed probe, exactly-once appends"
run_main graft.IngestDemoData "$SF_DIR" "$SRC" incremental
out2=$(run_main graft.ContinuousIngestMain "$SRC" "$CORPUS" "$IDX" "$CP" "$TI" "$ANN" "$IVF" "$CK" "$CMS")
echo "$out2"
n2=$(count_of "$out2")

echo "== cross-JVM check: every index must cover BOTH batches' corpus"
run_main graft.IngestDemoCheck "$CORPUS" "$IDX" "$IVF" "$CK" "$CMS"

echo "== empty drain: nothing new -> near-instant no-op batch"
out3=$(run_main graft.ContinuousIngestMain "$SRC" "$CORPUS" "$IDX" "$CP" "$TI" "$ANN" "$IVF" "$CK" "$CMS")
echo "$out3"
n3=$(count_of "$out3")

[ -n "$n1" ] && [ "$n1" -gt 0 ] || { echo "FAIL: cold run accepted no docs"; exit 1; }
[ -n "$n2" ] && [ "$n2" -gt "$n1" ] || { echo "FAIL: incremental run grew nothing"; exit 1; }
[ "$n3" = "$n2" ] || { echo "FAIL: empty drain changed the corpus ($n2 -> $n3)"; exit 1; }
echo "OK: cold $n1 rows -> incremental $n2 rows -> empty drain stable at $n3"
rm -rf "$ROOT"
