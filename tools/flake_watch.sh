#!/usr/bin/env bash
# Flake watch for the one-off GraftProperties failure (PLANS round-13):
# N full-suite runs with COMPLETE logs captured to files — the original
# failure lost its property name and seed to a 2000-char log tail.
#
# Runs against a SNAPSHOT of the compiled classes via plain `java`
# (scalatest Runner + the ScalaCheck Properties main), so a concurrent
# foreground `sbt` compile cannot race the loop, and the loop cannot
# hold sbt's project lock.
#
# Replay recipe when a run fails:
#   - grep the run log for "failing seed for graft.<property>" → replay
#     just that property: GRAFT_SCALACHECK_SEED=<seed> sbt 'testOnly graft.GraftProperties'
#   - or take the "[GraftProperties] initialSeed <seed>" line (always
#     printed at suite start) and replay the WHOLE property suite with
#     GRAFT_SCALACHECK_SEED=<seed> — reproduces the run bit-for-bit.
set -u
cd "$(dirname "$0")/.."
N=${1:-10}
OUT=${2:-target/flake-watch}
# optional 3rd arg: a single suite FQCN (e.g. graft.StreamingSpec) for a
# targeted loop — ~2.5 min/run instead of ~10 (r15: a one-off
# StreamingSpec failure in a contended full-suite run)
SUITE_ARGS=""
if [ -n "${3:-}" ]; then SUITE_ARGS="-s $3"; fi
mkdir -p "$OUT"
SNAP="$OUT/snapshot"
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r target/scala-2.13/classes "$SNAP/classes"
cp -r target/scala-2.13/test-classes "$SNAP/test-classes"

JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
# _2.13 artifacts only — the cache also holds sbt's own _2.12 jars
# (scala-xml_2.12), which poison the classpath with pre-2.13 classes
TESTJARS=$(find /root/.cache/coursier -name '*.jar' \
  | grep -E '_2\.13[^/]*/.*\.jar' \
  | grep -E 'scalatest|scalacheck|scalactic|scala-xml' | tr '\n' ':')
TESTJARS="$TESTJARS$(find /root/.cache/coursier \
  -name 'scalatest-compatible*.jar' | head -1):"
CP="$SNAP/test-classes:$SNAP/classes:$TESTJARS$JARS"
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JVMFLAGS="-Xmx8g -XX:ReservedCodeCacheSize=1g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

SUMMARY="$OUT/summary.tsv"
echo -e "run\tscalatest_exit\tprops_exit\tnote" >> "$SUMMARY"
for i in $(seq 1 "$N"); do
  LOG="$OUT/run_$i.log"
  : > "$LOG"
  java $AO $JVMFLAGS -cp "$CP" org.scalatest.tools.Runner \
    -R "$SNAP/test-classes" $SUITE_ARGS -o >> "$LOG" 2>&1
  st=$?
  pr=0
  if [ -z "$SUITE_ARGS" ]; then
    java $AO $JVMFLAGS -cp "$CP" graft.GraftProperties >> "$LOG" 2>&1
    pr=$?
  fi
  note=ok
  if [ $st -ne 0 ] || [ $pr -ne 0 ]; then
    note="FAILURE seeds: $(grep -o 'failing seed for graft[^ ]* is [^ ]*' "$LOG" | tr '\n' ';')$(grep -o 'initialSeed [^ ]*' "$LOG" | head -1)"
  fi
  echo -e "$i\t$st\t$pr\t$note" >> "$SUMMARY"
done
echo "flake watch done: $SUMMARY"
