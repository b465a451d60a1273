#!/bin/bash
# Standing streaming-bench diff protocol (VERDICT r14 task 4, r15):
# run graft.StreamBench at sf0.01 and diff the fresh reading against the
# COMMITTED prior (git HEAD) — admissions/probe equality is the
# correctness signal, walls the throughput signal (quiet-window only).
# StreamBench overwrites bench_stream_sf0.01.json in place, so the prior
# MUST come from git, not the working tree (r15 nearly lost a diff to
# exactly that clobber). Prints a verdict; exits 1 on admissions drift.
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
git show HEAD:bench_stream_sf0.01.json > /tmp/stream_prior.json
SPARK_GRAFT_SF_DIR=${1:-/root/testdata/sf0.01} java $ADD_OPENS -Xmx8g \
  -XX:ReservedCodeCacheSize=1g -cp "$CP" graft.StreamBench 2>/dev/null
python3 - <<'EOF'
import json, sys
cur = json.load(open('bench_stream_sf0.01.json'))
prior = json.load(open('/tmp/stream_prior.json'))
drift = False
print(f"total_wall_ms: {cur['total_wall_ms']} vs prior {prior['total_wall_ms']} "
      f"({cur['total_wall_ms']/prior['total_wall_ms']:.2f}x)")
# batch-COUNT drift is drift too: zip() truncates to the shorter list, so
# an extra or missing micro-batch would otherwise escape the verdict
# entirely (ADVICE r15)
if len(cur["batches"]) != len(prior["batches"]):
    drift = True
    print(f"BATCH COUNT DRIFT: cur {len(cur['batches'])} batches "
          f"vs prior {len(prior['batches'])}")
for c, p in zip(cur["batches"], prior["batches"]):
    keys = ("admitted", "probe_pairs", "index_fps_rows", "redundancy")
    same = all(c[k] == p[k] for k in keys)
    drift |= not same
    print(f"batch {c['batch']}: wall {c['wall_ms']} vs {p['wall_ms']}  "
          f"admissions_equal={same}" +
          ("" if same else f"  cur={[c[k] for k in keys]} prior={[p[k] for k in keys]}"))
if drift:
    print("ADMISSIONS DRIFT — a gate-path change altered streaming decisions")
    sys.exit(1)
print("admissions identical — correctness signal clean")
EOF
