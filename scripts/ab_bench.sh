#!/bin/bash
# Interleaved A/B bench: r10 build (.worktrees/r10) vs current build,
# alternating legs in ONE window, a fixed-work CPU calibration probe
# (scripts/Calib.java, the same SplitMix64 loop graft.Bench uses)
# before each leg. Restricted to the round-11 drift suspects.
# Output: target/ab/<leg>_<round>.log + a calib ledger.
set -u
Q="${AB_QUERIES:-st5,st6,pipe4,pipe6,sim6,sketch3,sim8}"
ROUNDS="${AB_ROUNDS:-3}"
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -Dderby.stream.error.file=/dev/null"
mkdir -p /root/repo/target/ab /root/repo/target/calib
javac -d /root/repo/target/calib /root/repo/scripts/Calib.java
# A plain `sbt compile` does NOT copy resources: without
# META-INF/services in classes/, format("graft") dies
# DATA_SOURCE_NOT_FOUND and Bench records the sub-second failure as a
# "success" sample — this exact mistake silently corrupted the first
# run of this script (SCALING.md round 12). Build BOTH trees fully.
for d in /root/repo/.worktrees/r10 /root/repo; do
  (cd "$d" && sbt -batch 'Compile/compile' && sbt -batch 'Compile/copyResources') \
    >/dev/null || { echo "build failed in $d" >&2; exit 1; }
  [ -d "$d/target/scala-2.13/classes/META-INF/services" ] \
    || { echo "missing META-INF/services in $d (copyResources?)" >&2; exit 1; }
done
: > /root/repo/target/ab/calib.txt
for round in $(seq 1 "$ROUNDS"); do
  for leg in r10 cur; do
    if [ "$leg" = r10 ]; then d=/root/repo/.worktrees/r10; else d=/root/repo; fi
    c=$(java -cp /root/repo/target/calib Calib)
    echo "$round $leg pre $c" >> /root/repo/target/ab/calib.txt
    (cd "$d" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_ONLY="$Q" SPARK_GRAFT_BENCH_DEADLINE_SEC=40 \
      java $JOPTS -cp "$d/target/scala-2.13/classes:/opt/spark/jars/*" \
        graft.Bench 2>/dev/null) \
      | grep '"metric"' > "/root/repo/target/ab/${leg}_${round}.log"
    # reject implausible legs: every suspect in the default set runs
    # multi-second at sf0.1; a sub-0.5 s sample is a swallowed failure
    # (the Bench catch records a failed query's wall time), not speed
    python3 - "$leg" "$round" <<'PYEOF' || exit 1
import json, sys
leg, rnd = sys.argv[1], sys.argv[2]
f = f"/root/repo/target/ab/{leg}_{rnd}.log"
qs = json.load(open(f))["queries"]
bad = {k: v for k, v in qs.items() if v < 0.5}
if bad:
    print(f"leg {leg}_{rnd}: implausibly fast queries (swallowed "
          f"failures?): {bad}", file=sys.stderr)
    sys.exit(1)
PYEOF
    c=$(java -cp /root/repo/target/calib Calib)
    echo "$round $leg post $c" >> /root/repo/target/ab/calib.txt
  done
done
