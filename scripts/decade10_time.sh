#!/bin/bash
# Round-10 seventh-decade staged-consumer measurements (VERDICT r9 #3).
# Run SOLO (no concurrent sbt/test load) — these numbers go in SCALING.md.
# Per name the first timed run is the stage BUILD (+first serve), the
# repeated name is the WARM per-run consumer (stage memoized on disk).
# Order matters: the PQ index builds first so stageKmeansScaledAssign
# exercises the r10 cross-artifact adoption (km2l <- pqs member rows).
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA_BASE="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16}
export SPARK_GRAFT_WARM_DIR=/root/testdata/sf0.01
HEAP=${HEAP:-48g}

for sf in "$@"; do
  echo "=== $sf ==="
  $JAVA_BASE -Xmx$HEAP -cp "$CP" graft.tools.TimeQueries "target/$sf" \
    sim_ivfpq_scaled_staged sim_ivfpq_scaled_staged \
    sim_components_kmeans_scaled_staged sim_components_kmeans_scaled_staged \
    2>/tmp/time_${sf}.err | tee /tmp/time_${sf}.json
done
echo "TIMING DONE"
