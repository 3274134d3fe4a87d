#!/bin/bash
# Round-10 seventh-decade measurement pipeline (VERDICT r9 #3).
# Stage 1: regenerate the embeddings-only decade slices (GenScale is
# deterministic per output path, so these reproduce the r9 corpora).
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
export SPARK_GRAFT_CPUS=16

$JAVA_BASE -Xmx16g -cp "$CP" graft.tools.GenScale /root/testdata/sf0.1 target/sfx10 10 embeddings
$JAVA_BASE -Xmx16g -cp "$CP" graft.tools.GenScale target/sfx10 target/sfx100 10 embeddings
$JAVA_BASE -Xmx16g -cp "$CP" graft.tools.GenScale target/sfx100 target/sfx1000 10 embeddings
$JAVA_BASE -Xmx16g -cp "$CP" graft.tools.GenScale target/sfx1000 target/sfx10000 10 embeddings
echo "GENSCALE DONE"
du -sh target/sfx*
