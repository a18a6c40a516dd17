#!/bin/bash
# Detached bench launcher (round-15). Usage: run_bench.sh <out.log> [ONLY]
OUT="$1"; ONLY="$2"
[ -z "$OUT" ] && { echo "usage: run_bench.sh <out.log> [ONLY]" >&2; exit 2; }
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
[ -n "$ONLY" ] && export SPARK_GRAFT_ONLY="$ONLY"
exec java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $AO \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  graft.Bench > "$OUT" 2>&1
