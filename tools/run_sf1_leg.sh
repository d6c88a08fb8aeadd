#!/usr/bin/env bash
# Detached sf1 decade-gate leg (run with: setsid nohup bash tools/run_sf1_leg.sh &):
# Verify at sf1 -> capped DuckDB replay -> Bench at sf1 (reps=2) into
# BENCH_SF1.json (never clobbering the sf0.1 BENCH_FULL.json).
# Runs graft mains via plain java on the compiled classes so it never
# contends for the sbt build lock with interactive work.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
SF1=${1:-/tmp/testdata/sf1}
OUT=${2:-/tmp/sf1_out_r16}
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $REPO/target/scala-2.13/classes:/opt/spark/jars/* $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g"

echo "[sf1-leg] $(date +%T) Verify at $SF1 -> $OUT" > /tmp/sf1_leg_status.log
if ! $JAVA graft.Verify "$SF1" "$OUT" > /tmp/sf1_verify_r16.log 2>&1; then
  echo "[sf1-leg] VERIFY FAILED" >> /tmp/sf1_leg_status.log; exit 1
fi
echo "[sf1-leg] $(date +%T) verify done; capped oracle replay" >> /tmp/sf1_leg_status.log
python3 tools/oracle_check.py --sf1 "$SF1" "$OUT" > /tmp/sf1_oracle_r16.log 2>&1
ORC=$?
echo "[sf1-leg] $(date +%T) oracle exit=$ORC matches=$(grep -c ': MATCH' /tmp/sf1_oracle_r16.log)" >> /tmp/sf1_leg_status.log
mkdir -p /tmp/benchsf1 && cd /tmp/benchsf1
echo "[sf1-leg] $(date +%T) bench at sf1 (reps=2)" >> /tmp/sf1_leg_status.log
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_REPS=2 \
  $JAVA graft.Bench > /tmp/sf1_bench_r16.log 2>&1
BRC=$?
[ -f /tmp/benchsf1/BENCH_FULL.json ] && cp /tmp/benchsf1/BENCH_FULL.json "$REPO/BENCH_SF1.json"
echo "[sf1-leg] $(date +%T) DONE bench_exit=$BRC" >> /tmp/sf1_leg_status.log
