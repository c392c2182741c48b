#!/bin/bash
# Repro loop for the driver-red fold queries (ql14/ql16): run Verify for
# just those two + the DuckDB compare, N times, under whatever env the
# caller exports (TZ, LANG, SPARK_GRAFT_CPUS, background load).
# Usage: repro_fold.sh <iterations> [queries]
set -u
N=${1:-10}
QUERIES=${2:-ql14_data_skipping,ql16_change_feed}
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
SF=/root/testdata/sf0.01
fails=0
for i in $(seq 1 "$N"); do
  out=$(mktemp -d /tmp/repro_fold.XXXXXX)
  java -cp "$CP" \
    -Djava.io.tmpdir="${REPRO_TMPDIR:-/tmp}" \
    ${REPRO_JAVA_OPTS:-} \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    graft.Verify "$SF" "$out" "$QUERIES" 2>"$out/stderr.log"
  res=$(python3 /root/repo/scripts/oracle_check.py "$SF" "$out" 2>&1)
  line=$(echo "$res" | tail -1)
  want=$(echo "$QUERIES" | tr ',' '\n' | wc -l)
  if echo "$res" | grep -q '^FAIL' || ! echo "$line" | grep -q "^$want OK"; then
    fails=$((fails+1))
    echo "iter $i: FAIL ($line)  out=$out"
    echo "$res" | grep -A6 FAIL | head -40
    tail -5 "$out/stderr.log" 2>/dev/null
  else
    echo "iter $i: ok ($line)"
    rm -rf "$out"
  fi
done
echo "total fails: $fails/$N"
