#!/bin/bash
# Environment-variation battery for the ql14/ql16 driver divergence:
# each block perturbs one axis the driver box might differ on.
set -u
cd /root/repo
run() { echo "=== $1 ==="; shift; "$@" 2>&1 | tail -3; }

run "baseline cpus=4 x6" env SPARK_GRAFT_CPUS=4 bash scripts/repro_fold.sh 6

# heavy CPU load (driver ran at load ~3+): 24 spinner processes
for i in $(seq 1 24); do (while :; do :; done) & done
SPIN=$(jobs -p)
run "loaded cpus=4 x6" env SPARK_GRAFT_CPUS=4 bash scripts/repro_fold.sh 6
kill $SPIN 2>/dev/null

run "tz+locale x4" env SPARK_GRAFT_CPUS=4 TZ=America/New_York LANG=de_DE.UTF-8 LC_ALL=de_DE.UTF-8 \
  REPRO_JAVA_OPTS="-Duser.timezone=America/New_York -Duser.language=de -Duser.country=DE" \
  bash scripts/repro_fold.sh 4

run "cpus=1 x2" env SPARK_GRAFT_CPUS=1 bash scripts/repro_fold.sh 2
run "cpus=48 x2" env SPARK_GRAFT_CPUS=48 bash scripts/repro_fold.sh 2
echo "battery done"
