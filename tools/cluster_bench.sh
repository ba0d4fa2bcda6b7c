#!/bin/bash
# Multi-executor scaling evidence for the BASELINE.json north rule:
# stand up a REAL Spark standalone cluster on this box (master + worker
# daemons, separate executor JVMs, netty shuffle), then spark-submit the
# pipeline at two cluster sizes — 1 executor and 4 executors (2 cores
# each) — interleaved hi/lo so both sizes sample the same hypervisor noise
# windows. Prints per-rep JSON lines and a final efficiency summary.
#
# Usage: tools/cluster_bench.sh [nTurns]   (default 64000000, ~25 min)
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK=/opt/spark
JAR=$(ls target/scala-2.13/clpspark_2.13-*.jar | head -1)
NTURNS=${1:-64000000}
WORK=/dev/shm/graft-cluster
TURNS=$WORK/turns
MASTER=spark://127.0.0.1:7077
export SPARK_HOME=$SPARK SPARK_LOG_DIR=$WORK/logs SPARK_PID_DIR=$WORK/pids

cleanup() {
  "$SPARK/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  "$SPARK/sbin/stop-master.sh" >/dev/null 2>&1 || true
}
trap cleanup EXIT
mkdir -p "$WORK/logs" "$WORK/pids"

"$SPARK/sbin/start-master.sh" --host 127.0.0.1 --port 7077 --webui-port 8090
# SPARK_LOCAL_DIRS (not spark.local.dir) is what standalone executors use
# for shuffle/spill scratch — point it at tmpfs like graft.Bench does
SPARK_WORKER_CORES=8 SPARK_WORKER_MEMORY=48g SPARK_LOCAL_DIRS=$WORK/spark-local \
  "$SPARK/sbin/start-worker.sh" "$MASTER" --host 127.0.0.1 --webui-port 8091
sleep 5

submit() { # submit <cores.max> <class-args...>
  local cmax=$1; shift
  "$SPARK/bin/spark-submit" --master "$MASTER" \
    --class graft.tools.ClusterBench \
    --driver-memory 8g \
    --conf spark.executor.cores=2 \
    --conf spark.executor.memory=9g \
    --conf "spark.cores.max=$cmax" \
    --conf spark.local.dir=$WORK/spark-local \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    "$JAR" "$@" 2>"$WORK/logs/submit-stderr.log" | grep -E '^\{"cluster_'
}

RESULTS=$WORK/results.jsonl
: >"$RESULTS"
[ -d "$TURNS" ] || submit 8 gen "$TURNS" "$NTURNS" | tee -a "$RESULTS"

# interleaved legs: hi(4 executors), lo(1 executor), hi, lo, hi
for leg in 8 2 8 2 8; do
  rm -rf "$WORK/run"
  submit "$leg" run "$TURNS" "$WORK/run" | tee -a "$RESULTS"
done

python3 - "$RESULTS" <<'EOF'
import json, sys
runs = [json.loads(l)["cluster_run"] for l in open(sys.argv[1]) if '"cluster_run"' in l]
hi = [r for r in runs if r["total_cores"] == 8]
lo = [r for r in runs if r["total_cores"] == 2]
bh, bl = max(r["thr"] for r in hi), max(r["thr"] for r in lo)
print(json.dumps({"cluster_scaling": {
    "executors_lo": max(r["executors"] for r in lo),
    "executors_hi": max(r["executors"] for r in hi),
    "thr_lo": bl, "thr_hi": bh,
    "reps_thr_lo": [r["thr"] for r in lo], "reps_thr_hi": [r["thr"] for r in hi],
    "reps_burn_lo": [r["burn_miters_per_sec"] for r in lo],
    "reps_burn_hi": [r["burn_miters_per_sec"] for r in hi],
    "efficiency": round(bh / (4 * bl), 3)}}))
EOF
