#!/bin/bash
# Two-parallelism scaling probe for the round-7-restructured operators
# (d_ngram_pairs / d_cc_components candidate path, runChunked bypass).
# Same pinned-JVM protocol as op_scaling.sh: each level in its own JVM
# pinned to exactly N CPUs (taskset + -XX:ActiveProcessorCount), levels
# interleaved to cancel host drift, min per level.
#
# Usage: bench/scaling_r07.sh [N=8] [mult=40] [rawMult=8] [reps=2] [roundsPerRep=1]
# mult/rawMult default to sizes that put every op >>10s at 4N cores — a
# first run at mult=4 produced ~2s jobs whose eff_4 (~0.28) measured only
# fixed plan/jit overhead, not the operators (min job-size rule in the
# verify skill).
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-8}; MULT=${2:-40}; RAWMULT=${3:-8}; REPS=${4:-2}; ROUNDS=${5:-1}
H=$((N * 4))
LOG=/tmp/graft_r07_scaling.log
: > $LOG

sbt -batch "runMain graft.ScalingR07 gen $MULT $RAWMULT" >> $LOG 2>&1

run_level() { # cores
  local c=$1
  taskset -c 0-$((c - 1)) env SPARK_GRAFT_PROCS=$c \
    sbt -batch "runMain graft.ScalingR07 measure $c $ROUNDS" 2>>$LOG \
    | grep GRAFT_R07_SCALING | sed 's/^.*GRAFT_R07_SCALING //'
}

RESULTS=/tmp/graft_r07_scaling_results.jsonl
: > $RESULTS
for i in $(seq 1 "$REPS"); do
  run_level "$N" >> $RESULTS
  run_level "$H" >> $RESULTS
done

python3 - "$N" "$H" "$MULT" <<'EOF'
import json, sys
n, h, mult = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rows = [json.loads(l) for l in open("/tmp/graft_r07_scaling_results.jsonl")]
ops = sorted(rows[0]["ops"])
mins = {}
for r in rows:
    for k, v in r["ops"].items():
        key = (r["cores"], k)
        mins[key] = min(mins.get(key, 1e18), v)
print(f"r07 operator scaling (sf0.1 docs x{mult} suffixed replicas; min over reps)")
print(f"{'op':18s} {'t'+str(n):>8s} {'t'+str(h):>8s} {'eff_4':>6s}")
for k in ops:
    tn, th = mins[(n, k)], mins[(h, k)]
    print(f"{k:18s} {tn:8.3f} {th:8.3f} {tn/(4*th):6.3f}")
EOF
