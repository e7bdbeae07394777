#!/bin/bash
# Two-parallelism scaling probe for the round-3 pipeline operators (t_pack,
# t_unigram_nll, d_contamination, d_drop_lines). Same pinned-JVM protocol as
# scaling.sh: each level runs in its own JVM pinned to exactly N CPUs
# (taskset + -XX:ActiveProcessorCount via SPARK_GRAFT_PROCS), levels
# interleaved to cancel host drift, min per level, rows appended to
# BASELINE.md.
#
# Usage: bench/op_scaling.sh [N=8] [mult=40] [reps=2] [roundsPerRep=2]
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-8}; MULT=${2:-40}; REPS=${3:-2}; ROUNDS=${4:-2}
H=$((N * 4))
LOG=/tmp/graft_op_scaling.log
: > $LOG

sbt -batch "runMain graft.OpScalingBench gen $MULT" >> $LOG 2>&1

run_level() { # cores
  local c=$1
  taskset -c 0-$((c - 1)) env SPARK_GRAFT_PROCS=$c \
    sbt -batch "runMain graft.OpScalingBench measure $c $ROUNDS" 2>>$LOG \
    | grep GRAFT_OP_TIMES | sed 's/^.*GRAFT_OP_TIMES //'
}

RESULTS=/tmp/graft_op_scaling_results.jsonl
: > $RESULTS
for i in $(seq 1 "$REPS"); do
  run_level "$N" >> $RESULTS
  run_level "$H" >> $RESULTS
done

python3 - "$N" "$H" "$MULT" <<'EOF'
import json, sys, datetime
n, h, mult = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rows = [json.loads(l) for l in open("/tmp/graft_op_scaling_results.jsonl")]
ops = list(rows[0]["rounds"][0]["ops"])
ts = datetime.datetime.utcnow().isoformat() + "Z"
out = [f"\n## Pipeline-operator scaling run ({ts}, sf0.1 documents x{mult} "
       f"replicas, pinned JVMs via taskset+ActiveProcessorCount, min over "
       f"interleaved reps)\n",
       "\n| op | T @ local[%d] | T @ local[%d] | efficiency (T_N/T_4N)/4 |" % (n, h),
       "|---|---|---|---|"]
summary = {}
for op in ops:
    lo = [r["ops"][op] for row in rows if row["cores"] == n for r in row["rounds"]]
    hi = [r["ops"][op] for row in rows if row["cores"] == h for r in row["rounds"]]
    t1, t4 = min(lo), min(hi)
    eff = (t1 / t4) / 4
    summary[op] = round(eff, 3)
    out.append(f"| {op} | {t1:.2f}s (all: {', '.join(f'{t:.2f}' for t in lo)}) "
               f"| {t4:.2f}s (all: {', '.join(f'{t:.2f}' for t in hi)}) | {eff:.3f} |")
open("/root/repo/BASELINE.md", "a").write("\n".join(out) + "\n")
print(json.dumps(summary))
EOF
