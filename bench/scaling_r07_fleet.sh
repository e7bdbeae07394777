#!/bin/bash
# Executor-fleet scaling for the ROUND-7-restructured operators
# (ngramJaccardPairs / connectedComponents candidate path, single-chunk-
# bypass runChunked) — the N→4N executor analog, mirroring bench/op_fleet.sh:
# a real scale-out multiplies executor JVMs (own heap/GC), not threads in
# one heap. Solo 8-core JVM vs K=4 independent 8-core JVMs on disjoint
# physical cores, same tmpfs corpus, noop sink, per-JVM tmpfs shuffle dirs,
# overlap-verified suite rounds only.
#
# Usage: bench/scaling_r07_fleet.sh [mult=40] [rawMult=8] [rounds=2]
set -euo pipefail
cd "$(dirname "$0")/.."
MULT=${1:-40}
RAWMULT=${2:-8}
ROUNDS=${3:-2}
LOG=/tmp/graft_r07_fleet.log
: > $LOG

sbt -batch compile >> $LOG 2>&1

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA_FLAGS="$ADD_OPENS -Xmx16g -XX:ActiveProcessorCount=8 -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

taskset -c 0-31 java $ADD_OPENS -Xmx16g -Dspark.ui.enabled=false -cp "$CP" \
  graft.ScalingR07 gen "$MULT" "$RAWMULT" >> $LOG 2>&1

prime() {
  cat /dev/shm/graft_r07_docs.parquet/*.parquet > /dev/null 2>&1 || true
  cat /dev/shm/graft_r07_raw.parquet/*.parquet > /dev/null 2>&1 || true
}

run_jvm() { # slot(0-3) outfile k
  local slot=$1 out=$2 k=$3
  local lo=$((slot * 8)) hi=$((slot * 8 + 7))
  mkdir -p /dev/shm/graft_r07_shuffle_$slot
  taskset -c $lo-$hi env SPARK_GRAFT_BARRIER=$BARRIER_DIR:$k \
    java $JAVA_FLAGS -Dspark.local.dir=/dev/shm/graft_r07_shuffle_$slot \
    -cp "$CP" graft.ScalingR07 fleetmeasure 8 "$ROUNDS" \
    2>>$LOG | grep GRAFT_R07_TIMES | sed 's/^.*GRAFT_R07_TIMES //' > "$out"
}

R=/tmp/graft_r07_fleet
rm -f $R.*.json
barrier() { BARRIER_DIR=/tmp/graft_r07_fleet_barrier_$1; rm -rf $BARRIER_DIR; }

await_all() {
  local pids=("$@") rc=0 p
  for p in "${pids[@]}"; do wait "$p" || { echo "[r07-fleet] JVM pid $p failed (see $LOG)" >&2; rc=1; }; done
  return $rc
}

echo "[r07-fleet] solo 8-core JVM..." >&2
prime; barrier solo
run_jvm 0 $R.solo.json 1

echo "[r07-fleet] K=4 concurrent 8-core JVMs (32 busy cores)..." >&2
prime; barrier k4
run_jvm 0 $R.k4_0.json 4 & P1=$!; run_jvm 1 $R.k4_1.json 4 & P2=$!
run_jvm 2 $R.k4_2.json 4 & P3=$!; run_jvm 3 $R.k4_3.json 4 & P4=$!
await_all $P1 $P2 $P3 $P4

for f in $R.solo.json $R.k4_*.json; do
  [ -s "$f" ] || { echo "[r07-fleet] $f empty — its JVM printed no GRAFT_R07_TIMES (see $LOG)" >&2; exit 1; }
done

python3 - "$MULT" "$RAWMULT" <<'EOF'
import json, glob, datetime, sys
mult, rawmult = sys.argv[1], sys.argv[2]
solo = json.load(open("/tmp/graft_r07_fleet.solo.json"))
ops = list(solo["rounds"][0]["ops"])
solo_t = {op: min(r["ops"][op] for r in solo["rounds"]) for op in ops}

jvms = [json.load(open(p)) for p in sorted(glob.glob("/tmp/graft_r07_fleet.k4_*.json"))]
def qualified(i):
    rs = jvms[i]["rounds"]
    q = [r for r in rs if all(
        max((min(r["end"], o["end"]) - max(r["start"], o["start"])
             for o in jvms[j]["rounds"]), default=0) >= 0.5 * max(r["end"] - r["start"], 1e-9)
        for j in range(len(jvms)) if j != i)]
    return (q, True) if q else (rs, False)

ts = datetime.datetime.utcnow().isoformat() + "Z"
out = [f"\n## Round-7 operator FLEET run ({ts}, sf0.1 docs x{mult} / bench raw x{rawmult} suffixed replicas, solo 8-core JVM vs K=4 independent 8-core pinned JVMs, overlap-verified suite rounds, noop sink)\n",
       "\nPer-op fleet efficiency = aggregate K=4 rate / (4 x solo rate) — the",
       "N→4N executor analog for the round-7-restructured operators (the",
       "in-JVM 8→32 probe shares one heap + driver and understates a cluster).\n",
       "| op | solo T | per-JVM T @ K=4 | fleet efficiency |",
       "|---|---|---|---|"]
summary = {}
all_q = True
for op in ops:
    per = []
    for i in range(len(jvms)):
        q, ok = qualified(i)
        all_q &= ok
        per.append(min(r["ops"][op] for r in q))
    eff = sum(1.0 / t for t in per) / (len(jvms) * (1.0 / solo_t[op]))
    summary[op] = round(eff, 3)
    out.append(f"| {op} | {solo_t[op]:.2f}s | {', '.join(f'{t:.2f}' for t in per)} | {eff:.3f} |")
if not all_q:
    out.append("\n(WARNING: some JVMs had no fully-overlapped round; min-of-all used for them)")
open("/root/repo/BASELINE.md", "a").write("\n".join(out) + "\n")
print(json.dumps(summary))
EOF
