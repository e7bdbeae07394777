#!/bin/bash
# Interleaved A/B/C driver-protocol bench (VERDICT r04 #3): r03-HEAD vs
# r04-HEAD vs current HEAD, one fresh in-sbt cold run per side per rep,
# sides alternating inside each rep so host-noise windows hit all sides
# equally. Worktrees at /tmp/wt_r03 and /tmp/wt_r04 (fixture dirs redirected
# to /tmp so the old Fixtures.Version cannot clobber the live repo's
# fixtures); the shared bench corpus under /root/repo/data is version-marked
# and read-only to all sides.
#
# Usage: REPS=3 bench/ab_bench.sh   # output: /tmp/ab_{r03,r04,r05}.jsonl
set -e
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
REPS=${REPS:-3}
rm -f /tmp/ab_r03.jsonl /tmp/ab_r04.jsonl /tmp/ab_r05.jsonl
for i in $(seq 1 "$REPS"); do
  for side in r03:/tmp/wt_r03 r04:/tmp/wt_r04 r05:/root/repo; do
    name=${side%%:*}; dir=${side#*:}
    echo "== rep $i $name ==" >&2
    (cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>/dev/null \
      | grep -o '{"metric".*}') >> "/tmp/ab_${name}.jsonl"
  done
done
echo "done: $(wc -l /tmp/ab_r0*.jsonl)" >&2
