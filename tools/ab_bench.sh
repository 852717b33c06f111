#!/bin/bash
# Alternating A/B bench: r8 (repo HEAD) vs r7 (worktree) for the round-8
# suspect regressions, same host window, interleaved iterations within
# each JVM. Sequential runs, alternated A,B,A,B so slow load drift hits
# both arms.
set -u
QS="q15,q16,q21,q22,q23,q46,q47,q09,q11,q19,q25"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_BENCH_ONLY="$QS"
export SPARK_GRAFT_BENCH_ITERS=5
export SPARK_GRAFT_BENCH_INTERLEAVE=1
mkdir -p /tmp/ab
for i in 1 2; do
  echo "=== arm r8 run $i ==="
  (cd /root/repo && sbt -batch "runMain graft.Bench") > /tmp/ab/r8_$i.log 2>&1
  grep '"metric":"total"' /tmp/ab/r8_$i.log | head -1
  echo "=== arm r7 run $i ==="
  (sbt -batch "runMain graft.Bench") > /tmp/ab/r7_$i.log 2>&1
  grep '"metric":"total"' /tmp/ab/r7_$i.log | head -1
done
echo AB_DONE
