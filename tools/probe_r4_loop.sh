#!/bin/bash
# Round-4 clean-window hunt: repeated standalone ScalingFork probes over
# pre-synthesized tmpfs tables (same shapes Bench.main uses), logging
# SCALING_RESULT lines per attempt. Each iteration:
#   1. 32-core headline rollup (3 reps, headline mode kSeries=0, parts=64)
#   2. 1->4 pair, interleaved fresh JVMs (3 reps each, kSeries=96, parts=16)
# Logs: /tmp/probe_r4_iter<N>_{head,pair}.log ; stop via /tmp/probe_r4_stop
cd /root/repo || exit 1
BIG=/dev/shm/graft_r4probe/pages_big
MID=/dev/shm/graft_r4probe/pages_mid
WARM=/dev/shm/graft_r4probe/pages_warm
for i in $(seq 1 "${1:-6}"); do
  [ -f /tmp/probe_r4_stop ] && break
  echo "=== iter $i head $(date +%T)" >> /tmp/probe_r4_status
  tools/run_java.sh graft.tools.ScalingFork 32 "$BIG" 3 0 64 "$WARM" \
    > "/tmp/probe_r4_iter${i}_head.log" 2>/dev/null
  [ -f /tmp/probe_r4_stop ] && break
  echo "=== iter $i pair $(date +%T)" >> /tmp/probe_r4_status
  : > "/tmp/probe_r4_iter${i}_pair.log"
  for rep in 1 2 3; do
    for c in 1 4; do
      [ -f /tmp/probe_r4_stop ] && break 2
      sleep 5
      tools/run_java.sh graft.tools.ScalingFork "$c" "$MID" 1 96 16 "$WARM" \
        >> "/tmp/probe_r4_iter${i}_pair.log" 2>/dev/null
    done
  done
  echo "=== iter $i done $(date +%T)" >> /tmp/probe_r4_status
done
echo "=== loop exit $(date +%T)" >> /tmp/probe_r4_status
