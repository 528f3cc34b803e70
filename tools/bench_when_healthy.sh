#!/bin/bash
# Waits for a healthy host window (first_touch >= threshold twice in a row),
# then runs the sf0.1 headline bench and the 4->16 scaling pair back to back.
# Takes /tmp/gxr_bench.lock while measuring so interactive work can stay off
# the box.  Results land in /tmp/bench_healthy.json / /tmp/scaling_healthy.json.
set -u
cd /root/repo
THRESH=${GXR_HEALTH_THRESH:-1200}
LOG=/tmp/bench_healthy.log
echo "$(date +%T) waiter start (threshold ${THRESH} MB/s)" >> "$LOG"
consec=0
while true; do
  ft=$(python -c "import sys; sys.path.insert(0,'/root/repo'); import bench; print(bench._host_health()['first_touch_mbps'])" 2>/dev/null)
  echo "$(date +%T) probe first_touch=${ft}" >> "$LOG"
  if [ -n "$ft" ] && [ "$ft" -ge "$THRESH" ] 2>/dev/null; then
    consec=$((consec+1))
  else
    consec=0
  fi
  if [ -e /tmp/gxr_hold ]; then
    # interactive Ray work in flight (pytest / rehearsal) — two Ray clusters
    # on this box can segfault _raylet.so, and a concurrent run contaminates
    # the timing anyway.  Hold until the flag clears.
    consec=0
    echo "$(date +%T) hold flag present - skipping" >> "$LOG"
    sleep 60
    continue
  fi
  if [ "$consec" -ge 2 ]; then
    touch /tmp/gxr_bench.lock
    echo "$(date +%T) HEALTHY - running headline bench" >> "$LOG"
    GXR_BENCH_WAIT_S=0 GRAFT_SF_DIR=/root/testdata/sf0.1 RAY_GRAFT_CPUS=32 \
      timeout 1800 python bench.py > /tmp/bench_healthy.json 2>/tmp/bench_healthy.err
    echo "$(date +%T) headline done rc=$? - running scaling pair" >> "$LOG"
    GXR_BENCH_WAIT_S=0 GRAFT_SF_DIR=/root/testdata/sf0.1 \
      timeout 2400 python bench.py --scaling --pair 4 16 > /tmp/scaling_healthy.json 2>/tmp/scaling_healthy.err
    echo "$(date +%T) scaling done rc=$?" >> "$LOG"
    rm -f /tmp/gxr_bench.lock
    touch /tmp/gxr_bench.done
    exit 0
  fi
  sleep 60
done
