#!/bin/bash
# Disk guard for engine-side stress rungs whose DISK_ONLY caches are
# predicted near the sandbox's free space (the sf5 tr family: ~69 GB
# estimated edge cache vs ~79 GB free — STRESS_r13). Polls free bytes
# on / every 5 s; below the floor (GB, arg 1, default 6) it kills the
# newest graft JVM so a cache-filling query dies as a recorded FAILED
# row instead of wedging the box at 0 bytes free (sbt, logs, and the
# driver all write to the same filesystem). Prints a timestamped
# min-free trace so the failing rung's disk requirement is a NUMBER.
FLOOR_GB=${1:-6}
MIN_FREE=999999
while true; do
  FREE_KB=$(df --output=avail / | tail -1 | tr -d ' ')
  FREE_GB=$((FREE_KB / 1048576))
  if [ "$FREE_GB" -lt "$MIN_FREE" ]; then
    MIN_FREE=$FREE_GB
    echo "[disk-guard] $(date +%T) free ${FREE_GB}G (new min)"
  fi
  if [ "$FREE_GB" -lt "$FLOOR_GB" ]; then
    PID=$(pgrep -f 'graft.Stress' | head -1)
    echo "[disk-guard] $(date +%T) free ${FREE_GB}G < floor ${FLOOR_GB}G — killing stress JVM $PID"
    [ -n "$PID" ] && kill -9 "$PID"
    exit 1
  fi
  sleep 5
done
