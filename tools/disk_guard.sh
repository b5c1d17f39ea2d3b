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
    # Kill EVERY matching pid, not the oldest one: with `run / fork`
    # the sbt launcher JVM matches the pattern too (its cmdline carries
    # the runMain args) and has a LOWER pid than the forked Spark JVM
    # that owns the disk burn — killing only `head -1` can orphan the
    # writer. And keep looping: a single kill attempt followed by exit
    # would leave a survivor free to wedge the box at 0 bytes.
    # Match restricted to JAVA processes (r13 ADVICE): a bare
    # 'graft.Stress' substring also matches a tail/grep over a stress
    # log or an orchestration script naming the class — innocent
    # bystanders a SIGKILL sweep must not hit. The wrapper SHELL no
    # longer matches either; it exits on its own when sbt dies.
    PIDS=$(pgrep -f 'java.*graft\.Stress')
    echo "[disk-guard] $(date +%T) free ${FREE_GB}G < floor ${FLOOR_GB}G — killing stress pids: $PIDS"
    [ -n "$PIDS" ] && kill -9 $PIDS 2>/dev/null
    sleep 2
    if ! pgrep -f 'java.*graft\.Stress' > /dev/null; then
      echo "[disk-guard] $(date +%T) all stress pids dead — exiting"
      exit 1
    fi
  fi
  sleep 5
done
