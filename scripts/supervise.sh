#!/bin/bash
# Stall-watchdog supervisor for long TPU jobs on the axon backend.
#
# The axon transport nondeterministically wedges a client forever (a
# device->host transfer blocks at ~0% CPU with zero socket traffic; hit 3
# of 4 datagen launches on 2026-08-20). The wedge is unrecoverable
# in-process (the blocked call is in C++ past the GIL), so recovery is an
# outer loop: watch the job's log mtime, and on a stall dump Python stacks
# (SIGUSR1 -> faulthandler), kill the client, wait out the device's ~70 s
# post-client-death recovery, and relaunch. The supervised script is
# responsible for making restarts cheap (datagen shard cache + train-state
# resume in train_transfuser.py).
#
# Usage: supervise.sh LOGFILE STALL_S MAX_RETRIES CMD [ARGS...]
set -u
LOG="$1"; STALL_S="$2"; MAX_RETRIES="$3"; shift 3

for try in $(seq 0 "$MAX_RETRIES"); do
  echo "=== supervise: attempt $try: $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    # mtime-based stall check: any log line within STALL_S counts as alive
    now=$(date +%s); mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -ge "$STALL_S" ]; then
      echo "=== supervise: stall (${STALL_S}s no output), dumping stacks + killing $PID ===" >> "$LOG"
      kill -USR1 "$PID" 2>/dev/null; sleep 5
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      sleep 90   # let the device finish post-client-death recovery
      break
    fi
  done
  if wait "$PID" 2>/dev/null; then
    echo "=== supervise: attempt $try exited cleanly ===" >> "$LOG"
    exit 0
  fi
  rc=$?
  echo "=== supervise: attempt $try ended rc=$rc; retrying ===" >> "$LOG"
  sleep 10
done
echo "=== supervise: out of retries ===" >> "$LOG"
exit 1
