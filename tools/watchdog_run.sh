#!/bin/sh
# watchdog_run.sh <stall_secs> <retries> <progress_file> <log> -- cmd...
# Runs cmd, watching progress_file's mtime (falling back to the log's);
# if neither advances for <stall_secs>, kills the process tree and retries.
# Round-5 addition: the axon tunnel can wedge a single TCP connection
# mid-run (observed 2026-08-20: train.py blocked in sk_stream_wait_memory
# for 25+ min while a fresh connection worked fine) — a stalled training
# stage must cost minutes, not its whole timeout budget.
STALL=$1; RETRIES=$2; PROG=$3; LOG=$4; shift 5   # 5th arg is "--"

mtime() { stat -c %Y "$1" 2>/dev/null || echo 0; }

try=0
while [ "$try" -le "$RETRIES" ]; do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    m1=$(mtime "$PROG"); m2=$(mtime "$LOG")
    last=$m1; [ "$m2" -gt "$last" ] && last=$m2
    if [ $(( now - last )) -gt "$STALL" ]; then
      echo "[watchdog] stall >${STALL}s, killing try $try" >> "$LOG"
      # kill the child's whole subtree by walking /proc (no pkill patterns)
      for c in $(ps -eo pid,ppid | awk -v p="$PID" '$2==p {print $1}'); do
        kill "$c" 2>/dev/null
      done
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; RC=$?
  # rc 0 or a real (non-stall) exit: done. Retry only after a watchdog kill.
  if ! grep -q "\[watchdog\] stall" "$LOG" || [ "$RC" = 0 ]; then
    exit "$RC"
  fi
  # reset the stall marker for the next try
  mv "$LOG" "$LOG.try$try"
  try=$(( try + 1 ))
done
exit 1
