#!/usr/bin/env bash
# Stall watchdog for multi-hour TPU trainings (CLAUDE.md: the axon RPC
# tunnel can hang silently mid-step — zero CPU, futex wait, log silent).
#
# Usage: bash scripts/watchdog_train.sh LOGFILE STALL_SECS -- CMD [ARGS...]
#
# Launches CMD with stdout/stderr appended to LOGFILE.  If LOGFILE's
# mtime goes stale for more than STALL_SECS while the process is alive,
# kill -9 it (by exact PID — never by pattern) and relaunch CMD with
# --resume appended.  Exits with the trainer's exit code once it
# finishes on its own.
set -u
LOG="$1"; STALL="$2"; shift 3   # consume LOGFILE STALL_SECS --
CMD=("$@")
# Python stdout is BLOCK-buffered into a file: without this the log
# mtime stays stale through a healthy training loop and the stall
# check below kills the trainer spuriously.
export PYTHONUNBUFFERED=1
RESUMED=0
while :; do
  if [ "$RESUMED" -eq 0 ]; then
    "${CMD[@]}" >>"$LOG" 2>&1 &
  else
    "${CMD[@]}" --resume >>"$LOG" 2>&1 &
  fi
  PID=$!
  echo "[watchdog] launched pid=$PID resumed=$RESUMED" >>"$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    if [ -f "$LOG" ]; then
      AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$AGE" -gt "$STALL" ]; then
        echo "[watchdog] log silent ${AGE}s > ${STALL}s; kill -9 $PID" >>"$LOG"
        kill -9 "$PID" 2>/dev/null
        sleep 5
        break
      fi
    fi
  done
  if kill -0 "$PID" 2>/dev/null; then
    continue  # still alive somehow; keep watching
  fi
  wait "$PID"; RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "[watchdog] trainer exited cleanly" >>"$LOG"
    exit 0
  fi
  # 137 = SIGKILL (our stall kill) → relaunch with --resume; other
  # nonzero codes get one resume attempt too (crash mid-run).
  echo "[watchdog] trainer rc=$RC; relaunching with --resume" >>"$LOG"
  RESUMED=1
  sleep 10
done
