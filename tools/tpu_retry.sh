#!/bin/bash
# Run a TPU measurement command with a hung-backend-init watchdog.
# The tunneled axon TPU occasionally hangs a fresh process inside
# backend init (the process sits at ~0 CPU forever — bench.py carries an
# in-process watchdog for this; standalone tools don't). This wrapper
# starts the command, samples its cumulative CPU time after GRACE
# seconds, and kills + retries (up to TRIES) while the process looks
# init-hung. Usage:
#   bash tools/tpu_retry.sh <logfile> <cmd...>
set -u
LOG=$1; shift
TRIES=${TPU_RETRY_TRIES:-3}
# GRACE must exceed the ~264 s FLAT first device->host readback of a
# fresh tunnel process (verify skill / docs): during it the process sits
# at ~0 CPU and is indistinguishable from an init hang. 150 s killed
# healthy runs as "hung" three times in a row.
GRACE=${TPU_RETRY_GRACE:-420}

for attempt in $(seq 1 "$TRIES"); do
  "$@" > "$LOG" 2>&1 &
  pid=$!
  sleep "$GRACE"
  if ! kill -0 "$pid" 2>/dev/null; then
    wait "$pid"; rc=$?
    echo "rc=$rc attempt=$attempt (exited within grace)" >> "$LOG"
    exit "$rc"
  fi
  # cumulative CPU seconds of the worker (search children: the command
  # may be `timeout python ...`)
  cpu=$(ps -o cputimes= -p "$pid" $(pgrep -P "$pid" 2>/dev/null) 2>/dev/null \
        | sort -n | tail -1)
  cpu=${cpu:-0}
  if [ "$cpu" -lt 15 ]; then
    echo "attempt $attempt: init-hung (cpu=${cpu}s after ${GRACE}s), retrying" >> "$LOG"
    kill "$pid" 2>/dev/null; sleep 3; kill -9 "$pid" 2>/dev/null
    wait "$pid" 2>/dev/null
    continue
  fi
  wait "$pid"; rc=$?
  echo "rc=$rc attempt=$attempt" >> "$LOG"
  exit "$rc"
done
echo "all $TRIES attempts init-hung" >> "$LOG"
exit 75
