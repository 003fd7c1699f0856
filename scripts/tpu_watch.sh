#!/bin/bash
# Probe the axon tunnel every 120s; when it answers, run the measurement
# queue once (default scripts/r4_measure.sh; override with $1).
# Logs to /tmp/tpu_watch.log; per-step logs /tmp/r4_<name>.log.
# NOTE (CLAUDE.md): the probe child defers SIGTERM during jax backend
# init — after pausing this watcher, wait for the probe to actually exit
# before running collective tests.
QUEUE=${1:-$(dirname "$0")/r4_measure.sh}
while true; do
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null &
  echo $! > /tmp/tpu_probe.pid
  if wait $!; then
    echo "$(date) tunnel UP — running queue" >> /tmp/tpu_watch.log
    bash "$QUEUE" >> /tmp/tpu_watch.log 2>&1
    echo "$(date) queue finished" >> /tmp/tpu_watch.log
    break
  fi
  echo "$(date) tunnel still down" >> /tmp/tpu_watch.log
  sleep 120
done
