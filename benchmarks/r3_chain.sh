#!/bin/bash
# Round-3 chain runner: wait for the stage 7-8 smoke (one TPU job at a
# time), then run the measurement queue. Launch detached:
#   setsid nohup bash benchmarks/r3_chain.sh > /tmp/r3_chain.log 2>&1 &
cd /root/repo

SMOKE_PID=$(cat /tmp/smoke78.drv.pid 2>/dev/null)
if [ -n "$SMOKE_PID" ]; then
  echo "[chain] waiting for smoke driver pid $SMOKE_PID"
  while kill -0 "$SMOKE_PID" 2>/dev/null; do sleep 60; done
  echo "[chain] smoke driver exited at $(date -u)"
fi

bash benchmarks/tpu_r3_queue.sh
echo "[chain] queue done at $(date -u)"
