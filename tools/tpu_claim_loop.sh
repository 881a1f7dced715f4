#!/bin/bash
# Keep retrying the TPU chip claim until the axon relay recovers, then hold
# it via tools/tpu_worker.py. Round-3/4 relay outages make the first claim
# the long pole; this loop means the chip is held the moment the relay is
# back. Stop with: touch /tmp/tpu_claim_stop
FIFO=${1:-/tmp/tpu_cmd}
LOG=${2:-/tmp/tpu_log}
rm -f /tmp/tpu_claim_stop
while true; do
    if [ -e /tmp/tpu_claim_stop ]; then
        echo "[claim-loop] stop requested" >> "$LOG"
        exit 0
    fi
    echo "[claim-loop] $(date +%H:%M:%S) attempting claim" >> "$LOG"
    python "$(dirname "$0")/tpu_worker.py" "$FIFO" "$LOG"
    rc=$?
    echo "[claim-loop] $(date +%H:%M:%S) worker exited rc=$rc" >> "$LOG"
    # rc=0 means an EXIT sentinel was sent deliberately -> stop looping
    if [ $rc -eq 0 ]; then exit 0; fi
    sleep 300
done
