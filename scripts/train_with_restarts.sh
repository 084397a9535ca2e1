#!/bin/sh
# Restart loop for the training CLIs' stall watchdog (failure recovery,
# SURVEY.md §5: the reference has no preemption/hang handling at all).
#
# The CLIs exit 42 when the device link wedges mid-step (StallWatchdog,
# surfd_tpu/training/common.py) — state cannot be saved through a dead link,
# so recovery is: new process, resume from the last checkpoint. Any other
# exit code passes through.
#
# Usage:
#   scripts/train_with_restarts.sh python -m surfd_tpu.cli.train_ae ...
#   scripts/train_with_restarts.sh python -m surfd_tpu.cli.train_diffusion \
#       --resume ...      # train_diffusion resumes only with --resume;
#                         # the flag is safe on a fresh run too
#
# SURFD_MAX_RESTARTS bounds the loop (default 50).
set -u
max=${SURFD_MAX_RESTARTS:-50}
n=0
while true; do
    "$@"
    rc=$?
    if [ "$rc" -ne 42 ]; then
        exit "$rc"
    fi
    n=$((n + 1))
    if [ "$n" -gt "$max" ]; then
        echo "train_with_restarts: giving up after $max stall restarts" >&2
        exit 42
    fi
    echo "train_with_restarts: stall exit — restart #$n (resuming from last checkpoint)" >&2
    sleep 5
done
