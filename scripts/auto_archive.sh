#!/usr/bin/env bash
# Periodically archive a run's checkpoints into artifacts/ and commit.
# The host is recycled between sessions — everything outside git
# (including chip-hours-expensive checkpoints) is wiped (round-4
# post-mortem, docs/ROADMAP.md) — so campaign progress must reach git on
# a cadence, not at session end.
#
# All archive/prune logic lives in scripts/archive_checkpoint.py --auto
# (one cycle: archive best<N> as G_ema+state_dict ~47MB whenever it
# improves, full copy<N> resume set every --copy-every itrs, prune stale
# files only AFTER a successful archive). This loop just runs cycles and
# commits when a cycle reports "changed".
#
# Usage: scripts/auto_archive.sh [run_dir] [period_seconds] [copy_every]
# Stop:  touch <run_dir>.archive.stop   (or kill the pid)
set -u
RUN_DIR=${1:-_local/runs/flagship_r4b}
PERIOD=${2:-720}
COPY_EVERY=${3:-2000}
cd "$(dirname "$0")/.."
RUN_NAME=$(basename "$RUN_DIR")

while true; do
  sleep "$PERIOD"
  if [ -f "${RUN_DIR}.archive.stop" ]; then exit 0; fi
  out=$(python scripts/archive_checkpoint.py "$RUN_DIR" --auto \
        --copy-every "$COPY_EVERY" 2>&1) || { echo "$out"; continue; }
  case "$out" in *changed*) ;; *) continue ;; esac
  echo "$out"
  git add -A "artifacts/${RUN_NAME}" || continue
  if git commit -q -m "Archive ${RUN_NAME} checkpoints"; then
    echo "[auto_archive] committed ${RUN_NAME} $(date +%H:%M:%S)"
  fi
done
