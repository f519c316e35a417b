#!/usr/bin/env bash
# Long-campaign babysitter for the network-attached TPU: launches train.py
# in the background and, whenever the run log goes stale (chip-server wedge:
# client blocks forever mid-RPC), kills THAT PID (never pattern-kill),
# waits out the server's client-churn window, and resumes from the latest
# checkpoint. The stale threshold must exceed the first FID eval's compile
# time (~6-8 min on the tunneled chip).
#
# Usage: scripts/campaign_watchdog.sh <logfile> <stale_seconds> -- <train.py args...>
# Stop:  touch <logfile>.stop
set -u
LOG="$1"; STALE="$2"; shift 2
[ "$1" = "--" ] && shift
REPO="$(cd "$(dirname "$0")/.." && pwd)"

attempt=0
while true; do
  if [ -f "$LOG.stop" ]; then echo "[watchdog] stop requested"; exit 0; fi
  # Honor a pause BEFORE (re)launching too: a borrower that requests the
  # chip while we are in the post-kill cooldown must not race a relaunch
  # (observed round-5: arm crashed -> cooldown -> next arm found no live
  # train pid -> watchdog relaunched into the borrower's chip session).
  while [ -f "$LOG.pause" ] && \
        [ $(( $(date +%s) - $(stat -c %Y "$LOG.pause" 2>/dev/null || echo 0) )) -lt 1800 ]; do
    sleep 15
  done
  rm -f "$LOG.pause"
  RESUME=()
  if [ "$attempt" -gt 0 ]; then RESUME=(--resume true); fi
  echo "[watchdog] launch attempt $attempt $(date +%H:%M:%S)" >> "$LOG"
  # APPEND to PYTHONPATH: on this machine the TPU plugin registers via a
  # sitecustomize on the inherited PYTHONPATH — overwriting it drops the
  # backend ("Backend 'axon' is not in the list of known backends").
  PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
    python "$REPO/train.py" "$@" "${RESUME[@]}" >> "$LOG" 2>&1 &
  PID=$!
  LAUNCH_TS=$(date +%s)
  echo "$PID" > "$LOG.pid"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    if [ -f "$LOG.stop" ]; then
      echo "[watchdog] stop requested; killing $PID"; kill "$PID"; exit 0
    fi
    # Pause protocol: bench.py / __graft_entry__ touch $LOG.pause to borrow
    # the chip (the flagship step leaves <1G HBM headroom — a concurrent
    # client would RESOURCE_EXHAUSTED). Kill train.py, wait the pause out,
    # then relaunch with --resume. A pause file older than 30 min is
    # treated as leaked (its creator died) and removed.
    if [ -f "$LOG.pause" ]; then
      page=$(( $(date +%s) - $(stat -c %Y "$LOG.pause" 2>/dev/null || date +%s) ))
      if [ "$page" -lt 1800 ]; then
        echo "[watchdog] pause requested; killing $PID $(date +%H:%M:%S)" >> "$LOG"
        kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
        while [ -f "$LOG.pause" ] && \
              [ $(( $(date +%s) - $(stat -c %Y "$LOG.pause") )) -lt 1800 ]; do
          sleep 15
        done
        rm -f "$LOG.pause"
        echo "[watchdog] pause released; resuming $(date +%H:%M:%S)" >> "$LOG"
        break
      fi
      rm -f "$LOG.pause"
    fi
    now=$(date +%s); mod=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    # Triple grace until this attempt has actually STEPPED (first
    # "itr N" line after launch). Keying the grace off log mtime was a
    # bug: the driver's init-stage liveness prints bump mtime, dropping
    # the threshold to STALE while the longest silent phase (device
    # param init + fresh remote compile, 15+ min cold-cache) is still
    # ahead — the watchdog then kills a healthy init forever.
    THRESH="$STALE"
    if ! awk '/^\[watchdog\] launch/{n=NR} /^itr [0-9]/{if (NR>n) s=1} END{exit !s}' "$LOG" 2>/dev/null; then
      THRESH=$((STALE * 3))
    fi
    if [ $((now - mod)) -gt "$THRESH" ]; then
      echo "[watchdog] log stale $((now - mod))s (thresh $THRESH); killing $PID $(date +%H:%M:%S)" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then echo "[watchdog] train.py finished rc=0"; exit 0; fi
  attempt=$((attempt + 1))
  echo "[watchdog] rc=$rc; cooling down 75s before resume" >> "$LOG"
  sleep 75   # rapid client churn after a kill hits FAILED_PRECONDITION
done
