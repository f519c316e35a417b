#!/usr/bin/env bash
# Periodically archive a run's newest checkpoint tag AND its newest
# best-FID tag into artifacts/ and commit them. The host is recycled
# between sessions — everything outside git (including chip-hours-
# expensive checkpoints) is wiped (round-4 post-mortem, docs/ROADMAP.md)
# — so campaign progress must reach git on a cadence, not at session end.
#
# Two tags, not one: once a campaign passes its FID peak (flagship_r4
# peaked at itr 14000 then diverged to 20000) the newest copy<N> tag is
# no longer the checkpoint worth keeping — the driver's best<N> rotation
# is. We keep BOTH: copy<N> to resume training, best<N> as the deliverable.
#
# Usage: scripts/auto_archive.sh [run_dir] [period_seconds]
# Stop:  touch <run_dir>.archive.stop   (or kill the pid)
set -u
RUN_DIR=${1:-_local/runs/flagship_r4b}
PERIOD=${2:-720}
cd "$(dirname "$0")/.."
RUN_NAME=$(basename "$RUN_DIR")
last=""

resolve_tags() {
  python - "$RUN_DIR" <<'EOF'
import pathlib, sys
sys.path.insert(0, "scripts")
from archive_checkpoint import _tags_by_itr, best_tag
weights = pathlib.Path(sys.argv[1]) / "weights"
tags = _tags_by_itr(weights)
newest = max(tags)[1] if tags else ""
best = best_tag(weights) or ""
print(newest, best)
EOF
}

while true; do
  sleep "$PERIOD"
  if [ -f "${RUN_DIR}.archive.stop" ]; then exit 0; fi
  read -r newest best < <(resolve_tags) || continue
  [ -z "$newest" ] && continue
  key="${newest}|${best}"
  [ "$key" = "$last" ] && continue
  # The driver writes tags non-atomically across the six files; re-resolve
  # after a beat and only archive a combination that is stable.
  sleep 20
  read -r n2 b2 < <(resolve_tags) || continue
  [ "${n2}|${b2}" = "$key" ] || continue
  # Keep only the two live tags in the worktree (each is ~235MB with
  # optimizer state): drop other tags' files so every commit swaps the
  # resume/best points rather than accumulating gigabytes.
  if [ -d "artifacts/${RUN_NAME}" ]; then
    find "artifacts/${RUN_NAME}" -type f ! -name "*_${newest}.*" \
        ${best:+! -name "*_${best}.*"} ! -name MANIFEST.json -delete
  fi
  ok=1
  python scripts/archive_checkpoint.py "$RUN_DIR" "$newest" || ok=0
  if [ -n "$best" ] && [ "$best" != "$newest" ]; then
    python scripts/archive_checkpoint.py "$RUN_DIR" "$best" || ok=0
  fi
  [ "$ok" = 1 ] || continue
  git add -A "artifacts/${RUN_NAME}" || continue
  if git commit -q -m "Archive ${RUN_NAME} ${newest}${best:+ + ${best}} checkpoints"; then
    last="$key"
    echo "[auto_archive] committed ${RUN_NAME} ${key} $(date +%H:%M:%S)"
  fi
done
