#!/usr/bin/env bash
# Periodically archive a run's newest checkpoint tag into artifacts/ and
# commit it. The host is recycled between sessions — everything outside
# git (including chip-hours-expensive checkpoints) is wiped (round-4
# post-mortem, docs/ROADMAP.md) — so campaign progress must reach git on
# a cadence, not at session end.
#
# Usage: scripts/auto_archive.sh [run_dir] [period_seconds]
# Stop:  touch <run_dir>.archive.stop   (or kill the pid)
set -u
RUN_DIR=${1:-_local/runs/flagship_r4b}
PERIOD=${2:-720}
cd "$(dirname "$0")/.."
RUN_NAME=$(basename "$RUN_DIR")
last=""
while true; do
  sleep "$PERIOD"
  if [ -f "${RUN_DIR}.archive.stop" ]; then exit 0; fi
  tag=$(python - "$RUN_DIR" <<'EOF'
import json, pathlib, sys
weights = pathlib.Path(sys.argv[1]) / "weights"
best = None
for p in weights.glob("state_dict_*.json"):
    try:
        itr = json.loads(p.read_text()).get("itr", -1)
    except (ValueError, OSError):
        continue
    tag = p.stem[len("state_dict_"):]
    if best is None or itr > best[0]:
        best = (itr, tag)
print(best[1] if best else "")
EOF
  ) || continue
  [ -z "$tag" ] && continue
  [ "$tag" = "$last" ] && continue
  # The driver writes tags non-atomically across the six files; re-resolve
  # after a beat and only archive a tag that is stable.
  sleep 20
  python scripts/archive_checkpoint.py "$RUN_DIR" "$tag" || continue
  # Keep ONE tag in the worktree (each is ~235MB with optimizer state):
  # drop the previously archived tag's files so every commit swaps the
  # resume point rather than accumulating gigabytes.
  find "artifacts/${RUN_NAME}" -type f \
      ! -name "*_${tag}.*" ! -name MANIFEST.json -delete
  git add -A "artifacts/${RUN_NAME}" || continue
  if git commit -q -m "Archive ${RUN_NAME} ${tag} checkpoint"; then
    last="$tag"
    echo "[auto_archive] committed ${RUN_NAME} ${tag} $(date +%H:%M:%S)"
  fi
done
