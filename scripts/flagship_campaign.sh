#!/usr/bin/env bash
# The flagship training campaign, end to end — the durable recipe.
#
# Round 3's campaign state lived in /tmp and died with a VM reboot; this
# script pins the whole procedure (dataset mint -> stats check -> watchdog
# launch) so any fresh machine can reproduce it with one command.
#
#   scripts/flagship_campaign.sh [run_name] [steps]
#
# Architecture and regime are the reference's own flagship config
# (/root/reference/config.json: 256px, H_base 3, G_ch=D_ch=32, lrs 5e-5,
# batch 40) — those are this repo's config DEFAULTS, so only the run
# plumbing is passed explicitly. The one deviation from upstream is the
# documented quirk fix diff_aug_real=True (upstream's aug-on-fakes-only
# saturates D — docs/VALIDATION.md). ema_start stays at the reference's
# 10000: before ema_start the decay is 0, so G_ema tracks raw G exactly;
# an earlier start (we tried 2000) engages decay 0.9999 — a 10k-step time
# constant — at whatever state G happens to be in, and at a 12k-step
# budget the EMA then NEVER recovers (it froze a black-basin itr-2000
# snapshot at ~37% weight through the end of the run).
#
# Dataset: synv2 (structured synthetic PXD events,
# scripts/make_synthetic_dataset.py). The committed FID/KID reference
# stats (stats/synv2_*.npz) were minted from a 16k-image held-out split of
# the SAME detector (--seed 0 profiles), so they remain valid for any
# event split minted here.
set -eu
cd "$(dirname "$0")/.."
RUN=${1:-flagship_r3c}
STEPS=${2:-12000}
# Any further args are passed straight through to train.py — recipe
# levers for a leg (e.g. --unif_lambda 0.3 --sched_version CosAnnealLR
# from the round-5 physics A/B pick, docs/physics_ab.jsonl).
shift $(( $# >= 2 ? 2 : $# ))
EXTRA=("$@")

# 1) dataset (idempotent: skip if the tree is already complete)
if [ "$(ls _local/synv2/train/1.1.1 2>/dev/null | wc -l)" -lt 2000 ]; then
  python scripts/make_synthetic_dataset.py _local/synv2/train \
      --events 2000 --sensors 40 --height 250 --width 768 --seed 0
fi
if [ "$(ls _local/synv2/test/1.1.1 2>/dev/null | wc -l)" -lt 400 ]; then
  python scripts/make_synthetic_dataset.py _local/synv2/test \
      --events 400 --sensors 40 --height 250 --width 768 \
      --seed 0 --event-seed 1000
fi
[ -f stats/synv2_clean_custom_na.npz ] || {
  echo "missing stats/synv2_clean_custom_na.npz (FID reference stats)"; exit 1; }

# 2) seed the run dir from the committed archive if the host was recycled
#    (everything outside git is wiped between sessions — docs/ROADMAP.md).
#    artifacts/<run>/ holds one checkpoint tag; latest_checkpoint() resolves
#    any tag name by its state_dict itr, so a straight copy is a valid
#    resume point.
WEIGHTS="_local/runs/${RUN}/weights"
if [ ! -d "$WEIGHTS" ] && [ -d "artifacts/${RUN}" ]; then
  mkdir -p "$WEIGHTS"
  find "artifacts/${RUN}" -maxdepth 1 -type f ! -name MANIFEST.json \
      -exec cp {} "$WEIGHTS/" \;
  # A seeded copy<N> state_dict can carry a best_FID threshold far worse
  # than the archived best tag's FID (they come from different points in
  # the leg). If the driver resumes with that stale threshold it will
  # rotate a *worse* checkpoint into a best<N> slot and the archiver
  # would then evict the true best (round-4 advisor, high severity).
  # Rewrite every seeded state_dict's best_FID to the minimum across all
  # seeded tags so a best rotation only happens on genuine improvement.
  python - "$WEIGHTS" <<'EOF'
import json, pathlib, sys
w = pathlib.Path(sys.argv[1])
sds = {p: json.loads(p.read_text()) for p in w.glob("state_dict_*.json")}
fids = [sd["best_FID"] for sd in sds.values() if "best_FID" in sd]
if fids:
    floor = min(fids)
    for p, sd in sds.items():
        if sd.get("best_FID", floor) > floor:
            sd["best_FID"] = floor
            p.write_text(json.dumps(sd))
            print(f"[campaign] {p.name}: best_FID floored to {floor}")
EOF
  echo "[campaign] seeded ${WEIGHTS} from artifacts/${RUN}"
fi
RESUME=()
if [ -d "$WEIGHTS" ] && ls "$WEIGHTS"/state_dict_*.json >/dev/null 2>&1; then
  RESUME=(--resume true)
fi

# 3) launch under the chip-wedge watchdog (stale threshold must exceed the
#    FID eval subprocess' compile time on the tunneled chip, ~6-8 min).
#    num_epochs is sized generously; --stop_after is the real bound.
#    When a leg finishes, extend the budget while FID is still falling
#    (round-4 verdict: a fixed budget stopped one trajectory mid-descent)
#    and stop once the optimum is behind us.
mkdir -p _local/runs
while true; do
  scripts/campaign_watchdog.sh "_local/runs/${RUN}.log" 900 -- \
      --dataroot _local/synv2/train --outputroot _local/runs \
      --run-name "$RUN" \
      --num_epochs 24 --stop_after "$STEPS" \
      --fid_dataset_name synv2 \
      --device_transform true \
      --test_kid true --test_physics_events 1000 \
      "${RESUME[@]}" ${EXTRA[@]+"${EXTRA[@]}"}
  if [ -f "_local/runs/${RUN}.log.stop" ]; then break; fi
  NEW=$(python scripts/extend_decision.py "_local/runs/${RUN}" "$STEPS") || break
  case "$NEW" in
    stop|"") echo "[campaign] FID peak is behind the budget; stopping"; break ;;
    *) echo "[campaign] FID still falling; extending ${STEPS} -> ${NEW}"
       STEPS="$NEW"; RESUME=(--resume true) ;;
  esac
done
