#!/usr/bin/env bash
# Post-campaign proof suite on the best flagship checkpoint — run on the
# real chip when it is otherwise idle (each step is its own process so the
# tunneled chip's HBM is reclaimed between steps).
#
#   scripts/proof_suite.sh <run_dir> <tag> [out_dir]
#   e.g. scripts/proof_suite.sh _local/runs/flagship_r3c best0 _local/proof_r3c
#
# Produces:
#   <out>/kid_fid.json     FID + KID at 16k generated images (host-f64 moments)
#   <out>/moments.json     device-f32 vs host-f64 FID moment equivalence at 16k
#   <out>/physics.pickle   real-vs-generated intensity/occupancy/means stats
#   <out>/figures/         physics comparison plots
set -u
RUN=${1:?run dir}; TAG=${2:?checkpoint tag}; OUT=${3:-_local/proof}
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

echo "== FID + KID @16k ($TAG) =="
python scripts/kid_eval.py --run-dir "$RUN" --tag "$TAG" --num 16000 \
    | tee "$OUT/kid_fid.json"

echo "== device-f32 vs host-f64 FID moments @16k =="
python scripts/moments_check.py --run-dir "$RUN" --tag "$TAG" --num 16000 \
    | tee "$OUT/moments.json"

echo "== physics stats (10k generated events vs all 400 real test events) =="
# generated at the reference's 10k-event scale (eval_all.py:101,138); the
# real side is capped by the synthetic test split (400 events)
python scripts/eval_all.py --out "$OUT/physics.pickle" \
    --model "IEAGAN:$RUN/weights/G_ema_${TAG}.msgpack" \
    --dataroot _local/synv2/test --n-events 10000 --n-events-real 400

python scripts/plot_physics.py "$OUT/physics.pickle" --out "$OUT/figures"
echo "proof suite artifacts in $OUT"
