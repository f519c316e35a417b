#!/usr/bin/env python3
"""Mint a synthetic PXD-like event dataset (PNG tree in the reference
layout: one subdirectory per sensor, same filenames across sensors).

Images mimic the detector's statistics loosely: per-sensor background
occupancy, Poisson-distributed charge clusters with 2D-Gaussian profiles,
log-ish amplitude spectrum. Used for end-to-end pipeline validation and
demo training runs when the real Belle II data is unavailable.

Usage:
  python scripts/make_synthetic_dataset.py <out_dir> --events 200 \
      --sensors 8 --height 250 --width 192 [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_event_image(rng: np.random.Generator, h: int, w: int,
                     occupancy: float, n_clusters_mean: float) -> np.ndarray:
    img = np.zeros((h, w), np.float32)
    # background: sparse single-pixel noise above ~8 ADU
    n_bg = rng.poisson(occupancy * h * w)
    ys = rng.integers(0, h, n_bg)
    xs = rng.integers(0, w, n_bg)
    img[ys, xs] = rng.gamma(2.0, 6.0, n_bg) + 8.0
    # clusters: 2D gaussian blobs with charge sharing
    for _ in range(rng.poisson(n_clusters_mean)):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        sy, sx = rng.uniform(0.6, 1.8), rng.uniform(0.6, 1.8)
        amp = rng.lognormal(3.5, 0.8)
        y0, y1 = max(0, int(cy - 4)), min(h, int(cy + 5))
        x0, x1 = max(0, int(cx - 4)), min(w, int(cx + 5))
        if y0 >= y1 or x0 >= x1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        blob = amp * np.exp(-0.5 * (((yy - cy) / sy) ** 2
                                    + ((xx - cx) / sx) ** 2))
        img[y0:y1, x0:x1] += blob
    img[img < 7.0] = 0.0  # the 7-ADU noise cut
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--events", type=int, default=200)
    ap.add_argument("--sensors", type=int, default=8)
    ap.add_argument("--height", type=int, default=250)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--event-seed", type=int, default=None,
                    help="seed for the event noise stream; the sensor "
                         "profiles stay pinned to --seed, so a different "
                         "--event-seed mints a test split of the SAME "
                         "detector (fresh events, identical occupancies)")
    args = ap.parse_args()

    from PIL import Image
    profile_rng = np.random.default_rng(args.seed)
    # per-sensor occupancy / cluster-rate profiles (inner sensors busier)
    occ = 10 ** profile_rng.uniform(-3.3, -2.6, args.sensors)
    clusters = profile_rng.uniform(10, 60, args.sensors)
    rng = (profile_rng if args.event_seed is None
           else np.random.default_rng(args.event_seed))
    for s in range(args.sensors):
        layer = 1 if s < args.sensors // 2 else 2
        ladder = (s % (args.sensors // 2)) // 2 + 1
        sensor = s % 2 + 1
        sub = os.path.join(args.out_dir, f"{layer}.{ladder}.{sensor}")
        os.makedirs(sub, exist_ok=True)
        for e in range(args.events):
            img = make_event_image(rng, args.height, args.width,
                                   occ[s], clusters[s])
            Image.fromarray(img, mode="L").save(
                os.path.join(sub, f"event_{e:05d}.png"))
    print(f"{args.events} events x {args.sensors} sensors -> {args.out_dir}")
    print(f"occupancies: {np.round(occ, 5).tolist()}")


if __name__ == "__main__":
    main()
