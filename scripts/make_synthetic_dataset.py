#!/usr/bin/env python3
"""Mint a synthetic PXD-like event dataset (PNG tree in the reference
layout: one subdirectory per sensor, same filenames across sensors).

Two generators:

* structured (default): events carry real cross-sensor structure, so a
  discriminator cannot separate real/fake from trivial per-image tells —
  the failure mode of the v1 data (round-2 campaign: D_loss_real pinned at
  0 from the first log). Per event:
    - a shared luminosity factor scales ALL sensors' track and background
      rates (intra-event correlation — the signal the RRM attends over);
    - tracks hit one ladder in each layer at azimuthally and longitudinally
      CORRELATED positions, depositing elongated clusters whose length
      follows the dip angle;
    - per-sensor background rates (inner layer busier) with a beam-spot
      gradient along z, heavy-tailed (Landau-ish) cluster charges,
      per-sensor gain spread, and sparse single-pixel noise;
    - the detector's 7-ADU zero-suppression cut.
* --simple: the v1 generator (independent sparse blobs), kept for quick
  pipeline tests.

Usage:
  python scripts/make_synthetic_dataset.py <out_dir> --events 2000 \
      --sensors 40 --height 250 --width 768 [--seed 0] [--event-seed N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


# ----------------------------------------------------------------- v1 ----
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


# ----------------------------------------------------- structured (v2) ----
def _deposit(img, cy, cx, amp, sy, sx, theta):
    """Add one (possibly rotated/elongated) Gaussian charge cluster."""
    h, w = img.shape
    r = int(3 * max(sy, sx)) + 1
    y0, y1 = max(0, int(cy) - r), min(h, int(cy) + r + 1)
    x0, x1 = max(0, int(cx) - r), min(w, int(cx) + r + 1)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    dy, dx = yy - cy, xx - cx
    c, s = np.cos(theta), np.sin(theta)
    u = c * dy + s * dx   # along the major axis
    v = -s * dy + c * dx
    img[y0:y1, x0:x1] += amp * np.exp(-0.5 * ((u / sy) ** 2 + (v / sx) ** 2))


class Detector:
    """Fixed per-seed detector description: geometry + response profiles.

    `n` sensors split into two layers (inner half / outer half), each layer
    `n//4` ladders x 2 z-sides — matching the v1 directory naming so the
    dataset loader sees the same tree.
    """

    def __init__(self, n_sensors: int, seed: int):
        rng = np.random.default_rng(seed)
        self.n = n_sensors
        self.half = max(1, n_sensors // 2)
        self.ladders = max(1, self.half // 2)  # per layer
        # per-sensor response: inner layer ~2.5x busier, smooth spread
        layer = np.array([0 if s < self.half else 1 for s in range(n_sensors)])
        base = np.where(layer == 0, 1.0, 0.4)
        self.bg_rate = base * rng.lognormal(0.0, 0.35, n_sensors) * 28.0
        self.noise_rate = base * rng.lognormal(0.0, 0.3, n_sensors) * 9e-5
        self.gain = rng.normal(1.0, 0.08, n_sensors).clip(0.75, 1.25)
        # beam-spot gradient along z (the long axis): each sensor sees a
        # linear density slope, sign depends on its z-side
        self.z_slope = rng.uniform(0.25, 0.75, n_sensors)
        self.layer = layer

    def track_sensor(self, layer: int, phi: float, zfrac: float):
        """(layer, azimuth in [0,1), z in [0,1)) -> (sensor index, u-frac).

        Ladder from azimuth, z-side from z; u position within the sensor
        from the azimuth remainder (short axis = r-phi).
        """
        lad = min(self.ladders - 1, int(phi * self.ladders))
        zside = 0 if zfrac < 0.5 else 1
        s = layer * self.half + lad * 2 + zside
        if s >= self.n:
            return None, 0.0
        ufrac = (phi * self.ladders) % 1.0
        return s, ufrac


def make_event_v2(rng: np.random.Generator, det: Detector, h: int, w: int,
                  lum_sigma: float = 0.45, tracks_mean: float = 24.0):
    """One event: (n_sensors, h, w) uint8 with cross-sensor structure."""
    imgs = np.zeros((det.n, h, w), np.float32)
    lum = float(rng.lognormal(0.0, lum_sigma))

    # --- correlated tracks: one hit per layer, shared (phi, z, dip) ---
    n_trk = rng.poisson(lum * tracks_mean)
    for _ in range(n_trk):
        phi = rng.uniform()
        z = rng.beta(2.2, 2.2)          # beam-spot concentrated near center
        tanl = rng.standard_normal() * 0.9   # dip angle -> elongation
        q = 18.0 + rng.exponential(34.0)     # Landau-ish charge, long tail
        if rng.uniform() < 0.06:
            q += rng.exponential(160.0)      # occasional highly-ionizing hit
        for layer in (0, 1):
            # outer layer: same azimuth (small lever-arm twist), z shifted
            # by the dip — positions across layers are CORRELATED
            phi_l = (phi + layer * rng.normal(0.01, 0.004)) % 1.0
            z_l = z + layer * tanl * 0.08 + rng.normal(0.0, 0.004)
            if not (0.0 <= z_l < 1.0) or rng.uniform() < 0.07:
                continue  # out of acceptance / inefficiency
            s, ufrac = det.track_sensor(layer, phi_l, z_l)
            if s is None:
                continue
            cy = ufrac * (h - 1)
            cx = (z_l * 2.0 % 1.0) * (w - 1)
            # cluster length follows |dip|; charge shared over the length
            length = 0.8 + 2.6 * abs(tanl) + rng.exponential(0.3)
            width = rng.uniform(0.55, 1.0)
            amp = q * det.gain[s] / (1.0 + 0.45 * length)
            _deposit(imgs[s], cy, cx, amp, length, width, theta=np.pi / 2
                     + rng.normal(0.0, 0.08))  # tracks elongate along z

    # --- per-sensor beam background, rate tied to the SAME luminosity ---
    for s in range(det.n):
        n_bg = rng.poisson(lum * det.bg_rate[s] * (h * w) / 192000.0)
        for _ in range(n_bg):
            # linear density gradient along z (beam-spot side busier)
            edge = det.z_slope[s]
            cx = (w - 1) * (edge * rng.uniform() ** 1.6
                            + (1 - edge) * (1 - rng.uniform() ** 1.6)) \
                if rng.uniform() < 0.85 else rng.uniform(0, w - 1)
            cy = rng.uniform(0, h - 1)
            amp = rng.lognormal(3.1, 0.95) * det.gain[s]
            sy = rng.uniform(0.5, 2.2)
            sx = rng.uniform(0.5, 2.2)
            _deposit(imgs[s], cy, cx, amp, sy, sx, rng.uniform(0, np.pi))
        # sparse single-pixel electronics noise
        n_px = rng.poisson(det.noise_rate[s] * h * w * (0.5 + 0.5 * lum))
        ys = rng.integers(0, h, n_px)
        xs = rng.integers(0, w, n_px)
        imgs[s, ys, xs] += (rng.gamma(2.0, 5.0, n_px) + 7.5) * det.gain[s]

    imgs[imgs < 7.0] = 0.0  # zero-suppression cut
    return np.clip(imgs, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--events", type=int, default=200)
    ap.add_argument("--sensors", type=int, default=8)
    ap.add_argument("--height", type=int, default=250)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--simple", action="store_true",
                    help="v1 generator: independent sparse blobs (fast "
                         "pipeline tests; no cross-sensor structure)")
    ap.add_argument("--event-seed", type=int, default=None,
                    help="seed for the event noise stream; the detector "
                         "profiles stay pinned to --seed, so a different "
                         "--event-seed mints a test split of the SAME "
                         "detector (fresh events, identical occupancies)")
    args = ap.parse_args()

    from PIL import Image
    profile_rng = np.random.default_rng(args.seed)
    rng = (profile_rng if args.event_seed is None
           else np.random.default_rng(args.event_seed))

    def sensor_dir(s):
        layer = 1 if s < args.sensors // 2 else 2
        ladder = (s % (args.sensors // 2)) // 2 + 1
        sensor = s % 2 + 1
        return os.path.join(args.out_dir, f"{layer}.{ladder}.{sensor}")

    for s in range(args.sensors):
        os.makedirs(sensor_dir(s), exist_ok=True)

    if args.simple:
        occ = 10 ** profile_rng.uniform(-3.3, -2.6, args.sensors)
        clusters = profile_rng.uniform(10, 60, args.sensors)
        for s in range(args.sensors):
            for e in range(args.events):
                img = make_event_image(rng, args.height, args.width,
                                       occ[s], clusters[s])
                Image.fromarray(img, mode="L").save(
                    os.path.join(sensor_dir(s), f"event_{e:05d}.png"))
        print(f"{args.events} events x {args.sensors} sensors (simple) "
              f"-> {args.out_dir}")
        print(f"occupancies: {np.round(occ, 5).tolist()}")
        return

    det = Detector(args.sensors, args.seed)
    occ_sum = 0.0
    for e in range(args.events):
        ev = make_event_v2(rng, det, args.height, args.width)
        occ_sum += float((ev > 0).mean())
        for s in range(args.sensors):
            Image.fromarray(ev[s], mode="L").save(
                os.path.join(sensor_dir(s), f"event_{e:05d}.png"))
        if (e + 1) % 200 == 0:
            print(f"  {e + 1}/{args.events} events", flush=True)
    print(f"{args.events} events x {args.sensors} sensors (structured) "
          f"-> {args.out_dir}")
    print(f"mean occupancy: {occ_sum / max(1, args.events):.5f}")


if __name__ == "__main__":
    main()
