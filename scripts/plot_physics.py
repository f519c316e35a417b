#!/usr/bin/env python3
"""Paper-style physics figures from an eval-stats pickle (reference analog:
Evaluation/plot_for_paper.ipynb): intensity spectrum, occupancy
distribution, per-sensor mean charge, per-model overlays.

Usage:
  python scripts/plot_physics.py <stats.pickle> [--out figures/]
where <stats.pickle> holds the dict produced by
ieagan_tpu.eval.physics.compare_models.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def plot_all(all_stats: dict, out_dir: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)

    # Intensity spectrum (log-log, variable ADU bins)
    fig, ax = plt.subplots(figsize=(7, 5))
    for name, st in all_stats.items():
        bins = st["intensity_bins"]
        centers = 0.5 * (bins[1:] + bins[:-1])
        widths = np.diff(bins)
        density = st["intensity_hist"] / np.maximum(
            st["intensity_hist"].sum() * widths, 1e-12)
        ax.step(centers, density, where="mid", label=name)
    ax.set_yscale("log")
    ax.set_xlabel("pixel intensity [ADU]")
    ax.set_ylabel("density")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "intensity_spectrum.png"), dpi=150)
    plt.close(fig)

    # Occupancy distribution
    fig, ax = plt.subplots(figsize=(7, 5))
    for name, st in all_stats.items():
        bins = st["occupancy_bins"]
        centers = 0.5 * (bins[1:] + bins[:-1])
        ax.step(centers, st["occupancy_hist"], where="mid", label=name)
    ax.set_xlabel("occupancy (fraction of pixels > 7 ADU)")
    ax.set_ylabel("images")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "occupancy.png"), dpi=150)
    plt.close(fig)

    # Per-sensor mean charge
    fig, ax = plt.subplots(figsize=(9, 4))
    for name, st in all_stats.items():
        ax.plot(st["per_sensor_mean_charge"], marker="o", ms=3, lw=1,
                label=name)
    ax.set_xlabel("sensor index")
    ax.set_ylabel("mean charge [ADU]")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "mean_charge.png"), dpi=150)
    plt.close(fig)
    print(f"figures -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stats_pickle", type=str)
    ap.add_argument("--out", default="figures")
    args = ap.parse_args()
    with open(args.stats_pickle, "rb") as fp:
        all_stats = pickle.load(fp)
    plot_all(all_stats, args.out)


if __name__ == "__main__":
    main()
